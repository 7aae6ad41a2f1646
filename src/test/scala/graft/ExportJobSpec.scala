package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.ExportJob

/** The export must agree with the DECLARED q85 pipeline on totals, place
  * every kept doc in exactly one deterministic shard, publish atomically
  * (versioned snapshot + LATEST pointer + manifest), and reproduce the
  * identical manifest on a re-run.
  */
class ExportJobSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.01"

  test("export totals equal the q85 rollup; shards partition the kept set") {
    val out = Files.createTempDirectory("graft-export").toString
    val res = ExportJob.run(spark, sf, out, nShards = 8)

    // totals vs the declared, oracle-checked q85 rollup
    val q85 = SparkEntry.queries("q85_curation_pipeline")(spark, sf)
      .agg(sum("n_docs"), sum("n_tokens")).head()
    assert(res.nDocs === q85.getLong(0))
    assert(res.nTokens === q85.getLong(1))

    // every kept doc in exactly one shard; read-back set == curated set
    val back = spark.read.parquet(s"${res.path}/data")
    assert(back.count() === res.nDocs)
    assert(back.select("doc_id").distinct().count() === res.nDocs)
    val curatedIds = ExportJob.curated(spark, sf).select("doc_id")
    assert(back.select("doc_id").except(curatedIds).count() === 0)
    assert(curatedIds.except(back.select("doc_id")).count() === 0)

    // shard assignment is the declared hash, not accidental placement
    val misplaced = back.where(
      pmod(graft.functions.TextFunctions.hash32(
        concat(lit("export|"), col("doc_id").cast("string"))), lit(8)).cast("int")
        =!= col("shard")).count()
    assert(misplaced === 0)

    // manifest + _SUCCESS + LATEST pointer exist and agree
    val manifest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"${res.path}/manifest.json")), "UTF-8")
    assert(manifest.contains(s""""n_docs": ${res.nDocs}"""))
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/LATEST")), "UTF-8")
    assert(latest === res.version)
    assert(new java.io.File(s"${res.path}/_SUCCESS").exists())
    assert(res.shards.map(_.nDocs).sum === res.nDocs)
    assert(res.shards.size === 8)
  }

  test("re-run is deterministic and versions advance; old snapshot untouched") {
    val out = Files.createTempDirectory("graft-export2").toString
    val r1 = ExportJob.run(spark, sf, out, nShards = 4)
    val r2 = ExportJob.run(spark, sf, out, nShards = 4)
    assert(r1.version === "v1" && r2.version === "v2")
    assert(r1.shards === r2.shards, "identical input must produce an identical manifest")
    // v1 still fully readable after v2 published
    assert(spark.read.parquet(s"${r1.path}/data").count() === r1.nDocs)
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/LATEST")), "UTF-8")
    assert(latest === "v2")
  }

  test("publish skips a version directory created by a concurrent exporter") {
    // ADVICE r5: a racing exporter can allocate the same vN. Simulate the
    // simplest collision — the destination already exists when allocation
    // picks it (an empty v-dir, as a racer mid-rename would leave) — and
    // require the publish to land intact in the NEXT version, with the
    // squatter directory untouched (no nested tmp inside it).
    val out = Files.createTempDirectory("graft-export3").toString
    ExportJob.run(spark, sf, out, nShards = 2) // v1
    val squatter = new java.io.File(s"$out/v2"); squatter.mkdirs()
    val r = ExportJob.run(spark, sf, out, nShards = 2)
    assert(r.version === "v3", s"collided version must be skipped, got ${r.version}")
    assert(new java.io.File(s"${r.path}/_SUCCESS").exists())
    assert(spark.read.parquet(s"${r.path}/data").count() === r.nDocs)
    assert(Option(squatter.listFiles()).getOrElse(Array.empty).isEmpty,
      "the squatter's directory must not receive a nested snapshot")
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/LATEST")), "UTF-8")
    assert(latest === "v3")
  }
}
