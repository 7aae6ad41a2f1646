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

  test("LATEST never regresses; stale tmp residue is swept after the grace period") {
    // ADVICE r6 scenario: exporter A pauses between its snapshot rename
    // and its pointer write; meanwhile B publishes a newer version. When A
    // resumes, its pointer write must SKIP (B's snapshot is newer). We
    // simulate the resume by pre-creating a newer v-dir before a run.
    val out = Files.createTempDirectory("graft-export4").toString
    ExportJob.run(spark, sf, out, nShards = 2) // v1, LATEST=v1
    // old abandoned tmp (top-level) + foreign residue inside v1 — both
    // older than the 1 h grace via a back-dated epoch suffix
    val oldEpoch = System.currentTimeMillis() - 2L * 60 * 60 * 1000
    val staleTop = new java.io.File(s"$out/_tmp-$oldEpoch")
    staleTop.mkdirs(); staleTop.setLastModified(oldEpoch)
    val staleNested = new java.io.File(s"$out/v1/_tmp-${oldEpoch + 1}")
    staleNested.mkdirs(); staleNested.setLastModified(oldEpoch)
    // a FRESH tmp (live exporter) must survive the sweep
    val freshTop = new java.io.File(s"$out/_tmp-${System.currentTimeMillis()}"); freshTop.mkdirs()
    // ADVICE r7: a tmp whose NAME epoch is past the grace but that is
    // still being written (fresh mtimes inside) is a LIVE slow exporter —
    // activity, not start time, keeps it alive
    val slowLive = new java.io.File(s"$out/_tmp-${oldEpoch + 2}")
    slowLive.mkdirs(); slowLive.setLastModified(oldEpoch)
    val slowLiveFile = new java.io.File(slowLive, "part-0")
    slowLiveFile.createNewFile() // mtime = now

    val r2 = ExportJob.run(spark, sf, out, nShards = 2) // v2, LATEST=v2
    assert(!staleTop.exists() && !staleNested.exists(), "stale residue must be swept")
    assert(freshTop.exists(), "a live exporter's tmp must survive the sweep")
    assert(slowLive.exists() && slowLiveFile.exists(),
      "a >grace-old but still-active exporter's tmp must survive the sweep")
    slowLiveFile.delete(); slowLive.delete()

    // the skip branch directly: a paused exporter resuming with v2 while
    // v9 exists must NOT move the pointer back
    new java.io.File(s"$out/v9").mkdirs()
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!ExportJob.writeLatestIfNewest(fs, out, r2.version),
      "an older exporter must skip the pointer write")
    val latestAfterSkip = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/LATEST")), "UTF-8")
    assert(latestAfterSkip === "v2", "LATEST must not regress")

    // ...and the newest exporter still advances it
    val r3 = ExportJob.run(spark, sf, out, nShards = 2)
    assert(r3.version === "v10")
    val latest = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/LATEST")), "UTF-8")
    assert(latest === "v10")
  }
}
