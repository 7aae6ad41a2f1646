package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.jobs.StoreOptimize
import graft.sources.WriterFiles

/** `OPTIMIZE TABLE` on the sharded store: per-shard K-way merge of sorted
  * parts into one part, MVCC-lite publish (manifest flip atomic under
  * concurrent readers AND writers), `FINAL` replacing-merge semantics,
  * and GC that never touches a concurrent commit's parts (ADVICE r8).
  */
class StoreOptimizeSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def df(rows: Seq[Row], parts: Int = 4): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, parts), schema)

  private def input(nShards: Int, rowsPerShard: Int): DataFrame = {
    val rows = for {
      s <- 0 until nShards
      i <- 0 until rowsPerShard
    } yield Row(s, (s + (i % 7) * nShards).toLong, 1000000L * ((i * 37) % rowsPerShard),
      s"sig_${i % 3}", i * 0.5)
    df(scala.util.Random.shuffle(rows.toVector))
  }

  private def tmpDir(): String =
    Files.createTempDirectory("graft-optimize").toFile.getAbsolutePath

  private def readBack(dir: String): DataFrame =
    spark.read.format("graft-sharded").load(dir)

  private def shardDir(dir: String, k: Int) = new java.io.File(dir, s"shard=$k")

  private def partsOf(d: java.io.File): Seq[String] =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).toSeq.sorted

  test("plain optimize stops at ≤ mergeGroupSize rolled parts instead of re-merging them") {
    val dir = tmpDir()
    // 8 tiny single-shard appends → 8 ingest parts; mergeGroupSize=4 levels
    // them as [4,4] → 2 rolled parts, which is already ≤ the group size
    (0 until 8).foreach { e =>
      df((0L until 20L).map(t => Row(0, t, 1000L * e, "sig", e * 1.0)), parts = 1)
        .write.format("graft-sharded").mode("append").save(dir)
    }
    val before = readBack(dir).collect().map(_.toSeq).toSet
    val res = StoreOptimize.optimize(spark, dir, codec = "none", mergeGroupSize = 4)
    assert(res.size === 1 && res.head.partsBefore === 8 && res.head.rows === 160L)
    val d = shardDir(dir, 0)
    val outs = partsOf(d)
    assert(outs.size === 2, s"leveling leaves the two group outputs, got $outs")
    assert(res.head.mergedParts.toSet === outs.toSet)
    // the skip is observable in lineage: each output's DIRECT inputs are
    // the original ingest parts (a final re-merge would have produced one
    // part whose direct inputs are the level-1 outputs)
    outs.foreach { n =>
      val lf = new java.io.File(d, s".$n.lineage")
      assert(lf.isFile)
      val lines = scala.io.Source.fromFile(lf, "UTF-8").getLines().toVector
      val directs = lines.drop(lines.indexOf("=direct") + 1)
      assert(directs.size === 4 && directs.forall(!_.startsWith("part-opt-")),
        s"skip must keep the leveled outputs un-rewritten; $n directs: $directs")
    }
    assert(readBack(dir).collect().map(_.toSeq).toSet === before)

    // FINAL still rewrites through to the collapse, skip or no skip
    val res2 = StoreOptimize.optimize(spark, dir, codec = "none",
      mergeGroupSize = 4, finalDedup = true)
    assert(res2.nonEmpty && partsOf(d).size === 1)
    assert(readBack(dir).count() === 20, "FINAL collapses to latest per (token, name)")
  }

  test("merges each shard's parts into one, content-identical, manifest + sidecar published") {
    val dir = tmpDir()
    val in = input(3, 40)
    // tiny maxPartBytes forces several parts per shard
    in.write.format("graft-sharded").option("maxPartBytes", "200")
      .mode("append").save(dir)
    val before = readBack(dir)
    assert(partsOf(shardDir(dir, 0)).size > 1, "fixture needs multiple parts")
    val snapshot = before.collect().toSeq

    val res = StoreOptimize.optimize(spark, dir, codec = "zstd")
    assert(res.size === 3)
    res.foreach { r =>
      assert(r.partsBefore > 1 && r.rows === 40L)
      val d = shardDir(dir, r.shard)
      assert(partsOf(d) === Seq(r.mergedPart))
      assert(WriterFiles.readManifest(d) === Some(Seq(r.mergedPart)))
      assert(new java.io.File(d, s".${r.mergedPart}.minmax").isFile, "merged sidecar")
    }
    val after = readBack(dir)
    assert(after.count() === 120)
    assert(after.exceptAll(before).count() === 0 && before.exceptAll(after).count() === 0)
    // still sorted-readable: the merge preserved MergeTree key order
    assert(spark.read.format("graft-sharded").option("sorted", "true").load(dir)
      .count() === 120)
    val _ = snapshot
  }

  test("FINAL collapses to the dedup=latest snapshot; a plain read afterwards IS the snapshot") {
    val dir = tmpDir()
    // two histories per (token, name): only the newest ts row must survive
    val rows = for {
      t <- 0L until 6L
      gen <- 0 until 3
    } yield Row((t % 2).toInt, t, 1000L * gen, "temp", gen * 1.0)
    df(rows).write.format("graft-sharded").option("maxPartBytes", "40")
      .mode("append").save(dir)
    val latest = spark.read.format("graft-sharded")
      .option("sorted", "true").option("dedup", "latest").load(dir)
    val want = latest.collect().map(_.toSeq).toSet
    assert(want.size === 6)

    StoreOptimize.optimize(spark, dir, finalDedup = true)
    val plain = readBack(dir)
    assert(plain.collect().map(_.toSeq).toSet === want)
    assert(plain.where("v <> 2.0").count() === 0, "only newest generation survives")
  }

  test("a part registered by a concurrent commit survives the flip and the GC (ADVICE r8)") {
    val dir = tmpDir()
    df((0L until 20L).map(t => Row(0, t, t * 10, "a", 1.0)))
      .write.format("graft-sharded").option("maxPartBytes", "60").mode("append").save(dir)
    val d = shardDir(dir, 0)
    val inputs = partsOf(d)
    assert(inputs.size > 1)
    // adopt manifest semantics (what runTask step 1 does)
    WriterFiles.writeManifest(d, inputs)

    // simulate the interleave: while the merge runs, a commit publishes and
    // REGISTERS part C; then the optimize's publish (steps 3-4) fires
    val cName = "part-0-99-0.csv"
    val w = new java.io.PrintWriter(new java.io.File(d, cName))
    w.println("777,123,b,9.0"); w.close()
    WriterFiles.registerInManifests(new java.io.File(dir), Seq(s"shard=0/$cName"))

    val mergedName = "part-opt-test00000.csv"
    val m = new java.io.PrintWriter(new java.io.File(d, mergedName))
    (0L until 20L).foreach(t => m.println(s"$t,${t * 10},a,1.0")); m.close()

    StoreOptimize.publishMerged(d, inputs, Seq(mergedName))

    // flip kept C, dropped exactly the inputs, merged part PREPENDED
    // (ingest order: merged content predates the concurrent part)
    assert(WriterFiles.readManifest(d) === Some(Seq(mergedName, cName)))
    assert(new java.io.File(d, cName).isFile, "concurrent commit's part must survive GC")
    inputs.foreach(p => assert(!new java.io.File(d, p).exists(), s"retired $p must be GC'd"))
    val got = readBack(dir)
    assert(got.count() === 21)
    assert(got.where("token_id = 777").count() === 1)
  }

  test("GC removes only optimize-owned residue; foreign unlisted parts are in-flight commits") {
    val dir = tmpDir()
    df((0L until 10L).map(t => Row(1, t, t, "a", 1.0)))
      .write.format("graft-sharded").mode("append").save(dir)
    val d = shardDir(dir, 1)
    val keep = partsOf(d)
    WriterFiles.writeManifest(d, keep)

    // crashed-optimize residue: canonical part-opt never flipped in, its
    // sidecar, a staged tmp — plus a FOREIGN part mid-commit (published,
    // not yet registered)
    def touch(n: String, line: String = "1,1,x,1.0"): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(d, n)); w.println(line); w.close()
    }
    touch("part-opt-deadbeef0000.csv")
    touch(".part-opt-deadbeef0000.csv.minmax", "1,1,1,1,1,1.0,1.0")
    touch(".part-opt-aaaa.csv.tmp")
    touch("part-3-55-0.csv") // foreign: a batch commit between publish and register
    // a FRESH manifest staging tmp: a concurrent commit's registerInManifests
    // between its staging write and its rename (ADVICE r9 — the old
    // unconditional tmp sweep deleted it and broke the commit's moveReplace)
    touch("._parts.tmp-concurrent-commit")

    val res = StoreOptimize.optimize(spark, dir)
    // single listed part + residue → gc-only pass (rows = -1 sentinel filtered out)
    assert(res.isEmpty)
    assert(!new java.io.File(d, "part-opt-deadbeef0000.csv").exists())
    assert(!new java.io.File(d, ".part-opt-deadbeef0000.csv.minmax").exists())
    assert(!new java.io.File(d, ".part-opt-aaaa.csv.tmp").exists())
    assert(new java.io.File(d, "part-3-55-0.csv").isFile,
      "foreign unlisted part must survive — it may be a commit in flight")
    assert(new java.io.File(d, "._parts.tmp-concurrent-commit").isFile,
      "a fresh manifest staging tmp must survive — a concurrent register owns it")
    assert(WriterFiles.readManifest(d) === Some(keep))
    assert(readBack(dir).count() === 10) // manifest view unchanged
  }

  test("optimize is idempotent and a second run on a clean store is a no-op") {
    val dir = tmpDir()
    input(2, 30).write.format("graft-sharded").option("maxPartBytes", "150")
      .mode("append").save(dir)
    val r1 = StoreOptimize.optimize(spark, dir)
    assert(r1.size === 2)
    val r2 = StoreOptimize.optimize(spark, dir)
    assert(r2.isEmpty, s"clean store must be a no-op, got $r2")
    assert(readBack(dir).count() === 60)
  }

  test("an idle fully-compacted store still reclaims expired trash (gcOnly trigger + emptyTrash)") {
    val dir = tmpDir()
    input(2, 30).write.format("graft-sharded").option("maxPartBytes", "150")
      .mode("append").save(dir)
    StoreOptimize.optimize(spark, dir) // compacts; retires inputs into the trash
    val trashed = (0 until 2).flatMap { k =>
      Option(shardDir(dir, k).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(".trash-")).toSeq
    }
    assert(trashed.nonEmpty, "optimize must have retired the merged-away inputs")
    // inside the grace period a re-optimize stays a no-op (r11 behavior)
    assert(StoreOptimize.optimize(spark, dir).isEmpty)
    assert(trashed.forall(_.isFile), "nothing swept inside the grace period")
    // age the entries past the grace period by renaming to an old stamp
    trashed.foreach { f =>
      val aged = f.getName.replaceFirst("""\.trash-\d+-""", ".trash-1000-")
      assert(f.renameTo(new java.io.File(f.getParentFile, aged)))
    }
    // the r11 leak: one part per shard, no residue ⇒ optimize never swept.
    // Now expired trash alone triggers a gcOnly pass.
    val res = StoreOptimize.optimize(spark, dir)
    assert(res.isEmpty, "gcOnly results carry rows = -1 and are filtered out")
    (0 until 2).foreach { k =>
      val left = Option(shardDir(dir, k).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(".trash-"))
      assert(left.isEmpty, s"expired trash must drain on an idle store, left: ${left.toSeq}")
    }
    assert(readBack(dir).count() === 60)

    // and the standalone drain needs no Spark job at all
    val dir2 = tmpDir()
    input(1, 10).write.format("graft-sharded").mode("append").save(dir2)
    StoreOptimize.optimize(spark, dir2, force = true)
    val t2 = Option(shardDir(dir2, 0).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".trash-")).toSeq
    assert(t2.nonEmpty)
    assert(StoreOptimize.emptyTrash(dir2) === 0, "grace period still running: keep")
    assert(StoreOptimize.emptyTrash(dir2,
      now = System.currentTimeMillis() + 481000L) === t2.size)
    assert(readBack(dir2).count() === 10)
  }

  test("post-optimize appends register in the manifest and stay visible") {
    val dir = tmpDir()
    input(2, 20).write.format("graft-sharded").option("maxPartBytes", "100")
      .mode("append").save(dir)
    StoreOptimize.optimize(spark, dir)
    input(2, 5).write.format("graft-sharded").mode("append").save(dir)
    assert(readBack(dir).count() === 50)
    // and a re-optimize merges the appended parts back to one
    val res = StoreOptimize.optimize(spark, dir)
    assert(res.size === 2)
    assert(readBack(dir).count() === 50)
    (0 until 2).foreach(k => assert(partsOf(shardDir(dir, k)).size === 1))
  }
}
