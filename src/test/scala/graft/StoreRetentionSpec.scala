package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.jobs.{StoreOptimize, StoreRetention}
import graft.sources.{PartStats, WriterFiles}

/** `TTL … DELETE` on the sharded store: part-granular expiry — whole-drop
  * with the sidecar proof (tsMax < cutoff AND zero null-ts rows),
  * whole-keep untouched (bytes, name, manifest position), rewrite only
  * for straddlers; null-ts rows never expire; MVCC publish discipline.
  */
class StoreRetentionSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def df(rows: Seq[Row]): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private def tmpDir(): String =
    Files.createTempDirectory("graft-retention").toFile.getAbsolutePath

  private def readBack(dir: String): DataFrame =
    spark.read.format("graft-sharded").load(dir)

  private def partsOf(dir: String, k: Int): Seq[String] =
    Option(new java.io.File(dir, s"shard=$k").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).toSeq.sorted

  /** Three appends per shard: wholly-old, straddling (incl. a null-ts
    * row), wholly-new — three parts with known dispositions.
    */
  private def writeStore(dir: String): Unit = {
    df((0L until 20L).map(t => Row((t % 2).toInt, t, 1000L + t, "old", 1.0)))
      .write.format("graft-sharded").mode("append").save(dir)
    df((0L until 20L).map(t => Row((t % 2).toInt, t, 5000L - 100L + 10L * t, "mid", 2.0)) ++
      Seq(Row(0, 99L, null, "nullts", 3.0)))
      .write.format("graft-sharded").mode("append").save(dir)
    df((0L until 20L).map(t => Row((t % 2).toInt, t, 9000L + t, "new", 4.0)))
      .write.format("graft-sharded").mode("append").save(dir)
  }

  test("expiry equals the batch filter; whole-drop/keep/rewrite dispositions are exact") {
    val dir = tmpDir()
    writeStore(dir)
    val cutoff = 5000L
    val expect = readBack(dir).where(col("ts_us").isNull || col("ts_us") >= cutoff)
      .collect().map(_.toSeq).toSet
    val keepNames = (0 until 2).map(k =>
      partsOf(dir, k).filter(n => PartStats.read(
        new java.io.File(new java.io.File(dir, s"shard=$k"), n)).exists(_.tsMin.exists(_ >= cutoff))))

    val res = StoreRetention.expire(spark, dir, cutoff)
    assert(res.size === 2)
    res.foreach { r =>
      assert(r.droppedParts === 1, s"wholly-old part must drop unread: $r")
      assert(r.rewrittenParts === 1, s"straddler must rewrite: $r")
      assert(r.keptParts === 1, s"wholly-new part must be untouched: $r")
      assert(r.rowsDroppedWhole === 10L)
    }
    val got = readBack(dir).collect().map(_.toSeq).toSet
    assert(got === expect, "retention must equal the row-level filter exactly")
    // null-ts row survived
    assert(readBack(dir).where("ts_us IS NULL").count() === 1)
    // wholly-new parts kept their exact names (manifest position preserved)
    (0 until 2).foreach { k =>
      val now = partsOf(dir, k)
      keepNames(k).foreach(n => assert(now.contains(n), s"kept part $n renamed"))
      assert(now.exists(_.startsWith("part-ret-")), "straddler became a part-ret part")
      // rewritten part carries a full sidecar incl. the null-count proof
      val ret = now.find(_.startsWith("part-ret-")).get
      val st = PartStats.read(new java.io.File(new java.io.File(dir, s"shard=$k"), ret)).get
      assert(st.nullTsRows.isDefined && st.tokenBloom.isDefined)
    }
  }

  test("a second run is a no-op; a later cutoff expires more; optimize composes after") {
    val dir = tmpDir()
    writeStore(dir)
    StoreRetention.expire(spark, dir, 5000L)
    val afterFirst = readBack(dir).collect().map(_.toSeq).toSet
    assert(StoreRetention.expire(spark, dir, 5000L).forall(r =>
      r.droppedParts === 0 && r.rewrittenParts === 0),
      "same cutoff again must not rewrite anything")
    assert(readBack(dir).collect().map(_.toSeq).toSet === afterFirst)

    val res2 = StoreRetention.expire(spark, dir, 9010L)
    assert(res2.nonEmpty)
    val expect = afterFirst.filter(r => r(2) == null || r(2).asInstanceOf[Long] >= 9010L)
    assert(readBack(dir).collect().map(_.toSeq).toSet === expect)

    // maintenance suite composes: optimize the remainder down to one part
    StoreOptimize.optimize(spark, dir)
    assert(readBack(dir).collect().map(_.toSeq).toSet === expect)
    (0 until 2).foreach(k => assert(partsOf(dir, k).size === 1))
  }

  test("pre-null-count sidecars force a lossless rewrite instead of an unsafe whole-drop") {
    val dir = tmpDir()
    // one part, wholly old by tsMax, but with a null-ts row AND a sidecar
    // truncated to 7 fields (pre-r9): the job must NOT whole-drop it
    df(Seq(Row(0, 1L, 100L, "old", 1.0), Row(0, 2L, null, "keepme", 2.0)))
      .write.format("graft-sharded").mode("append").save(dir)
    val d = new java.io.File(dir, "shard=0")
    val part = d.listFiles().filter(f => f.isFile && !f.getName.startsWith(".")
      && !f.getName.startsWith("_")).head
    val sc = new java.io.File(d, s".${part.getName}.minmax")
    val line = scala.io.Source.fromFile(sc, "UTF-8").getLines().next()
    val w = new java.io.PrintWriter(sc); w.println(line.split(",", -1).take(7).mkString(",")); w.close()
    assert(PartStats.read(part).get.nullTsRows.isEmpty)

    val res = StoreRetention.expire(spark, dir, 5000L)
    assert(res.head.droppedParts === 0 && res.head.rewrittenParts === 1)
    val got = readBack(dir).collect()
    assert(got.length === 1 && got.head.getString(3) === "keepme",
      "the null-ts row must survive a retention pass it cannot be proven absent from")
  }

  test("a provably-empty part (rows=0 sidecar) drops instead of vacuously keeping (ADVICE r9)") {
    val dir = tmpDir()
    // one real part so the shard plans a task, plus a hand-made EMPTY part
    // whose sidecar proves rows=0 — tsMin is None there, which the old
    // KeepWhole guard (`tsMin.forall(_ >= cutoff)`) accepted vacuously
    df(Seq(Row(0, 1L, 9000L, "new", 1.0)))
      .write.format("graft-sharded").mode("append").save(dir)
    val d = new java.io.File(dir, "shard=0")
    val empty = new java.io.File(d, "part-empty-0.csv")
    new java.io.FileOutputStream(empty).close()
    PartStats.write(new java.io.File(d, s".${empty.getName}.minmax"),
      PartStats(0L, None, None, None, None, None, None, None, Some(Set.empty), Some(0L)))

    val res = StoreRetention.expire(spark, dir, 5000L)
    assert(res.nonEmpty, "the empty part must force a retention task")
    assert(res.head.droppedParts === 1 && res.head.rowsDroppedWhole === 0L)
    assert(!empty.exists(), "rows=0 part must be dropped, not retained forever")
    assert(readBack(dir).count() === 1)
  }

  test("concurrent-commit registrations survive the retention flip") {
    val dir = tmpDir()
    writeStore(dir)
    // adopt manifests, then simulate a commit registering C mid-retention:
    // since runTask re-reads the manifest at flip time, registering before
    // the call exercises the same preserved-entry path as StoreOptimizeSpec
    (0 until 2).foreach { k =>
      val d = new java.io.File(dir, s"shard=$k")
      WriterFiles.writeManifest(d, partsOf(dir, k))
      val c = new java.io.PrintWriter(new java.io.File(d, s"part-$k-77-0.csv"))
      c.println(s"$k,123456789,late,5.0"); c.close()
      WriterFiles.registerInManifests(new java.io.File(dir), Seq(s"shard=$k/part-$k-77-0.csv"))
    }
    StoreRetention.expire(spark, dir, 5000L)
    (0 until 2).foreach { k =>
      val d = new java.io.File(dir, s"shard=$k")
      val names = WriterFiles.readManifest(d).get
      // every manifest entry resolves (no dangling names), and the
      // registered commit's rows survive — a sidecar-less part is
      // REWRITTEN (gaining its sidecar), never silently dropped
      assert(names.forall(n => new java.io.File(d, n).isFile), s"dangling: $names")
    }
    assert(readBack(dir).where("name = 'late'").count() === 2,
      "a concurrently registered commit's rows must survive retention")
  }

  test("_dropped tombstones evict by AGE, keep every young name past the cap, read legacy lines") {
    val d = Files.createTempDirectory("graft-dropped").toFile
    val t0 = 1700000000000L
    // pre-r12 bare-name file: reads as names, ages out on the next append
    Files.writeString(new java.io.File(d, "_dropped").toPath, "legacy-a.csv\nlegacy-b.csv\n")
    assert(StoreRetention.readDropped(d) === Seq("legacy-a.csv", "legacy-b.csv"))
    StoreRetention.appendDropped(d, Seq("new-1.csv"), now = t0)
    assert(StoreRetention.readDroppedEntries(d) === Seq(("new-1.csv", t0)),
      "legacy (unstamped) entries age out on the first stamped append")
    StoreRetention.appendDropped(d, Seq("new-2.csv"), now = t0 + 10000)
    assert(StoreRetention.readDropped(d) === Seq("new-1.csv", "new-2.csv"))
    // past the TTL relative to new-1 but not new-2: only new-1 sheds
    StoreRetention.appendDropped(d, Seq("new-3.csv"),
      now = t0 + StoreRetention.DroppedTtlMs + 5000)
    assert(StoreRetention.readDropped(d) === Seq("new-2.csv", "new-3.csv"),
      "eviction is by age, oldest stamp first")
    // a churn burst past the cap keeps EVERY still-young name (the cap
    // logs, it does not evict — silent tombstone loss is the one
    // unacceptable outcome for a lagging tail)
    val burst = (0 until StoreRetention.MaxDropped + 7).map(i => s"burst-$i.csv")
    StoreRetention.appendDropped(d, burst, now = t0 + StoreRetention.DroppedTtlMs + 6000)
    assert(StoreRetention.readDropped(d).size === StoreRetention.MaxDropped + 7 + 2)
  }
}
