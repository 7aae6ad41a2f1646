package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming READ of the sharded store (`readStream.format("graft-sharded")`):
  * part-file-set offsets, exactly-once across restarts, startingOffsets,
  * admission control (`maxPartsPerTrigger`), Trigger.AvailableNow, and
  * pushed predicates composing into the tail.
  */
class ShardedStreamReadSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def batchDf(tokens: Seq[Long], name: String = "click", tsOff: Long = 0L): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        tokens.map(t => Row((t % 2).toInt, t, tsOff + t * 100, name, 1.0)), 2), schema)

  private def append(dir: String, tokens: Seq[Long], name: String = "click",
      tsOff: Long = 0L): Unit =
    batchDf(tokens, name, tsOff).write.format("graft-sharded").mode("append").save(dir)

  test("tails new parts exactly-once across stop/restart (part-set offsets in the checkpoint)") {
    val root = Files.createTempDirectory("graft-streamread")
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graft-sharded").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.select("token_id").collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", ckpt).start()

    append(store, 0L until 10L)
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.size === 10, "earliest: first batch is the whole store")
      append(store, 10L until 16L)
      q1.processAllAvailable()
      assert(seen.size === 16, "tail picks up the appended parts")
    } finally q1.stop()

    // a batch lands while the query is DOWN; the restart resumes from the
    // checkpointed part-set and processes only the gap — nothing twice
    append(store, 16L until 20L)
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = seen.asScala.toSeq.sorted
      assert(got === (0L until 20L).toSeq,
        s"restart must process exactly the gap, got ${got.mkString(",")}")
    } finally q2.stop()
  }

  test("a tail survives OPTIMIZE between micro-batches with zero duplicates (merged-part lineage)") {
    val root = Files.createTempDirectory("graft-streamopt")
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def start() = spark.readStream.format("graft-sharded").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.select("token_id", "ts_us").collect()
          .foreach(r => seen.add((r.getLong(0), r.getLong(1)))); ()
      }
      .option("checkpointLocation", ckpt).start()

    append(store, 0L until 10L)
    append(store, 10L until 16L)
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(seen.size === 16)

      // maintenance runs MID-STREAM (between micro-batches): every consumed
      // part merges into part-opt-* parts carrying lineage
      val res = graft.jobs.StoreOptimize.optimize(spark, store, codec = "none")
      assert(res.nonEmpty)

      // the next batches must re-read NOTHING from the merged parts, and
      // still pick up genuinely new appends
      append(store, 16L until 20L)
      q1.processAllAvailable()
      assert(seen.size === 20,
        s"optimize mid-stream must not re-feed merged rows (got ${seen.size})")
    } finally q1.stop()

    // and across a restart: another optimize while the query is down, plus
    // a new append — the restarted tail sees only the append
    graft.jobs.StoreOptimize.optimize(spark, store, codec = "none")
    append(store, 20L until 23L)
    val q2 = start()
    try {
      q2.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val toks = seen.asScala.toSeq.map(_._1).sorted
      assert(toks === (0L until 23L).toSeq,
        s"restart after maintenance must process exactly the gap, got ${toks.mkString(",")}")
    } finally q2.stop()
  }

  test("offsets compact to ~the live part census once maintenance covers consumed names") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.{ShardedMicroBatchStream, ShardedStreamOffset, ShardRowPredicate}
    val root = Files.createTempDirectory("graft-streamcompact")
    val store = root.resolve("store").toString
    (0 until 6).foreach(i => append(store, (10L * i) until (10L * i + 10L), tsOff = 1000000L * i))

    val stream = new ShardedMicroBatchStream(store, schema, ShardRowPredicate.Trivial,
      None, "earliest", -1)
    val o0 = stream.initialOffset().asInstanceOf[ShardedStreamOffset]
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    val namesBefore = o1.parts.values.map(_.size).sum
    assert(namesBefore >= 6, s"six appends must be tracked, got $namesBefore")

    // maintenance merges everything; the next offset must (a) mark the
    // merged parts consumed via lineage and (b) DROP the retired leaves —
    // a month-long tail's checkpoint entry tracks the live census, not
    // every part ever published
    graft.jobs.StoreOptimize.optimize(spark, store, codec = "none")
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    assert(stream.planInputPartitions(o1, o2).isEmpty,
      "merged parts with fully-consumed lineage must never be read")
    val namesAfter = o2.parts.values.map(_.size).sum
    val liveNow = o2.parts.keys.toSeq.map(k =>
      graft.sources.ShardedSignalSource.activeParts(
        new java.io.File(store, s"shard=$k")).size).sum
    assert(namesAfter === liveNow,
      s"offset must compact to the live census ($namesAfter vs live $liveNow, was $namesBefore)")
    assert(o2.parts.values.flatten.forall(_.startsWith("part-opt-")),
      s"only the merged parts remain tracked: ${o2.parts}")

    // new appends still tail exactly-once on top of the compacted offset
    append(store, 100L until 105L)
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    val planned = stream.planInputPartitions(o2, o3)
    assert(planned.nonEmpty, "the fresh append must plan")
  }

  test("sorted=true is rejected on the streaming read (batch-only option, ADVICE r9)") {
    val root = Files.createTempDirectory("graft-streamsorted")
    val store = root.resolve("store").toString
    append(store, 0L until 4L)
    val q = spark.readStream.format("graft-sharded")
      .option("sorted", "true").load(store)
      .writeStream.format("noop")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getMessage.contains("sorted") ||
      Option(ex.getCause).exists(_.getMessage.contains("sorted")),
      s"must reject sorted=true loudly, got: ${ex.getMessage}")
  }

  test("startingOffsets=latest skips the existing store and tails only new parts") {
    val root = Files.createTempDirectory("graft-streamlatest")
    val store = root.resolve("store").toString
    append(store, 0L until 50L)

    val q = spark.readStream.format("graft-sharded")
      .option("startingOffsets", "latest").load(store)
      .writeStream.format("memory").queryName("latest_tail")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("latest_tail").count() === 0, "latest: history is skipped")
      append(store, 100L until 104L)
      q.processAllAvailable()
      assert(spark.table("latest_tail").select("token_id").collect()
        .map(_.getLong(0)).sorted === (100L until 104L).toArray)
    } finally q.stop()
  }

  test("maxPartsPerTrigger bounds each micro-batch; AvailableNow drains a frozen target and stops") {
    val root = Files.createTempDirectory("graft-streamcap")
    val store = root.resolve("store").toString
    // 4 separate appends -> >= 4 parts
    (0 until 4).foreach(i => append(store, (10L * i) until (10L * i + 10L)))
    val nParts = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("shard=")).flatMap(_.listFiles())
      .count(f => f.isFile && !f.getName.startsWith("."))
    assert(nParts >= 4)

    var batches = 0
    val counts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-sharded")
      .option("maxPartsPerTrigger", "1").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batches += 1; counts += df.count(); ()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow must drain and terminate")
    finally q.stop()
    assert(counts.sum === 40, s"all rows exactly once, got $counts")
    assert(batches >= nParts, s"1 part per trigger -> >= $nParts batches, got $batches")
  }

  test("pushed predicates compose into the tail (parse-time row skip on new parts)") {
    val root = Files.createTempDirectory("graft-streampred")
    val store = root.resolve("store").toString
    append(store, 0L until 10L, name = "click")
    append(store, 10L until 20L, name = "purchase")

    val q = spark.readStream.format("graft-sharded").load(store)
      .where(col("name") === "purchase" && col("token_id") >= 12L)
      .writeStream.format("memory").queryName("pred_tail")
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("pred_tail").select("token_id").collect().map(_.getLong(0)).sorted
      assert(got === (12L until 20L).toArray)
    } finally q.stop()
  }

  test("tail + stateful latest aggregation ≡ the batch snapshot (the consuming sync loop)") {
    val root = Files.createTempDirectory("graft-streamstate")
    val store = root.resolve("store").toString
    append(store, 0L until 8L, "speed")
    append(store, 0L until 8L, "speed", tsOff = 1000000L)

    // the reference's consuming loop: maintain latest-per-(token, signal)
    // incrementally from the tail — Spark's stateful aggregation over the
    // part-diff stream
    val q = spark.readStream.format("graft-sharded").load(store)
      .groupBy("token_id", "name").agg(max("ts_us").as("last_us"))
      .writeStream.format("memory").queryName("latest_state")
      .outputMode("complete")
      .option("checkpointLocation", root.resolve("ckpt").toString).start()
    try {
      q.processAllAvailable()
      def batchSnap() = spark.read.format("graft-sharded").load(store)
        .groupBy("token_id", "name").agg(max("ts_us").as("last_us"))
      def agree(): Unit = {
        val s = spark.table("latest_state")
        assert(s.exceptAll(batchSnap()).count() === 0 &&
          batchSnap().exceptAll(s).count() === 0)
      }
      agree()
      // new epochs move the state forward incrementally — only the diff is read
      append(store, 0L until 8L, "speed", tsOff = 2000000L)
      append(store, 0L until 4L, "soc")
      q.processAllAvailable()
      agree()
      assert(spark.table("latest_state").where("name = 'speed' AND last_us < 2000000")
        .count() === 0, "stale versions must not survive in the state")
    } finally q.stop()
  }

  test("closes the loop: streaming-ingested epochs tail back out exactly-once") {
    val root = Files.createTempDirectory("graft-streamloop")
    val inDir = Files.createDirectory(root.resolve("in"))
    val store = root.resolve("store").toString

    // ingest: 3 files → 3 micro-batch epochs through the r8 streaming SINK
    (0 until 3).foreach(i => Files.write(inDir.resolve(s"f$i.csv"),
      (0 until 20).map(j => s"${j % 4},${(j % 4) + 4L * j},${1000L * (20 * i + j)},click,1.0")
        .mkString("\n").getBytes("UTF-8")))
    val ingest = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").csv(inDir.toString)
      .withColumn("shard", coalesce(col("shard"), lit(0)))
      .writeStream.format("graft-sharded")
      .option("checkpointLocation", root.resolve("ckpt_w").toString)
      .outputMode("append").start(store)
    try ingest.processAllAvailable() finally ingest.stop()
    assert(spark.read.format("graft-sharded").load(store).count() === 60)

    // tail: AvailableNow drains the epoch-published parts exactly once —
    // the store is a streaming TABLE in both directions
    var rows = 0L
    val tail = spark.readStream.format("graft-sharded").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        rows += df.count(); ()
      }
      .option("checkpointLocation", root.resolve("ckpt_r").toString)
      .trigger(Trigger.AvailableNow()).start()
    try assert(tail.awaitTermination(120000)) finally tail.stop()
    assert(rows === 60, "every epoch-published part tails out exactly once")
  }

  test("an oversized epoch part byte-range splits within its micro-batch") {
    val root = Files.createTempDirectory("graft-streamsplit")
    val store = root.resolve("store").toString
    append(store, 0L until 2000L) // one append → one sizable part per shard
    var parts = 0
    var rows = 0L
    val q = spark.readStream.format("graft-sharded")
      .option("splitBytes", "4096").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        parts = df.rdd.getNumPartitions; rows += df.count(); ()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    assert(rows === 2000, "split ranges must cover every row exactly once")
    assert(parts > 2, s"a 2-shard batch must fan out beyond 2 tasks, got $parts")
  }

  test("an oversized COMPRESSED part splits at granule frames within its micro-batch (r11)") {
    val root = Files.createTempDirectory("graft-streamzsplit")
    val store = root.resolve("store").toString
    // one batch ingest → sizable zstd parts carrying granule indexes —
    // the batch-then-tail shape where a compressed part used to serialize
    // its whole micro-batch into one task
    batchDf(0L until 4000L).write.format("graft-sharded")
      .option("codec", "zstd").option("granuleRows", "128")
      .mode("append").save(store)
    var parts = 0
    var rows = 0L
    val q = spark.readStream.format("graft-sharded")
      .option("splitBytes", "4096").load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        parts = df.rdd.getNumPartitions; rows += df.count(); ()
      }
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    try assert(q.awaitTermination(120000)) finally q.stop()
    assert(rows === 4000, "granule-frame splits must cover every row exactly once")
    assert(parts > 2, s"a 2-shard zstd batch must fan out beyond 2 tasks, got $parts")
  }

  test("a crash-replay straddling OPTIMIZE resolves retired parts from the trash (replay window)") {
    val root = Files.createTempDirectory("graft-streamreplay")
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString
    (0 until 4).foreach(i => append(store, (10L * i) until (10L * i + 10L)))
    val shardDirs = new java.io.File(store).listFiles().filter(_.getName.startsWith("shard="))
    val nParts = shardDirs.flatMap(_.listFiles())
      .count(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
    val cap = (nParts + 1) / 2 // batch 0 = first half, batch 1 = the rest

    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var failOnce = true
    def start() = spark.readStream.format("graft-sharded")
      .option("maxPartsPerTrigger", cap.toString).load(store)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // batch 1's offset is already in the WAL when this runs: throwing
        // here is exactly "killed between planInputPartitions and commit"
        if (id == 1L && failOnce) { failOnce = false; sys.error("simulated crash") }
        df.select("token_id").collect().foreach(r => seen.add(r.getLong(0))); ()
      }
      .option("checkpointLocation", ckpt).start()

    val q1 = start()
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q1.processAllAvailable() finally q1.stop()
    }
    assert(seen.size < 40, "the crash must leave batch 1 uncommitted")

    // maintenance runs while the query is down — it retires every part the
    // uncommitted batch has already PLANNED (by name, in the checkpoint)
    val res = graft.jobs.StoreOptimize.optimize(spark, store, codec = "none")
    assert(res.nonEmpty)
    shardDirs.foreach { d =>
      assert(Option(d.listFiles()).getOrElse(Array.empty)
        .exists(_.getName.startsWith(graft.sources.PartTrash.Prefix)),
        s"retired parts must be in the trash, not unlinked: ${d.getName}")
    }

    // the restart REPLAYS batch 1 from its checkpointed part names — the
    // trash fallback makes them resolvable; then the merged part is skipped
    // via lineage (its leaves are all consumed). Zero loss, zero dups.
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    import scala.jdk.CollectionConverters._
    val got = seen.asScala.toSeq.sorted
    assert(got === (0L until 40L).toSeq,
      s"replay must complete exactly-once through the trash, got ${got.size} rows")
  }

  test("TTL whole-drop tombstones compact retired names out of a long tail's offset") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.{ShardedMicroBatchStream, ShardedStreamOffset, ShardRowPredicate}
    val root = Files.createTempDirectory("graft-streamttl")
    val store = root.resolve("store").toString
    // three time bands: band 0 drops WHOLE under the cutoff (no covering
    // part -> tombstone is the only proof object), band 1 straddles
    // (rewrite carries lineage), band 2 survives untouched
    append(store, 0L until 10L, tsOff = 0L)
    append(store, 10L until 20L, tsOff = 1000000L)
    append(store, 20L until 30L, tsOff = 2000000L)

    val stream = new ShardedMicroBatchStream(store, schema, ShardRowPredicate.Trivial,
      None, "earliest", -1)
    val o0 = stream.initialOffset().asInstanceOf[ShardedStreamOffset]
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    assert(stream.planInputPartitions(o0, o1).nonEmpty)

    // cutoff inside band 1: band 0's parts drop whole (tsMax < cutoff)
    graft.jobs.StoreRetention.expire(spark, store, cutoffTsUs = 1001000L, codec = "none")
    val dropped = new java.io.File(store).listFiles().filter(_.getName.startsWith("shard="))
      .flatMap(d => graft.jobs.StoreRetention.readDropped(d))
    assert(dropped.nonEmpty, "whole-drops must leave tombstones")

    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    assert(stream.planInputPartitions(o1, o2).isEmpty,
      "rewrites are lineage-covered and drops hold no new rows — nothing re-feeds")
    val namesAfter = o2.parts.values.map(_.size).sum
    val liveNow = o2.parts.keys.toSeq.map(k =>
      graft.sources.ShardedSignalSource.activeParts(
        new java.io.File(store, s"shard=$k")).size).sum
    assert(namesAfter === liveNow,
      s"tombstoned whole-drops must compact out of the offset " +
        s"($namesAfter tracked vs $liveNow live)")
    // steady state: the next trigger re-proves nothing and stays compact
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable()).asInstanceOf[ShardedStreamOffset]
    assert(o3.parts.values.map(_.size).sum === liveNow)
  }

  test("a resumed pre-namespacing stream sweeps its legacy epoch orphans — but never a committed lineage's data") {
    def ingest(store: String, root: java.nio.file.Path, n: Int): Unit = {
      val inDir = Files.createDirectories(root.resolve("in"))
      (0 until n).foreach(i => Files.write(inDir.resolve(s"f$i.csv"),
        (0 until 4).map(j => s"0,${i * 10 + j},${1000L * j},click,1.0")
          .mkString("\n").getBytes("UTF-8")))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").csv(inDir.toString)
        .writeStream.format("graft-sharded")
        .option("checkpointLocation", root.resolve("ckpt_w").toString)
        .outputMode("append").start(store)
      try q.processAllAvailable() finally q.stop()
    }
    def plantLegacy(store: String, name: String = "part-e1-0-0.csv",
        aged: Boolean = true): java.io.File = {
      val d = new java.io.File(store, "shard=0"); d.mkdirs()
      val f = new java.io.File(d, name)
      Files.write(f.toPath, "999,123,orphan,1.0\n".getBytes("UTF-8"))
      // a pre-crash attempt's orphan is at least a restart-gap old; only
      // aged files may be claimed (ADVICE r11: the mtime grace protects a
      // still-running mixed-version writer's unmarked publishes)
      if (aged) assert(f.setLastModified(System.currentTimeMillis() - 120000L))
      f
    }

    // store A: an un-namespaced part-e1-* with NO commit marker anywhere is
    // a pre-change attempt's published-but-uncommitted orphan — epoch 1's
    // replay commit sweeps it (ADVICE r10), so its duplicate rows do not
    // stay visible forever. A FRESH legacy file, by contrast, may be a
    // still-running pre-change query's publish-in-flight: the grace keeps
    // the sweep's hands off it.
    val rootA = Files.createTempDirectory("graft-legacyA")
    val storeA = rootA.resolve("store").toString
    val orphan = plantLegacy(storeA)
    val inFlight = plantLegacy(storeA, name = "part-e1-0-1.csv", aged = false)
    ingest(storeA, rootA, n = 3) // epochs 0,1,2
    assert(!orphan.isFile, "the AGED legacy uncommitted orphan must be swept at epoch 1's commit")
    assert(inFlight.isFile, "a FRESH legacy file is inside the grace period: never claimed")
    assert(spark.read.format("graft-sharded").load(storeA)
      .where("name = 'orphan'").count() === 1, "only the in-flight file's row remains")
    assert(spark.read.format("graft-sharded").load(storeA).count() === 13)

    // store B: the same legacy name but with ANOTHER query's commit marker
    // for epoch 1 — that lineage durably committed it pre-change, and the
    // sweep must not claim it (the r9 cross-lineage deletion bug stays
    // closed)
    val rootB = Files.createTempDirectory("graft-legacyB")
    val storeB = rootB.resolve("store").toString
    val committed = plantLegacy(storeB)
    val mk = new java.io.File(storeB, "_stream_commits/oldquery")
    mk.mkdirs()
    new java.io.FileOutputStream(new java.io.File(mk, "epoch-1")).close()
    ingest(storeB, rootB, n = 3)
    assert(committed.isFile, "a marker-committed legacy part is another lineage's data")
    assert(spark.read.format("graft-sharded").load(storeB).count() === 13)
  }

  test("offsets serialize deterministically and round-trip") {
    import graft.sources.ShardedStreamOffset
    val o = ShardedStreamOffset(Map(
      "10" -> Seq("part-b.csv", "part-a.csv"), "2" -> Seq("x.csv"), "0" -> Seq.empty))
    val j = o.json()
    assert(j.indexOf("\"2\"") < j.indexOf("\"10\""), s"numeric key order: $j")
    assert(ShardedStreamOffset.fromJson(j) === o)
    // part order inside a shard is preserved (ingest order is meaningful)
    assert(ShardedStreamOffset.fromJson(j).parts("10") === Seq("part-b.csv", "part-a.csv"))
  }
}
