package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest into the sharded store (`writeStream.format
  * ("graft-sharded")`): exactly-once across stop/restart, per-epoch
  * clustered + sorted parts, epoch-replay idempotence via deterministic
  * names + commit markers.
  */
class ShardedStreamWriteSpec extends SparkTestBase {

  private val inSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("token_id", LongType, nullable = true),
    StructField("ts_us", LongType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  private def csvLine(shard: Int, tok: Long, ts: Long): String =
    s"$shard,$tok,$ts,click,1.5"

  private def writeInput(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))

  private def streamIn(inDir: Path): DataFrame =
    spark.readStream.schema(inSchema)
      .option("maxFilesPerTrigger", "1") // one micro-batch per arriving file
      .csv(inDir.toString)
      // nullability erasure for the store's non-null shard contract
      .withColumn("shard", coalesce(col("shard"), lit(0)))

  test("streaming append: exactly-once across restart, parts clustered and sorted per epoch") {
    val root = Files.createTempDirectory("graft-streamwrite")
    val inDir = Files.createDirectory(root.resolve("in"))
    val store = root.resolve("store").toString
    val ckpt = root.resolve("ckpt").toString

    def start() = streamIn(inDir).writeStream
      .format("graft-sharded")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(store)

    // phase 1: two micro-batches, then stop
    writeInput(inDir, "f1.csv", (0 until 40).map(i => csvLine(i % 4, (i % 4) + 4L * i, 1000L * i)))
    writeInput(inDir, "f2.csv", (0 until 30).map(i => csvLine(i % 4, (i % 4) + 4L * i, 900000L + 1000L * i)))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    val afterPhase1 = spark.read.format("graft-sharded").load(store).count()
    assert(afterPhase1 === 70)

    // phase 2: another file arrives while the query is down; restart drains it
    writeInput(inDir, "f3.csv", (0 until 25).map(i => csvLine(i % 4, (i % 4) + 4L * i, 1800000L + 1000L * i)))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val df = spark.read.format("graft-sharded").load(store)
    assert(df.count() === 95, "no duplicates, no losses across the restart")
    assert(df.where("CAST(token_id % 4 AS INT) <> shard").count() === 0)

    // every published part is clustered (one shard per file by location)
    // and sorted by (token_id, ts_us) — the declared requirements applied
    // per micro-batch — so the store remains sorted=true-readable
    val viaSorted = spark.read.format("graft-sharded").option("sorted", "true")
      .load(store).groupBy("token_id").agg(count(lit(1)).as("n"))
    val viaPlain = spark.read.format("graft-sharded")
      .load(store).groupBy("token_id").agg(count(lit(1)).as("n"))
    assert(viaSorted.exceptAll(viaPlain).count() === 0)
    assert(viaPlain.exceptAll(viaSorted).count() === 0)

    // no staging residue; epoch markers exist
    val rootFiles = new java.io.File(store).listFiles().map(_.getName)
    assert(!rootFiles.exists(_.startsWith("_tmp-stream-")) ||
      new java.io.File(store).listFiles().filter(_.getName.startsWith("_tmp-stream-"))
        .forall(f => Option(f.listFiles()).forall(_.isEmpty)),
      s"staging residue: ${rootFiles.mkString(", ")}")
    assert(rootFiles.contains("_stream_commits"))
  }

  test("a replayed epoch publishes identical deterministic names (idempotent re-commit)") {
    import graft.sources.{ShardedStreamingWrite, ShardedTaskCommit}
    val store = Files.createTempDirectory("graft-replay").toFile.getAbsolutePath
    val w = new ShardedStreamingWrite(store, inSchema, "none", "qid-1")
    val fac = w.createStreamingWriterFactory(null)

    def runEpoch(epochId: Long): graft.sources.ShardedTaskCommit = {
      val dw = fac.createWriter(0, 7L, epochId)
      val row = org.apache.spark.sql.catalyst.InternalRow(
        3, 3L, 100L, org.apache.spark.unsafe.types.UTF8String.fromString("click"), 1.0)
      dw.write(row)
      dw.commit().asInstanceOf[graft.sources.ShardedTaskCommit]
    }

    val m1 = runEpoch(5L)
    w.commit(5L, Array(m1))
    val firstCount = spark.read.format("graft-sharded").load(store).count()
    assert(firstCount === 1)

    // Spark replays epoch 5 after a crash-before-ack: same names, marker
    // short-circuits — still exactly one row
    val m2 = runEpoch(5L)
    assert(m2.files === m1.files, "replayed epoch must produce identical names")
    w.commit(5L, Array(m2))
    assert(spark.read.format("graft-sharded").load(store).count() === 1)
  }

  test("a fresh-checkpoint query never sweeps a previous lineage's epoch parts (ADVICE r9)") {
    import graft.sources.{ShardedStreamingWrite, ShardedTaskCommit}
    val store = Files.createTempDirectory("graft-lineage").toFile.getAbsolutePath

    def runQuery(qid: String, tok: Long): Unit = {
      val w = new ShardedStreamingWrite(store, inSchema, "none", qid)
      val fac = w.createStreamingWriterFactory(null)
      // a fresh checkpoint restarts epochs at 0 — the collision the
      // namespace exists for
      val dw = fac.createWriter(0, 1L, 0L)
      dw.write(org.apache.spark.sql.catalyst.InternalRow(
        3, tok, 100L, org.apache.spark.unsafe.types.UTF8String.fromString("click"), 1.0))
      val m = dw.commit().asInstanceOf[ShardedTaskCommit]
      w.commit(0L, Array(m))
    }

    runQuery("11111111-aaaa", 30L)
    assert(spark.read.format("graft-sharded").load(store).count() === 1)
    // second query, NEW checkpoint, same store, same epoch number: its
    // commit sweep must only match its own lineage's names
    runQuery("22222222-bbbb", 31L)
    val got = spark.read.format("graft-sharded").load(store)
    assert(got.count() === 2,
      "a new lineage's epoch-0 commit must not delete the previous lineage's epoch-0 parts")
    assert(got.select("token_id").collect().map(_.getLong(0)).sorted === Array(30L, 31L))
  }

  test("a differently-partitioned replay sweeps the crashed attempt's published files (ADVICE r8)") {
    import graft.sources.{ShardedStreamingWrite, ShardedTaskCommit, WriterFiles}
    val store = Files.createTempDirectory("graft-resweep").toFile
    val w = new ShardedStreamingWrite(store.getAbsolutePath, inSchema, "none", "qid-2")
    val fac = w.createStreamingWriterFactory(null)

    def writeRow(partitionId: Int, epochId: Long, tok: Long): ShardedTaskCommit = {
      val dw = fac.createWriter(partitionId, 100L + partitionId, epochId)
      dw.write(org.apache.spark.sql.catalyst.InternalRow(
        3, tok, 100L, org.apache.spark.unsafe.types.UTF8String.fromString("click"), 1.0))
      dw.commit().asInstanceOf[ShardedTaskCommit]
    }

    // first attempt of epoch 7: TWO partitions publish their files and even
    // reach manifest registration, then crash BEFORE the epoch marker
    val a0 = writeRow(0, 7L, 30L)
    val a1 = writeRow(1, 7L, 31L)
    val shardD = new java.io.File(store, "shard=3")
    shardD.mkdirs()
    WriterFiles.writeManifest(shardD, Seq.empty) // store is manifest-governed
    (a0.files ++ a1.files).foreach { rel =>
      val src = new java.io.File(store, s"_tmp-stream-qid-2/epoch-7/$rel")
      val dst = new java.io.File(store, rel)
      dst.getParentFile.mkdirs()
      WriterFiles.moveReplace(src, dst)
    }
    WriterFiles.registerInManifests(store, a0.files ++ a1.files)
    assert(spark.read.format("graft-sharded").load(store.getAbsolutePath).count() === 2)

    // restart replays epoch 7 under a DIFFERENT partitioning: ONE task,
    // partitionId 5 — names the first attempt never used
    val dwB = fac.createWriter(5, 200L, 7L)
    Seq(30L, 31L).foreach { tok =>
      dwB.write(org.apache.spark.sql.catalyst.InternalRow(
        3, tok, 100L, org.apache.spark.unsafe.types.UTF8String.fromString("click"), 1.0))
    }
    val b2 = dwB.commit().asInstanceOf[ShardedTaskCommit]
    w.commit(7L, Array(b2))

    // the first attempt's orphans are swept from disk AND the manifest;
    // the store holds exactly the replay's rows — no silent duplicates
    val got = spark.read.format("graft-sharded").load(store.getAbsolutePath)
    assert(got.count() === 2, "replay must not duplicate the crashed attempt's rows")
    assert(got.select("token_id").collect().map(_.getLong(0)).sorted === Array(30L, 31L))
    val manifest = WriterFiles.readManifest(shardD).get
    assert(manifest.forall(n => new java.io.File(shardD, n).isFile))
    assert(!manifest.exists(n => n.contains("-0-") || n.contains("-1-")),
      s"crashed attempt's names must be unregistered: $manifest")
  }
}
