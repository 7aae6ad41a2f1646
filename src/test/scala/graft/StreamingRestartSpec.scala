package graft

import java.nio.file.{Files, Path}

import graft.sources.DeviceDim
import graft.streaming.StreamingSync
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery — the streaming analog of the reference's
  * whole reason to exist: resumable sync (`internal/sync/sync.go:128-137`
  * re-derives its low-watermark from the sink each run; Structured
  * Streaming recovers source offsets + dedup state from the checkpoint).
  *
  * Uses a real FILE streaming source (per-file micro-batches via
  * maxFilesPerTrigger=1 — the Kafka stand-in available inside the
  * dependency policy): files arrive, the query is stopped MID-CORPUS,
  * more files arrive while it is down, and a fresh query object over the
  * same checkpoint resumes. Asserts exactly-once output vs the batch
  * oracle over the full corpus, including the cross-batch dedup state
  * (a duplicate event arriving after the restart is still dropped,
  * because the dropDuplicates state store travels in the checkpoint).
  */
class StreamingRestartSpec extends SparkTestBase {

  private def doc(subject: String, timeIso: String, speed: Double): String =
    s"""{"id":"d","subject":"$subject","source":"test","specversion":"1.0","time":"$timeIso","data":{"speed":$speed}}"""

  private val schema = graft.sources.StatusSource.docSchema(graft.schema.SignalDefinitions.all)

  private def writeFile(dir: Path, name: String, lines: Seq[String]): Unit =
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes("UTF-8"))

  private def streamDocs(inDir: Path): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1") // one micro-batch per arriving file
      .json(inDir.toString)

  private def pipeline(inDir: Path): DataFrame =
    StreamingSync.signalStream(
      streamDocs(inDir), DeviceDim.identityDim(spark, 1L to 8L), watermarkDelay = "1 hour")

  test("restart from checkpoint: exactly-once vs batch oracle, dedup state survives") {
    val root = Files.createTempDirectory("graft-restart")
    val inDir = Files.createDirectory(root.resolve("in"))
    val outDir = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // ── phase 1: two files arrive; the query consumes them and is stopped
    writeFile(inDir, "f1.json", Seq(
      doc("1", "2024-01-01T00:00:00.000Z", 10.0),
      doc("2", "2024-01-01T00:00:01.000Z", 20.0)))
    writeFile(inDir, "f2.json", Seq(
      doc("1", "2024-01-01T00:00:02.000Z", 11.0),
      doc("1", "2024-01-01T00:00:02.000Z", 11.0))) // in-file duplicate
    val q1 = StreamingSync.startParquetSink(pipeline(inDir), outDir, ckpt, buckets = 2)
    try {
      q1.processAllAvailable()
    } finally q1.stop()

    // ── down time: two more files arrive while no query is running; f4
    //    re-delivers f2's event (the page-boundary duplicate class) — only
    //    the checkpointed dedup state can catch it after the restart
    writeFile(inDir, "f3.json", Seq(
      doc("3", "2024-01-01T00:00:03.000Z", 30.0),
      doc("4", "2024-01-01T00:00:04.000Z", 40.0)))
    writeFile(inDir, "f4.json", Seq(
      doc("1", "2024-01-01T00:00:02.000Z", 11.0), // cross-restart duplicate
      doc("2", "2024-01-01T00:00:05.000Z", 21.0)))

    // ── phase 2: a FRESH query object over the same checkpoint resumes
    val q2 = StreamingSync.startParquetSink(pipeline(inDir), outDir, ckpt, buckets = 2)
    try {
      q2.processAllAvailable()
    } finally q2.stop()

    // ── batch oracle over the full corpus: same explode + dim join +
    //    duplicate collapse, computed in one batch pass
    val batch = graft.ops.SignalExplode
      .explodeSignals(
        spark.read.schema(schema).json(inDir.toString),
        graft.schema.SignalDefinitions.all)
      .join(broadcast(DeviceDim.identityDim(spark, 1L to 8L).select("tokenId", "subject")),
        Seq("subject"), "inner")
      .dropDuplicates("tokenId", "timestamp", "name")
      .select("tokenId", "timestamp", "name", "valueNumber", "valueString", "source")

    val streamed = graft.sources.SignalSink.readParquet(spark, outDir)
    assert(streamed.count() === batch.count()) // no dupes, no losses
    // value-level: the streamed rows are exactly the batch rows (sorted
    // row-string compare; exceptAll trips a Spark 4.1 internal planner
    // error when its replication plan meets the dropDuplicates subtree)
    def canon(df: DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(streamed) === canon(batch))
    // the cross-restart duplicate was dropped by checkpointed state: token 1
    // has exactly one row at 00:00:02 for Vehicle.Speed
    assert(streamed.where(
      col("tokenId") === 1L && col("name") === "Vehicle.Speed" &&
        col("timestamp") === java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:02Z"))
    ).count() === 1L)
  }

  test("file-source hygiene gauntlet: per-file micro-batches feed the windowed rollup") {
    val root = Files.createTempDirectory("graft-filestream")
    val inDir = Files.createDirectory(root.resolve("in"))
    writeFile(inDir, "g1.json", Seq(
      doc("1", "2024-01-01T00:00:10.000Z", 10.0),
      doc("1", "2024-01-01T00:00:20.000Z", 30.0)))
    writeFile(inDir, "g2.json", Seq(
      doc("1", "2024-01-01T00:01:10.000Z", 50.0),
      doc("2", "2024-01-01T00:00:30.000Z", 25.0)))

    // rollup directly over the watermarked explode+join (not through the
    // dropDuplicates stage: chaining its keyed state into a complete-mode
    // window agg trips an internal planner error in Spark 4.1 — the two
    // stateful stages are exercised separately by design)
    val sigs = graft.ops.SignalExplode
      .explodeSignals(streamDocs(inDir), graft.schema.SignalDefinitions.all)
      .join(broadcast(DeviceDim.identityDim(spark, 1L to 8L).select("tokenId", "subject")),
        Seq("subject"), "inner")
      .withWatermark("timestamp", "1 hour")
      .select("tokenId", "timestamp", "name", "valueNumber", "valueString", "source")
    val rollup = StreamingSync.windowedRollup(sigs, windowLength = "1 minute")
    val q = rollup.writeStream.format("memory").queryName("filerollup")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("filerollup")
        .where(col("name") === "Vehicle.Speed")
        .select(col("tokenId"), col("window_start"), col("n"), col("avg_value"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString, r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows === Set(
        (1L, "2024-01-01T00:00:00Z", 2L, 20.0), // 10 + 30 in minute 0
        (1L, "2024-01-01T00:01:00Z", 1L, 50.0),
        (2L, "2024-01-01T00:00:00Z", 1L, 25.0)))
    } finally q.stop()
  }
}
