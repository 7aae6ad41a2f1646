package graft

import java.nio.file.{Files, Path}

import graft.streaming.StreamingIvm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The incrementally-maintained view must equal the batch recompute after
  * any wave schedule, survive a stop/restart between waves, and stay
  * correct when a batch is redelivered (crash-replay idempotence).
  */
class StreamingIvmSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def deliver(wave: DataFrame, inDir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-ivmwave")
    wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    Files.move(part, inDir.resolve(name))
  }

  private lazy val events = queries.Tables.load(spark, "/root/testdata/sf0.001", "events")
    .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

  test("maintained view equals batch recompute across waves and a restart") {
    val root = Files.createTempDirectory("graft-ivm")
    val inDir = Files.createDirectory(root.resolve("in"))
    val viewRoot = root.resolve("view").toString
    val ckpt = root.resolve("ckpt").toString

    def start() = StreamingIvm.start(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .json(inDir.toString),
      viewRoot, ckpt)

    deliver(events.where(expr("event_id % 3 = 0")), inDir, "w1.json")
    deliver(events.where(expr("event_id % 3 = 1")), inDir, "w2.json")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // wave 3 arrives during downtime; restart resumes from the snapshot
    deliver(events.where(expr("event_id % 3 = 2")), inDir, "w3.json")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val got = StreamingIvm.readView(spark, viewRoot)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val want = StreamingIvm.view(events)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._3).sum === events.count())
  }

  test("crash-replay of an applied batch is a no-op (idempotent merge)") {
    val root = Files.createTempDirectory("graft-ivm2")
    val viewRoot = root.resolve("view").toString
    val wave = events.where(expr("event_id % 5 = 0"))
    StreamingIvm.processBatch(wave, viewRoot, batchId = 0L)
    val after1 = StreamingIvm.readView(spark, viewRoot)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // redeliver the SAME batch id with the same data — must change nothing
    StreamingIvm.processBatch(wave, viewRoot, batchId = 0L)
    val after2 = StreamingIvm.readView(spark, viewRoot)
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(after1.toSeq === after2.toSeq)
    // and a NEW batch still applies on top
    StreamingIvm.processBatch(events.where(expr("event_id % 5 = 1")), viewRoot, 1L)
    val after3 = StreamingIvm.readView(spark, viewRoot)
    assert(after3.agg(sum("n")).as[Long].head() ===
      events.where(expr("event_id % 5 <= 1")).count())
  }
}
