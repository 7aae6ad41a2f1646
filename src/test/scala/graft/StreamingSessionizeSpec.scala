package graft

import java.sql.Timestamp

import graft.streaming.StreamingSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming session windows ≡ the batch q22 sessionizer on the same
  * events — the live/batch equivalence a lambda-architecture pipeline
  * relies on. Also pins the append-mode emission rule: a session appears
  * only once the watermark passes its close.
  */
class StreamingSessionizeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  // (user_id, minute): u1 has two sessions (gap > 30 min between minute 10
  // and 50); u2 one session; events arrive across THREE micro-batches with
  // within-watermark disorder in the second.
  private val batches = Seq(
    Seq((1L, 0L), (1L, 10L), (2L, 5L)),
    Seq((1L, 50L), (2L, 20L)), // u2's minute-20 event arrives "late" but within watermark
    Seq((1L, 60L), (2L, 25L))
  )

  test("streaming sessions match the batch sessionizer; append emits on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("user_id", "min")
      .select(col("user_id"), timestamp_millis(col("min") * 60000L).as("ts"))
    val out = StreamingSessionize.sessions(events, gap = "30 minutes", watermarkDelay = "30 minutes")

    val query = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // nothing can have closed yet: watermark = max(65) - 30 = minute 35,
      // u1's first session closes at 10+30=40 > 35
      assert(spark.table("sessions").count() === 0L)

      // a sentinel user far in the future advances the GLOBAL watermark past
      // every open session's close; its own session stays open and unseen
      input.addData((99L, 1000L))
      query.processAllAvailable()
      // session_window emission needs a second watermark advance in some
      // plans — push once more, still from the sentinel only
      input.addData((99L, 1001L))
      query.processAllAvailable()

      val streamed = spark.table("sessions")
        .where(col("user_id") < 99L)
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

      // batch oracle: the q22 formulation (lag + break flags + running sum)
      // over the SAME events; streaming session_end = batch last-event + gap
      val all = batches.flatten
      val df = all.toDF("user_id", "min")
        .select(col("user_id"), timestamp_millis(col("min") * 60000L).as("ts"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expected = df
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("brk",
          when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk")).over(run))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("session_start"),
          (max(col("ts")) + expr("INTERVAL 30 MINUTES")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

      assert(expected === Set(
        (1L, ts(0), ts(40), 2L), (1L, ts(50), ts(90), 2L), (2L, ts(5), ts(55), 3L)))
      assert(streamed === expected)
    } finally query.stop()
  }
}
