package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming drift monitor must converge to the batch q130 statistic:
  * events arrive in micro-batches, per-bucket histogram state accumulates
  * via flatMapGroupsWithState, and the final emitted histogram yields the
  * SAME integer KS D as the batch query over the same rows.
  */
class StreamingDriftSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("streamed histogram state reproduces the batch KS statistic exactly") {
    val ev = queries.Tables.load(spark, sf, "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)].collect()

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double, Long)]
    val cells = StreamingDrift.histogram(
      input.toDF().toDF("event_type", "value", "event_id"))
    val q = cells.writeStream
      .format("memory").queryName("drift_cells").outputMode(OutputMode.Update)
      .start()
    try {
      // three uneven micro-batches
      val waves = ev.grouped(math.max(1, ev.length / 3 + 1)).toSeq
      waves.foreach { w => input.addData(w.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    // update-mode memory sink keeps every emission; the latest row per
    // (bucket, cents) is the final state
    val latest = spark.table("drift_cells")
      .withColumn("seq", monotonically_increasing_id())
      .groupBy(col("bucket"), col("cents"))
      .agg(max(struct(col("seq"), col("an"), col("bn"))).as("s"))
      .select(col("bucket"), col("cents"), col("s.an").as("an"), col("s.bn").as("bn"))

    val streamed = StreamingDrift.ksFromHistogram(latest)

    // batch reference: q130's exact integer D over the same rows
    val a = ev.filter(_._1 == "click").map(t => math.round(t._2 * 100)).sorted
    val b = ev.filter(_._1 == "purchase").map(t => math.round(t._2 * 100)).sorted
    val grid = (a ++ b).distinct.sorted
    val want = grid.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length) * 1000000L / (a.length.toLong * b.length)
    }.max
    assert(streamed === want)

    // the histogram itself matches the batch value counts cell by cell
    val batchCells = (a.groupBy(identity).view.mapValues(v => (v.length.toLong, 0L)) ++
      b.groupBy(identity).view.mapValues(v => (0L, v.length.toLong))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce((x, y) => (x._1 + y._1, x._2 + y._2)))
      .toMap
    val got = latest.as[(Long, Long, Long, Long)].collect()
      .map { case (_, c, an, bn) => c -> (an, bn) }.toMap
    assert(got === batchCells)
  }
}
