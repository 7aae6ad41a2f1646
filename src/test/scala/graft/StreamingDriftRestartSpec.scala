package graft

import java.nio.file.{Files, Path}

import graft.streaming.StreamingDrift
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

/** The drift monitor's keyed histogram state must survive a stop/restart
  * from checkpoint: waves arrive as files, the query is killed mid-corpus
  * and restarted, and the final histogram (and KS statistic) must equal
  * the batch computation over ALL rows — flatMapGroupsWithState recovery,
  * not just replay.
  */
class StreamingDriftRestartSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("event_type", StringType), StructField("value", DoubleType),
    StructField("event_id", LongType)))

  private def deliver(wave: DataFrame, inDir: Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft-driftwave")
    wave.coalesce(1).write.mode("overwrite").json(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    Files.move(part, inDir.resolve(name))
  }

  test("histogram state survives stop/restart; final D equals batch") {
    val root = Files.createTempDirectory("graft-driftrestart")
    val inDir = Files.createDirectory(root.resolve("in"))
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString

    val ev = queries.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("value"), col("event_id"))

    def start() = StreamingDrift.startParquetSink(
      StreamingDrift.histogram(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .json(inDir.toString)),
      outDir, ckpt)

    // wave 1 arrives; stream consumes it and is STOPPED
    deliver(ev.where(expr("event_id % 2 = 0")), inDir, "w1.json")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()

    // wave 2 arrives while nothing is running; restart must recover the
    // wave-1 histogram from state, not recompute it from the (consumed) file
    deliver(ev.where(expr("event_id % 2 = 1")), inDir, "w2.json")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val latest = StreamingDrift.latestCells(spark, outDir)
    val streamed = StreamingDrift.ksFromHistogram(latest)

    val rows = ev.as[(String, Double, Long)].collect()
    val a = rows.filter(_._1 == "click").map(t => math.round(t._2 * 100)).sorted
    val b = rows.filter(_._1 == "purchase").map(t => math.round(t._2 * 100)).sorted
    val want = (a ++ b).distinct.sorted.map { v =>
      val ca = a.count(_ <= v).toLong
      val cb = b.count(_ <= v).toLong
      math.abs(ca * b.length - cb * a.length) * 1000000L / (a.length.toLong * b.length)
    }.max
    assert(streamed === want)

    // and the recovered histogram is exactly the full-corpus histogram
    val got = latest.as[(Long, Long, Long, Long)].collect()
      .map { case (_, c, an, bn) => c -> (an, bn) }.toMap
    val batchCells = (a.groupBy(identity).view.mapValues(v => (v.length.toLong, 0L)) ++
      b.groupBy(identity).view.mapValues(v => (0L, v.length.toLong))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).reduce((x, y) => (x._1 + y._1, x._2 + y._2)))
      .toMap
    assert(got === batchCells)
  }
}
