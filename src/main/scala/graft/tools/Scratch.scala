package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/perf probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val e = graft.queries.Tables.load(spark, d, "events").select(col("event_type"), col("value"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup")(e.count())
    time("warmup2")(e.count())

    // floor: single hash aggregate
    time("agg1 (type)")(e.groupBy(col("event_type")).count().count())
    time("agg1 again")(e.groupBy(col("event_type")).count().count())
    // floor: hash agg + window
    def aggw = {
      import org.apache.spark.sql.expressions.Window
      val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
      e.groupBy(col("event_type"), col("value")).count()
        .withColumn("cum", sum(col("count")).over(wv))
    }
    time("agg+window cold")(aggw.count())
    time("agg+window warm")(aggw.count())

    time("med warm1")(graft.operators.RobustStats
      .lowerMedianByKey(e, "event_type", "value", out = "med").count())
    time("med warm2")(graft.operators.RobustStats
      .lowerMedianByKey(e, "event_type", "value", out = "med").count())

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("med noAQE cold")(graft.operators.RobustStats
      .lowerMedianByKey(e, "event_type", "value", out = "med").count())
    time("med noAQE warm")(graft.operators.RobustStats
      .lowerMedianByKey(e, "event_type", "value", out = "med").count())
    spark.stop()
  }
}
