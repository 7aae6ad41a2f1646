package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generic scaling probe: clone the sf0.1 tables N× in a chosen direction
  * and time any DECLARED queries against the cloned corpus — the evidence
  * generator for "would this hold at 10×" questions on new operators.
  *
  * Directions (events table; documents cloned id-shifted either way):
  *   - `keys`:  user ids shift per clone — key-space grows, density flat.
  *   - `dense`: event ids shift, user ids kept — per-key history grows N×,
  *     the adversarial direction for per-user windows/folds.
  *
  * Usage: runMain graft.tools.CloneProbe <keys|dense> <mult> q171,q172,...
  * (query names may be unique prefixes, e.g. "q172").
  */
object CloneProbe {
  def main(args: Array[String]): Unit = {
    val direction = args.headOption.getOrElse("dense")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val wanted = args.lift(2).map(_.split(",").toSeq).getOrElse(Seq("q171", "q172", "q173", "q175", "q176"))

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-cloneprobe").toString
    val ev = graft.queries.Tables.load(spark, "/root/testdata/sf0.1", "events")
    (0 until mult).map { i =>
      if (direction == "keys")
        ev.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"), col("ts"),
          (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      else
        ev.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"), col("ts"),
          col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until mult).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "embeddings"))
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")

    val defs = graft.SparkEntry.allDefs.filter(q => wanted.exists(q.name.startsWith))
    println(s"[cloneprobe] $direction x$mult events=" +
      spark.read.parquet(s"$dir/events.parquet").count())
    for (q <- defs) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = q.spark(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[cloneprobe] ${q.name}%-28s $t%7.2f s  rows=$n%9d")
    }
    spark.stop()
  }
}
