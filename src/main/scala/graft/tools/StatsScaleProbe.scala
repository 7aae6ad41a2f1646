package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-4 stats/graph/tokenizer operators: clone the
  * sf0.1 tables N× and time the DECLARED queries against the cloned data.
  *
  * The clones are chosen to stress each query's adversarial direction:
  *   - events: ids shifted, (event_type, value, ts) kept — rows-per-key
  *     grows N× for q107's 5-key medians (the direction that killed the
  *     row_number form) while q118's user key-space also grows N×;
  *   - lineitem: order ids shifted, SUPPLIER ids kept — the co-supplier
  *     graph densifies (edge weights grow N×) while the top-20k cap must
  *     keep q115's triangle closure bounded;
  *   - documents: doc ids shifted, text kept — q113's vocabulary is
  *     INVARIANT under cloning, so only the round-0 corpus aggregate may
  *     grow; the 5 merge rounds must stay flat.
  */
object StatsScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-scale4").toString

    // read ts as raw int64 nanos and write it back as plain INT64 —
    // Tables.load's nanos-to-micros path handles both encodings
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    (0 until mult).map { i =>
      ev.select((col("event_id") + lit(i.toLong * 1000000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    (0 until mult).map { i =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until mult).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // dims some queries join (copied unchanged)
    for (t <- Seq("supplier", "nation", "region", "customer", "orders", "part",
        "embeddings"))
      spark.read.parquet(s"/root/testdata/sf0.1/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")

    println(s"[scale4] x$mult events=" +
      spark.read.parquet(s"$dir/events.parquet").count() +
      " lineitem=" + spark.read.parquet(s"$dir/lineitem.parquet").count() +
      " documents=" + spark.read.parquet(s"$dir/documents.parquet").count())

    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[scale4] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    Seq("q107_mad_outliers", "q114_correlation", "q118_markov",
      "q106_gap_fill", "q109_ewma", "q112_hopping_window",
      "q115_triangles", "q116_histogram", "q117_hhi",
      "q113_bpe_train").foreach(time)
    spark.stop()
  }
}
