package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-5 drift/governance operators: replicate
  * the sf0.1 documents AND events tables N× (shifted ids, identical
  * content — the adversarial direction for anything pair-shaped) and time
  * the DECLARED queries. The structural claims under test:
  *
  *  - q130/q134: post-aggregate cost is bounded by DISTINCT cents, not
  *    rows — the histogram tables stay the same size as the corpus grows.
  *  - q131/q132/q136: post-aggregate cost is bounded by the vocabulary /
  *    gram dictionary — the pairwise TVD join and the novelty spread
  *    aggregate see the same row counts at every multiplier.
  *  - q139/q143: the diff/IVM joins are the only corpus-sized stages and
  *    must grow linearly, never quadratically.
  */
object DriftScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("graft-statscale").toString

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    (0 until mult).map { i =>
      docs.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/documents.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    (0 until mult).map { i =>
      ev.select((col("event_id") + lit(i.toLong * 10000000L)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"), col("props"))
    }.reduce(_ union _).write.mode("overwrite").parquet(s"$dir/events.parquet")

    println(s"[scale] x$mult -> " +
      s"${spark.read.parquet(s"$dir/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$dir/events.parquet").count()} events")

    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[scale] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    Seq("q130_ks_drift", "q131_tvd_drift", "q132_lexical_diversity",
      "q134_winsorized_mean", "q136_ngram_novelty", "q138_kanonymity",
      "q139_snapshot_diff", "q143_ivm_merge",
      // round-5 tranches 4/6: histogram-rank normalization and the
      // event-sequence windows (all partition by user/value-dictionary)
      "q150_quantile_norm", "q154_attribution", "q155_event_paths",
      "q156_late_events").foreach(time)
    spark.stop()
  }
}
