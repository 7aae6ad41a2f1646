package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the pipeline operators (q77-q83): replicate the sf0.1
  * documents corpus N× with doc_ids shifted (replicas keep IDENTICAL text,
  * so boilerplate chunk frequency and repetition density scale with N —
  * the adversarial direction for q81's chunk-DF join) and time the
  * DECLARED queries against the cloned corpus. Near-linear growth is the
  * pass criterion; the numbers land in NOTES.md.
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val big = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
    val dir = Files.createTempDirectory("graft-scale").toString
    big.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"[scale] corpus x$mult -> ${spark.read.parquet(s"$dir/documents.parquet").count()} docs")
    def time(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      println(f"[scale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      spark.catalog.clearCache()
    }
    // q92 is the adversarial case by construction here: replicas share
    // text, so EVERY gram is duplicated and the per-doc interval pass
    // covers the whole corpus — yet growth stays linear because work is
    // per-position, never per-pair (the structural edge of span-based
    // substring dedup over pair-based similarity joins on clone-heavy
    // corpora).
    Seq("q77_pii_redact", "q78_sequence_pack", "q79_repetition",
      "q81_boilerplate", "q82_chunking", "q75_dedup_normalized",
      "q92_dedup_substring", "q94_mixture_rebalance").foreach(time)
    spark.stop()
  }
}
