package graft.tools

import graft.functions.TextFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc plan/perf probe (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    def mins(d: String) = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), shingleHashes(shingles(col("toks"), 4)).as("gh"))
      .select(col("doc_id"), winnowMins(col("gh"), 5).as("fps"))

    time("explode sf0.001")(mins("/root/testdata/sf0.001").select(col("doc_id"), explode(col("fps"))).count())
    time("explode sf0.01")(mins("/root/testdata/sf0.01").select(col("doc_id"), explode(col("fps"))).count())
    val cached = mins("/root/testdata/sf0.1").cache()
    cached.count()
    time("explode sf0.1 cached")(cached.select(col("doc_id"), explode(col("fps"))).count())
    cached.unpersist()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("explode sf0.1 no-codegen")(mins("/root/testdata/sf0.1").select(col("doc_id"), explode(col("fps"))).count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    time("explode sf0.1 codegen")(mins("/root/testdata/sf0.1").select(col("doc_id"), explode(col("fps"))).count())
    spark.stop()
  }
}
