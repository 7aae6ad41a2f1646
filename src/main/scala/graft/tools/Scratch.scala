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
    val d = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$d/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("warmup")(docs.count())

    // current q33: posexplode + row window
    def current() = {
      import org.apache.spark.sql.expressions.Window
      val grams = docs
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), rollingHash(col("text")).as("doc_hash"),
          graft.functions.HashExpressions.shingleHash32(col("toks"), 4).as("gh"))
        .select(col("doc_id"), col("doc_hash"), size(col("gh")).as("n"),
          posexplode(col("gh")).as(Seq("pos", "h")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.currentRow, 4)
      grams.withColumn("wmin", min(col("h")).over(w))
        .where(col("n") < 5 || col("pos") <= col("n") - 5)
        .select(col("doc_id"), col("doc_hash"),
          when(col("n") < 5, col("h")).otherwise(col("wmin")).as("fp"))
        .distinct()
    }
    time("q33 window form 1")(current().count())
    time("q33 window form 2")(current().count())

    // candidate: per-row array-HOF winnowing, gh staged as attribute
    def hof() = {
      val staged = docs
        .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), rollingHash(col("text")).as("doc_hash"),
          graft.functions.HashExpressions.shingleHash32(col("toks"), 4).as("gh"))
        .select(col("doc_id"), col("doc_hash"), col("gh"), size(col("gh")).as("n"))
      staged.select(col("doc_id"), col("doc_hash"),
        explode(array_distinct(
          when(col("n") < 5, col("gh"))
            .otherwise(transform(sequence(lit(0), col("n") - 5),
              j => array_min(slice(col("gh"), j + 1, lit(5))))))).as("fp"))
    }
    time("q33 hof form 1")(hof().count())
    time("q33 hof form 2")(hof().count())
    spark.stop()
  }
}
