package graft.tools

import graft.functions.TextFunctions._
import graft.operators.Dedup
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
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingle sets")(sets.agg(sum(size(col("sh")))).count())
    val setsC = sets.cache()
    setsC.count()
    val sigs = setsC.select(col("doc_id"), Dedup.minhashSignature(col("sh")).as("sig"))
    time("minhash sigs")(sigs.agg(sum(element_at(col("sig"), 1))).count())
    val cands = Dedup.lshCandidatePairs(sigs, "doc_id")
    time("lsh candidates")(cands.count())
    time("jaccard verify")(Dedup.jaccardVerify(cands, setsC, "doc_id", 0.5).count())
    time("full minhash q42")(Dedup.minhashDedup(docs, "doc_id", "text", 3, 0.5).count())
    time("full simhash q43")(Dedup.simhashDedup(docs, "doc_id", "text", 8).count())
    time("full ngram q41")(Dedup.ngramJaccardJoin(docs, "doc_id", "text", 3, 1, 2).count())
    spark.stop()
  }
}
