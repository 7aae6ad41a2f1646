package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scaling probe: replicate the sf0.1 documents corpus N× (doc_ids
  * shifted so replicas are distinct docs with IDENTICAL text — the
  * worst-case dup density) and time the dedup family. Evidence for the
  * "would this hold at 100×?" question: candidate counts and wall-clock
  * should grow near-linearly for the prefix/banded algorithms.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val n0 = base.count()
    val big = (0 until mult).map { i =>
      base.select((col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"), col("text"))
    }.reduce(_ union _).cache()
    println(s"[scale] corpus ${n0} -> ${big.count()} docs (x$mult, every doc has $mult exact clones)")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scale] $name%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    time("exact_dedup") { graft.operators.Dedup.exactDuplicates(big, "doc_id", "text").count() }
    time("minhash_lsh") { graft.operators.Dedup.minhashDedup(big, "doc_id", "text", 3, 0.5).count() }
    time("ppjoin_jaccard") { graft.operators.Dedup.ngramJaccardJoin(big, "doc_id", "text", 3, 1, 2).count() }
    time("cascade_jaccard") { graft.operators.Dedup.cascadeJaccard(big, "doc_id", "text", 3, 1, 2).count() }
    time("simhash") { graft.operators.Dedup.simhashDedup(big, "doc_id", "text", 8).count() }
    time("containment") { graft.operators.Dedup.containmentJoin(big, "doc_id", "text", 3, 0.9).count() }
    time("containment_cascade") {
      // the q65 composition applied to containment: representatives only
      val reps = graft.operators.Dedup.exactDuplicates(big, "doc_id", "text")
        .select(org.apache.spark.sql.functions.col("keep_id").as("doc_id"))
        .join(big, "doc_id")
      graft.operators.Dedup.containmentJoin(reps, "doc_id", "text", 3, 0.9).count()
    }
    spark.stop()
  }
}
