package graft

import java.nio.file.Files

import graft.jobs.DedupIndexJob
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted write-index → dedup-batch → merge-index → dedup-next-batch
  * round trips over parquet — the production surface of incremental dedup
  * (q90 proves the in-plan query; this proves the job lifecycle). Every
  * step is oracle-checked against the from-scratch batch computation.
  */
class DedupIndexJobSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.load(spark, sf, "documents")

  // three disjoint arrival waves over the real corpus
  private lazy val waveA = docs.where(pmod(col("doc_id"), lit(3)) === 0)
  private lazy val waveB = docs.where(pmod(col("doc_id"), lit(3)) === 1)
  private lazy val waveC = docs.where(pmod(col("doc_id"), lit(3)) === 2)

  /** Batch oracle: full-corpus minhash pairs restricted to those touching
    * the new wave — exactly what the incremental path must produce.
    */
  private def oraclePairs(corpus: DataFrame, newWave: DataFrame): Set[(Long, Long)] = {
    val newIds = newWave.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    Dedup.minhashDedup(corpus, "doc_id", "text", k = 3, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => newIds.contains(p._1) || newIds.contains(p._2))
      .toSet
  }

  private def pairsOf(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("index round trip: build A, dedup B, merge, dedup C — all oracle-checked") {
    val root = Files.createTempDirectory("graft-dedup-index")
    val p0 = root.resolve("idx0").toString
    val p1 = root.resolve("idx1").toString

    // ── wave A: build + persist
    DedupIndexJob.writeIndex(waveA, "doc_id", "text", k = 3, path = p0)
    val (bands0, sets0) = DedupIndexJob.readIndex(spark, p0, "doc_id")
    assert(sets0.count() === waveA.count()) // every doc signed once
    assert(bands0.count() === sets0.count() * Dedup.LshBands)

    // ── wave B deduped against the persisted A index
    val pairsB = DedupIndexJob.dedupBatch(waveB, p0, "doc_id", "text", k = 3, threshold = 0.5)
    assert(pairsOf(pairsB) === oraclePairs(waveA.union(waveB), waveB))

    // ── merge B into a fresh snapshot; index now covers A ∪ B
    DedupIndexJob.mergeIndex(waveB, p0, p1, "doc_id", "text", k = 3)
    val (bands1, sets1) = DedupIndexJob.readIndex(spark, p1, "doc_id")
    assert(sets1.count() === waveA.count() + waveB.count())
    assert(bands1.count() === sets1.count() * Dedup.LshBands)

    // ── wave C deduped against the merged index
    val pairsC = DedupIndexJob.dedupBatch(waveC, p1, "doc_id", "text", k = 3, threshold = 0.5)
    assert(pairsOf(pairsC) === oraclePairs(docs, waveC))
  }

  test("id reuse resolves new-wins through the persisted index") {
    val root = Files.createTempDirectory("graft-dedup-reuse")
    val p0 = root.resolve("idx0").toString
    DedupIndexJob.writeIndex(waveA, "doc_id", "text", k = 3, path = p0)

    // one waveA id arrives again with completely different text
    val reusedId = waveA.select(min(col("doc_id"))).collect()(0).getLong(0)
    val resynced = spark.createDataFrame(Seq(
      (reusedId, "entirely new resynced body of text with nine tokens")
    )).toDF("doc_id", "text")

    val merged = root.resolve("idx1").toString
    DedupIndexJob.mergeIndex(resynced, p0, merged, "doc_id", "text", k = 3)
    val (_, sets1) = DedupIndexJob.readIndex(spark, merged, "doc_id")
    // exactly ONE sets row for the reused id, and it reflects the NEW text
    val rows = sets1.where(col("doc_id") === reusedId).collect()
    assert(rows.length === 1)
    val expectedShingles = Dedup.shingleSets(resynced, "doc_id", "text", 3)
      .select(size(col("sh"))).collect()(0).getInt(0)
    assert(rows(0).getAs[Seq[Long]]("sh").size === expectedShingles)
  }
}
