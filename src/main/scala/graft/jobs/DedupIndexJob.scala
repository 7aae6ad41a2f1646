package graft.jobs

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The incremental-dedup INDEX as a persisted job surface — the production
  * round trip q90 only proves in-plan: write-index(corpus) →
  * dedup-batch(new) → merge-index → dedup-next-batch, with every index
  * snapshot a plain parquet directory. This is the streaming-sync shape of
  * the reference (resume from persisted state, `internal/sync/sync.go:
  * 128-137`) applied to dedup state: the existing corpus is NEVER
  * re-tokenized, re-hashed, or re-signed when a batch arrives — the 100 TB
  * contract of [[Dedup.minhashDedupIncremental]].
  *
  * Index layout: `<path>/bands` (id, band, key) — the LSH probe table,
  * written bucketed-by-key-friendly (partitioned by `band`: 4 uniform
  * partitions whose files a band-key join prunes) — and `<path>/sets`
  * (id, sh) — the shingle sets the verify stage reads by narrow id join.
  * Snapshots are immutable: merge writes a NEW path, so a failed merge
  * never corrupts the index a concurrent dedup is probing (the same
  * append-only discipline as [[graft.sources.SignalSink.appendParquet]]).
  */
object DedupIndexJob {

  /** Build and persist the index for a corpus snapshot. */
  def writeIndex(docs: DataFrame, idCol: String, textCol: String, k: Int, path: String): Unit = {
    val (bands, sets) = Dedup.minhashIndexTables(docs, idCol, textCol, k)
    bands.write.mode(SaveMode.Overwrite).partitionBy("band").parquet(s"$path/bands")
    sets.write.mode(SaveMode.Overwrite).parquet(s"$path/sets")
  }

  /** Read an index snapshot back: (bands, sets). */
  def readIndex(spark: SparkSession, path: String, idCol: String): (DataFrame, DataFrame) = (
    spark.read.parquet(s"$path/bands").select(col(idCol), col("band"), col("key")),
    spark.read.parquet(s"$path/sets").select(col(idCol), col("sh"))
  )

  /** Near-dup pairs of `newDocs` against the persisted index (plus
    * themselves): new×new and new×old, never old×old. Id reuse resolves
    * new-wins ([[Dedup.minhashDedupIncremental]]).
    */
  def dedupBatch(
      newDocs: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double
  ): DataFrame = {
    val (oldBands, oldSets) = readIndex(newDocs.sparkSession, indexPath, idCol)
    Dedup.minhashDedupIncremental(newDocs, oldBands, oldSets, idCol, textCol, k, threshold)
  }

  /** Fold `newDocs` into the index: old rows for replaced ids dropped
    * (new-wins), new batch signed ONCE, union written as a fresh immutable
    * snapshot at `mergedPath`. Only the new batch is tokenized/hashed —
    * the old index is moved bytes-for-bytes minus the anti-join.
    */
  def mergeIndex(
      newDocs: DataFrame,
      indexPath: String,
      mergedPath: String,
      idCol: String,
      textCol: String,
      k: Int
  ): Unit = {
    val (oldBands, oldSets) = readIndex(newDocs.sparkSession, indexPath, idCol)
    val (newBands, newSets) = Dedup.minhashIndexTables(newDocs, idCol, textCol, k)
    val newIds = newSets.select(col(idCol))
    oldBands.join(newIds, Seq(idCol), "left_anti").union(newBands)
      .write.mode(SaveMode.Overwrite).partitionBy("band").parquet(s"$mergedPath/bands")
    oldSets.join(newIds, Seq(idCol), "left_anti").union(newSets)
      .write.mode(SaveMode.Overwrite).parquet(s"$mergedPath/sets")
  }
}
