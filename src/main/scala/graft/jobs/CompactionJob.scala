package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest (like the reference's per-page sink appends, or our streaming
  * `foreachBatch` parquet sink) eventually needs: thousands of KB-sized
  * files per partition turn a 100 TB scan into a metadata/open() storm.
  *
  * Sizing is driven by the FILE SYSTEM's own byte counts (one driver-side
  * listing — metadata, not data): target file count = ceil(bytes /
  * targetBytes). The rewrite is ONE round-robin `repartition` (a shuffle,
  * but of exactly the data being rewritten — there is no cheaper way to
  * rebalance row distribution), or `repartitionByRange` on a sort column
  * when the table should ALSO stay clustered (composes with
  * [[ZOrderLayout]]: pass its z-value column). Output lands in a fresh
  * directory and is atomically published by a rename, so readers never
  * see a half-compacted table — the same immutable-snapshot discipline as
  * `DedupIndexJob`.
  */
object CompactionJob {

  /** Bytes under `dir` (recursive), from the file system's listing. */
  def dirBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.getContentSummary(p).getLength
  }

  /** Parquet file count under `dir` (recursive). */
  def fileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }

  /** Compact `dir` in place to ~`targetBytes` per file. Returns the file
    * count written. `sortCol` keeps the table range-clustered on that
    * column through the rewrite (None = plain round-robin rebalance).
    */
  def compact(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      sortCol: Option[String] = None
  ): Int = {
    val bytes = dirBytes(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(dir)
    val repart = sortCol match {
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(c)
      case None    => df.repartition(nFiles)
    }
    val tmp = dir + ".compact-tmp"
    repart.write.mode("overwrite").parquet(tmp)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new Path(dir + ".compact-old")
    fs.delete(old, true)
    fs.rename(p, old)
    fs.rename(new Path(tmp), p)
    fs.delete(old, true)
    nFiles
  }
}
