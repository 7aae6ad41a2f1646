package graft

import java.nio.file.Files

import graft.jobs.CompactionJob
import org.apache.spark.sql.functions._

/** Compaction rewrites many small files into few sized ones, byte-for-byte
  * content-preserving, atomically published, optionally keeping the table
  * range-clustered through the rewrite.
  */
class CompactionJobSpec extends SparkTestBase {
  import spark.implicits._

  test("compacts 64 small files, preserves content, publishes atomically") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(10000L).select(col("id"), (col("id") % 97).as("v"))
      .repartition(64).write.parquet(dir)
    assert(CompactionJob.fileCount(spark, dir) === 64)

    val bytes = CompactionJob.dirBytes(spark, dir)
    val written = CompactionJob.compact(spark, dir, targetBytes = bytes / 4)
    assert(written >= 4 && written <= 6, s"expected ~4-5 files, planned $written")
    assert(CompactionJob.fileCount(spark, dir) === written)
    assert(!new java.io.File(dir + ".compact-tmp").exists)
    assert(!new java.io.File(dir + ".compact-old").exists)

    val back = spark.read.parquet(dir)
    assert(back.count() === 10000L)
    assert(back.agg(sum(col("id")), sum(col("v"))).as[(Long, Long)].head() ===
      ((10000L * 9999L / 2, (0L until 10000L).map(_ % 97).sum)))
  }

  test("sortCol keeps the table range-clustered: per-file id ranges are disjoint") {
    val dir = Files.createTempDirectory("graft-compact2").toString + "/t"
    spark.range(10000L).toDF("id").repartition(32).write.parquet(dir)
    val bytes = CompactionJob.dirBytes(spark, dir)
    CompactionJob.compact(spark, dir, targetBytes = bytes / 4, sortCol = Some("id"))
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name()).agg(min(col("id")).as("lo"), max(col("id")).as("hi"))
      .as[(String, Long, Long)].collect().map(r => (r._2, r._3)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, "file ranges overlap")
      case _ =>
    }
  }
}
