package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import graft.jobs.{SyncJob, SyncOptions}
import graft.sources.{DeviceDim, SignalSink}
import org.apache.spark.sql.functions._

/** Full-pipeline integration: DSv2 pushdown source → SyncJob → partitioned
  * parquet sink → second incremental run resuming from the sink's
  * watermarks. The storage-layout analog of the reference's ES→CH loop,
  * exercising every module together.
  */
class EndToEndSyncSpec extends SparkTestBase {

  private val t0 = Instant.parse("2024-03-01T00:00:00Z")
  private def iso(ms: Long) = Instant.ofEpochMilli(t0.toEpochMilli + ms).toString
  private def tAt(ms: Long) = new Timestamp(t0.toEpochMilli + ms)

  private def doc(subject: String, ms: Long, speed: Double) =
    s"""{"id":"e$ms","subject":"$subject","source":"it","specversion":"1.0","time":"${iso(ms)}","data":{"speed":$speed,"make":"m"}}"""

  test("two-round sync: first full, second resumes below the watermark") {
    val srcDir = Files.createTempDirectory("graft-e2e-src")
    val sinkDir = Files.createTempDirectory("graft-e2e-sink").resolve("signals").toString

    // Round 1 corpus: subjects 1,2 × timestamps 100..500ms step 100.
    Files.writeString(
      srcDir.resolve("part-0.ndjson"),
      (for (s <- Seq("1", "2"); ms <- 100L to 500L by 100L) yield doc(s, ms, ms.toDouble)).mkString("\n")
    )
    val docs = spark.read.format("graft-status").load(srcDir.toString)
      .select(col("subject"), col("source"), col("time"), col("data"))
    val dim = DeviceDim.identityDim(spark, 1L to 2L)

    val round1 = SyncJob.run(
      docs, dim, existingSink = None,
      SyncOptions(tokens = Seq("1", "2"), start = Some(tAt(0)), stop = Some(tAt(1000)))
    )
    SignalSink.appendParquet(round1, sinkDir, buckets = 4)
    val sink1 = SignalSink.readParquet(spark, sinkDir)
    assert(sink1.count() === 2L * 5 * 2) // 2 subjects × 5 ts × 2 signals

    // Round 2: older documents (backfill window) appear; resume must fetch
    // ONLY rows strictly below each token's oldest-synced timestamp.
    Files.writeString(
      srcDir.resolve("part-1.ndjson"),
      (for (s <- Seq("1", "2"); ms <- 0L until 100L by 50L) yield doc(s, ms, ms.toDouble)).mkString("\n")
    )
    val docs2 = spark.read.format("graft-status").load(srcDir.toString)
      .select(col("subject"), col("source"), col("time"), col("data"))
    val round2 = SyncJob.run(
      docs2, dim, existingSink = Some(sink1),
      SyncOptions(tokens = Seq("1", "2"), start = Some(tAt(0)), stop = Some(tAt(1000)))
    )
    // Watermark = 100ms per token ⇒ only the 0ms and 50ms docs qualify.
    assert(round2.count() === 2L * 2 * 2)
    assert(round2.agg(max(col("timestamp"))).head().getTimestamp(0) === tAt(50))

    SignalSink.appendParquet(round2, sinkDir, buckets = 4)
    val finalSink = SignalSink.readParquet(spark, sinkDir)
    assert(finalSink.count() === 28)
    // Partition layout: token buckets and day directories exist.
    val dirs = new java.io.File(sinkDir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("token_bucket=")))
    // Idempotence-ish: a third run against the final sink syncs nothing.
    val round3 = SyncJob.run(
      docs2, dim, existingSink = Some(finalSink),
      SyncOptions(tokens = Seq("1", "2"), start = Some(tAt(0)), stop = Some(tAt(1000)))
    )
    assert(round3.count() === 0)

    // The layout's reason to exist: a (token_bucket, day) filter PRUNES
    // partitions at the scan — the plan carries PartitionFilters and the
    // filtered read touches fewer files than the full read.
    val pruned = spark.read.parquet(sinkDir).where(col("token_bucket") === 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("token_bucket"), plan)
    assert(pruned.select(input_file_name()).distinct().count() <
      spark.read.parquet(sinkDir).select(input_file_name()).distinct().count())
  }
}
