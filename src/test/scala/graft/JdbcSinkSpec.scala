package graft

import java.sql.Timestamp
import java.time.Instant
import java.util.Properties

import graft.jobs.{SyncJob, SyncOptions}
import graft.sources.{DeviceDim, SignalSink, StatusSource}
import org.apache.spark.sql.functions._

/** Executes the production JDBC insert path ([[SignalSink.appendJdbc]],
  * the reference's ClickHouse batch insert, `clickhouse.go:113-130`)
  * against a real embedded database: Derby in-memory, whose driver ships
  * in Spark's own jar directory — no new dependency. The parquet backend
  * is covered by [[EndToEndSyncSpec]]; this covers the `.write.jdbc`
  * code path end-to-end: table auto-creation, executor-side batched
  * appends, append-mode accumulation, and value-level read-back parity.
  */
class JdbcSinkSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private val firstTime = Instant.parse("2020-01-01T00:00:00Z")
  private def tAt(ms: Long) = new Timestamp(firstTime.toEpochMilli + ms)

  test("appendJdbc round-trips the 72,144-row reference corpus through embedded Derby") {
    val corpus = BenchCorpus.write8000DocCorpus()
    val docs = StatusSource.readJson(spark, corpus, multiLine = false)
    val dim = DeviceDim.identityDim(spark, 1L to 8L)
    val out = SyncJob.run(
      docs, dim, existingSink = None,
      SyncOptions(tokens = (1 to 8).map(_.toString), start = Some(tAt(500)))
    ).cache()
    assert(out.count() === 72144L)

    val props = new Properties()
    SignalSink.appendJdbc(out, url, "signal", batchSize = 5000, properties = props)
    // batchsize reaches the writer's connection properties (the per-batch
    // prepared-insert contract of the reference's native batches)
    assert(props.getProperty("batchsize") === "5000")

    val back = spark.read.jdbc(url, "signal", new Properties())
    assert(back.count() === 72144L)
    assert(back.columns.toSeq === SignalSink.Columns)

    // Value-level parity: per-(tokenId, name) counts and the numeric sum
    // survive the round trip exactly (DECIMAL sum — order-independent).
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("tokenId"), col("name"))
        .agg(count(lit(1)).as("n"),
          sum(col("valueNumber").cast(org.apache.spark.sql.types.DecimalType(30, 10))).as("sv"))
        .orderBy(col("tokenId"), col("name"))
        .collect().toSeq
    assert(sig(back) === sig(out.select(SignalSink.Columns.head, SignalSink.Columns.tail: _*)))

    // SaveMode.Append against an existing table appends, never truncates.
    SignalSink.appendJdbc(out.limit(100), url, "signal", batchSize = 32)
    assert(spark.read.jdbc(url, "signal", new Properties()).count() === 72244L)
    out.unpersist()
  }
}
