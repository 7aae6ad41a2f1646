package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Continuous tail of the LIVE ClickHouse signal table:
  * `readStream.format("graft-signal-live")` — offsets are the server's
  * own `count(), max(timestamp)` aggregate (no client clock), batches are
  * half-open event-time windows through the batch scan's token-range
  * planning and streamed row readers, offsets survive restarts
  * exactly-once, and pushed filters apply to the tail.
  */
class ChLiveStreamSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("token_id", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("value_number", DoubleType, nullable = true),
    StructField("value_string", StringType, nullable = true)))

  private def ts(us: Long) = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  private val Base = 1704000000000000L

  private def rows(from: Int, until: Int): Seq[Row] =
    (from until until).map(i => Row((i % 5).toLong, ts(Base + i * 1000000L),
      if (i % 2 == 0) "speed" else "soc", i.toDouble, s"v$i"))

  test("the live CH tail reads forward in event time, exactly once, across restarts") {
    val server = graft.queries.ChSignalStub.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new graft.sources.ClickHouseHttpClient(url)
      client.execute(graft.sources.ClickHouseDdl.signalTableDdl(schema))
      def insert(rs: Seq[Row]): Unit = client.insertSignals(
        spark.createDataFrame(spark.sparkContext.parallelize(rs, 2), schema), "signal")
      insert(rows(0, 20)) // the seed corpus

      val outDir = java.nio.file.Files.createTempDirectory("graft-ch-tail").toString + "/out"
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ch-tail-ck").toString
      def start() = spark.readStream.format("graft-signal-live")
        .option("url", url).option("partitions", "4").load()
        .select(col("token_id"), expr("unix_micros(timestamp)").as("us"),
          col("name"), col("value_number"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt).start()

      val q1 = start()
      try {
        q1.processAllAvailable()
        assert(spark.read.parquet(outDir).count() === 20, "batch 1 = the seed corpus")
        // newer rows arrive: the next trigger reads ONLY them
        insert(rows(20, 31))
        q1.processAllAvailable()
        assert(spark.read.parquet(outDir).count() === 31)
      } finally q1.stop()

      // restart from the checkpoint: only post-offset rows arrive
      insert(rows(31, 37))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
      val got = spark.read.parquet(outDir)
      assert(got.count() === 37, "the restarted tail resumes at the committed offset")
      val keys = got.select("us", "name").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(keys.length === keys.distinct.length, "exactly once across the restart")
      assert(got.agg(sum("value_number")).head().getDouble(0) === (0 until 37).sum.toDouble)
    } finally server.stop(0)
  }

  test("pushed filters scope the tail; raw-rows-only guard rejects pushed aggregates") {
    val server = graft.queries.ChSignalStub.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val client = new graft.sources.ClickHouseHttpClient(url)
      client.execute(graft.sources.ClickHouseDdl.signalTableDdl(schema))
      client.insertSignals(
        spark.createDataFrame(spark.sparkContext.parallelize(rows(0, 24), 2), schema), "signal")
      val q = spark.readStream.format("graft-signal-live")
        .option("url", url).load()
        .where(col("name") === "speed" && col("token_id") < 3L)
        .select("token_id", "name")
        .writeStream.format("memory").queryName("ch_tail_filtered")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-ch-tail-f").toString)
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("ch_tail_filtered").collect()
        assert(got.nonEmpty && got.forall(r => r.getString(1) == "speed" && r.getLong(0) < 3L))
      } finally q.stop()
      // offsets round-trip their JSON
      import graft.sources.SignalLiveOffset
      val o = SignalLiveOffset(1704000012345678L)
      assert(SignalLiveOffset.fromJson(o.json()) === o)
    } finally server.stop(0)
  }
}
