package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.queries.ChSignalStub
import graft.sources.{ClickHouseDdl, ClickHouseHttpClient, LiveWire, SignalLiveSource, SignalLiveStreamingWriterFactory}

/** The CH live STREAMING WRITE (`df.writeStream.format
  * ("graft-signal-live")`) — the continuous form of the reference's sync
  * sink (its loop inserts into CH forever, sync.go:92-125): micro-batch
  * tasks POST CSV batches under tokens namespaced by (query, EPOCH,
  * partition, ordinal, content hash). Pins:
  *
  *   - end-to-end: a MemoryStream drains through the streaming writer
  *     into the grammar-strict stub, across multiple epochs;
  *   - epoch-level exactly-once WITHOUT a sink commit log: a re-executed
  *     epoch (same epochId — Spark's replay contract) re-sends identical
  *     tokens and the server drops them; a DIFFERENT epoch carrying
  *     byte-identical content still lands (the epoch is part of the
  *     namespace — content dedup must never swallow a genuine new batch
  *     that happens to repeat old values).
  */
class ChLiveStreamWriteSpec extends SparkTestBase {

  private def url(s: com.sun.net.httpserver.HttpServer) =
    s"http://127.0.0.1:${s.getAddress.getPort}"

  test("writeStream drains micro-batches into CH over the wire") {
    val server = ChSignalStub.start()
    try {
      val base = url(server)
      new ClickHouseHttpClient(base)
        .execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val mem = MemoryStream[(Long, Long, String, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-write-ck").toString
      val q = mem.toDF()
        .select(col("_1").as("token_id"),
          expr("timestamp_micros(_2)").as("timestamp"),
          col("_3").as("name"),
          col("_4").as("value_number"),
          lit(null).cast("string").as("value_string"))
        .writeStream.format("graft-signal-live")
        .option("url", base)
        .option("checkpointLocation", ckpt)
        .start()
      try {
        mem.addData((1 to 40).map(i => (i.toLong % 4, 1700000000000000L + i, "speed", i * 1.0)): _*)
        q.processAllAvailable()
        mem.addData((41 to 60).map(i => (i.toLong % 4, 1700000000000000L + i, "speed", i * 1.0)): _*)
        q.processAllAvailable()
      } finally q.stop()
      val client = new ClickHouseHttpClient(base)
      assert(client.query("SELECT count() FROM `signal`").head(0).toLong === 60L)
      val sum = client.query("SELECT sum(`value_number`) FROM `signal`").head(0).toDouble
      assert(sum === (1 to 60).map(_.toDouble).sum)
    } finally server.stop(0)
  }

  test("epoch-scoped tokens: a re-executed epoch dedups; a new epoch with identical content lands") {
    val server = ChSignalStub.start()
    try {
      val base = url(server)
      new ClickHouseHttpClient(base)
        .execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      val factory = new SignalLiveStreamingWriterFactory(base, "signal",
        SignalLiveSource.Schema, "qEpochPin", LiveWire.default)
      def writeEpoch(epochId: Long): Unit = {
        val w = factory.createWriter(partitionId = 0, taskId = 0L, epochId = epochId)
        (1 to 10).foreach { i =>
          w.write(org.apache.spark.sql.catalyst.InternalRow(
            i.toLong, 1700000000000000L + i, UTF8String.fromString("speed"),
            i * 1.0, null))
        }
        w.commit()
      }
      val client = new ClickHouseHttpClient(base)
      writeEpoch(7L)
      assert(client.query("SELECT count() FROM `signal`").head(0).toLong === 10L)
      // Spark re-executes a failed epoch under the SAME id: identical
      // bytes + identical namespace => identical tokens => server dedup
      writeEpoch(7L)
      assert(client.query("SELECT count() FROM `signal`").head(0).toLong === 10L,
        "a replayed epoch must not duplicate")
      // a NEW epoch that happens to carry byte-identical content is a
      // genuine new batch: the epoch in the namespace keeps it landing
      writeEpoch(8L)
      assert(client.query("SELECT count() FROM `signal`").head(0).toLong === 20L,
        "content dedup must never swallow a distinct epoch")
    } finally server.stop(0)
  }
}
