package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.queries.{ChSignalStub, LiveQueries}
import graft.sources.{ClickHouseDdl, ClickHouseHttpClient, EsHttpClient, LiveHttp, LiveWire}

/** Wire compression for the live tier: at 100 TB the insert/scan fan-out's
  * wire bytes are the cluster's egress bill, and CSV/TSV/JSON compress
  * 5-10×. Pins:
  *
  *   - ES responses: every request OFFERS `Accept-Encoding: gzip` and a
  *     gzipped response decodes transparently (a server with
  *     `http.compression` on just works — zero config);
  *   - CH `compression=gzip`: INSERT bodies ship `Content-Encoding: gzip`
  *     (server inflates natively) and responses come back compressed
  *     (`enable_http_compression=1`), including the STREAMED row scans —
  *     which stay incremental through the inflater;
  *   - the dedup token still hashes the UNCOMPRESSED bytes (content
  *     identity, not encoding identity), so a retry under a different
  *     compression setting still dedups;
  *   - identity servers (every other stub in this suite) are untouched —
  *     the Accept-Encoding offer costs nothing when declined.
  */
class LiveGzipSpec extends SparkTestBase {

  private def url(s: HttpServer) = s"http://127.0.0.1:${s.getAddress.getPort}"

  test("ES responses decode transparently when the server gzips (and the offer is always sent)") {
    val sawAcceptGzip = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = LiveQueries.loopbackServer()
    val body =
      """{"hits":{"total":{"value":2,"relation":"eq"},"hits":[
        |{"_id":"a","_source":{"subject":"s","time":"2024-01-01T00:00:00Z"}},
        |{"_id":"b","_source":{"subject":"s","time":"2024-01-01T00:00:01Z"}}]}}"""
        .stripMargin.replace("\n", "")
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        val offers = Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
          .exists(_.toLowerCase.contains("gzip"))
        if (offers) sawAcceptGzip.set(true)
        // a real ES with http.compression: gzip when (and only when) offered
        val bytes =
          if (offers) {
            ex.getResponseHeaders.set("Content-Encoding", "gzip")
            LiveHttp.gzipBytes(body.getBytes(StandardCharsets.UTF_8))
          } else body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val c = new EsHttpClient(url(server))
      val root = c.searchTree("device-status", "{}")
      assert(root.path("hits").path("hits").size() === 2, "gzipped response decoded")
      assert(c.countFor("device-status", Seq.empty) === 2L)
      assert(sawAcceptGzip.get(), "every search offers Accept-Encoding: gzip")
    } finally server.stop(0)
  }

  test("CH compression=gzip: gzip INSERT bodies, compressed responses, streamed scans inflate incrementally") {
    val server = ChSignalStub.start(gzip = true) // REJECTS any identity posture
    try {
      val wire = LiveWire(gzip = true)
      val c = new ClickHouseHttpClient(url(server), wire = wire)
      c.execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
      val csv = (1 to 500).map(i => s"""$i,${1700000000L + i}.000000,"speed",$i.5,""")
        .mkString("", "\n", "\n")
      c.insertCsv("signal", Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        csv.getBytes(StandardCharsets.UTF_8), dedupToken = Some("graft-gz-t1"))
      // materialized query path decodes a gzipped aggregate
      val n = c.query("SELECT count() FROM `signal`").head(0).toLong
      assert(n === 500L)
      // streamed path: 500 rows through the inflater, order-preserving
      val it = c.queryStream("SELECT `token_id` FROM `signal` WHERE `token_id` >= 1")
      try {
        val toks = it.map(_(0).toLong).toVector
        assert(toks.size === 500 && toks.toSet === (1L to 500L).toSet)
      } finally it.close()
      // content-hash dedup is ENCODING-INDEPENDENT: the same bytes re-sent
      // under the same token dedup (500 stays 500)
      c.insertCsv("signal", Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        csv.getBytes(StandardCharsets.UTF_8), dedupToken = Some("graft-gz-t1"))
      assert(c.query("SELECT count() FROM `signal`").head(0).toLong === 500L)
    } finally server.stop(0)
  }

  test("an identity client cannot pass the gzip stub (the enforcement is real)") {
    val server = ChSignalStub.start(gzip = true)
    try {
      val identityWire = LiveWire() // offers Accept-Encoding but no gzip params/bodies
      val c = new ClickHouseHttpClient(url(server), wire = identityWire)
      c.execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
      // SELECT without enable_http_compression=1 is rejected by the stub
      val e = intercept[graft.sources.ChHttpStatusException] {
        c.query("SELECT count() FROM `signal`")
      }
      assert(e.getMessage.contains("enable_http_compression"))
      // identity INSERT body rejected too
      val e2 = intercept[graft.sources.ChHttpStatusException] {
        c.insertCsv("signal", Seq("token_id", "timestamp", "name", "value_number",
          "value_string"), "1,1700000000.0,\"speed\",1.0,\n".getBytes(StandardCharsets.UTF_8))
      }
      assert(e2.getMessage.contains("gzip"))
    } finally server.stop(0)
  }

  test("DSv2 round trip under compression=gzip: write, scan, aggregate — all compressed") {
    val server = ChSignalStub.start(gzip = true)
    try {
      val base = url(server)
      new ClickHouseHttpClient(base, wire = LiveWire(gzip = true))
        .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
      import spark.implicits._
      val df = (1 to 200).map(i =>
        (i.toLong % 5, new java.sql.Timestamp(1700000000000L + i), "speed",
          Some(i.toDouble), None: Option[String]))
        .toDF("token_id", "timestamp", "name", "value_number", "value_string")
        .repartition(4)
      df.write.format("graft-signal-live")
        .option("url", base).option("compression", "gzip")
        .mode("append").save()
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("compression", "gzip").load()
      assert(live.count() === 200L)
      val sums = live.groupBy($"token_id")
        .agg(org.apache.spark.sql.functions.sum($"value_number").as("s"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val expected = (1 to 200).groupBy(_.toLong % 5)
        .map { case (k, vs) => k -> vs.map(_.toDouble).sum }
      assert(sums === expected)
    } finally server.stop(0)
  }

  test("an unknown compression option fails loudly") {
    val e = intercept[IllegalArgumentException] {
      LiveWire.fromOptions(k => if (k == "compression") Some("zstd") else None)
    }
    assert(e.getMessage.contains("zstd"))
  }
}
