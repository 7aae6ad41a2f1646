package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}

/** The LIVE ClickHouse write/read path over CH's HTTP interface
  * ([[ClickHouseHttpClient]]) against a loopback stub: DDL execution,
  * reference-parity statements (QueryOldestSignal / QueryTokenIDs,
  * clickhouse.go:65-110), distributed per-partition CSV batch inserts
  * (InsertIntoClickhouse, clickhouse.go:113-130), and TSV query decode.
  */
class ClickHouseHttpSpec extends SparkTestBase {

  /** Captures (query-param, body) of every POST; answers queries from a
    * canned TSV map.
    */
  private def startStub(captured: ConcurrentLinkedQueue[(String, String)],
      answers: Map[String, String] = Map.empty): HttpServer = {
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getRawQuery).map { raw =>
          raw.split("&").collectFirst {
            case kv if kv.startsWith("query=") =>
              java.net.URLDecoder.decode(kv.substring(6), "UTF-8")
          }.getOrElse("")
        }.getOrElse("")
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        captured.add((q, body))
        val res = answers.collectFirst {
          case (prefix, tsv) if q.startsWith(prefix) || body.startsWith(prefix) => tsv
        }.getOrElse("")
        val bytes = res.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def url(s: HttpServer) = s"http://127.0.0.1:${s.getAddress.getPort}"

  test("live clients carry the TLS >= 1.2 floor for https endpoints (the reference's MinVersion)") {
    // construction-level pin: the shared HttpClient factory restricts the
    // negotiable protocols to TLS 1.3/1.2 — nothing older can be selected
    // when a URL upgrades to TLS (clickhouse.go:41-47 [ext] parity); plain
    // http loopbacks are unaffected (SSL parameters only apply under TLS)
    val protos = graft.sources.LiveHttp.newClient(1000).sslParameters().getProtocols.toSet
    assert(protos === Set("TLSv1.3", "TLSv1.2"))
    assert(!protos.exists(p => p == "TLSv1" || p == "TLSv1.1" || p.startsWith("SSL")))
  }

  test("reference statements: oldest-signal and token-ids SQL round-trip over HTTP") {
    // the exact statements the reference's sqlboiler dialect builds
    assert(ClickHouseHttpClient.oldestSignalSql(42L, Seq.empty) ===
      "SELECT `timestamp` FROM `signal` WHERE `token_id` = 42 ORDER BY `timestamp` ASC LIMIT 1")
    assert(ClickHouseHttpClient.oldestSignalSql(7L, Seq("speed", "soc")) ===
      "SELECT `timestamp` FROM `signal` WHERE `token_id` = 7 AND `name` IN ('speed','soc') " +
        "ORDER BY `timestamp` ASC LIMIT 1")
    assert(ClickHouseHttpClient.tokenIdsSql() === "SELECT DISTINCT `token_id` FROM `signal`")

    val captured = new ConcurrentLinkedQueue[(String, String)]()
    val server = startStub(captured, Map(
      "SELECT DISTINCT `token_id`" -> "3\n1\n2\n"))
    try {
      val c = new graft.sources.ClickHouseHttpClient(url(server))
      val ids = c.query(ClickHouseHttpClient.tokenIdsSql()).map(_(0).toLong)
      assert(ids === Seq(3L, 1L, 2L), "TSV rows decode in server order")
      import scala.jdk.CollectionConverters._
      assert(captured.asScala.exists(_._2.startsWith("SELECT DISTINCT `token_id` FROM `signal` FORMAT TabSeparated")))
    } finally server.stop(0)
  }

  test("MergeTree DDL executes over the wire") {
    val captured = new ConcurrentLinkedQueue[(String, String)]()
    val server = startStub(captured)
    try {
      val schema = StructType(Seq(
        StructField("token_id", LongType, nullable = false),
        StructField("timestamp", TimestampType, nullable = false),
        StructField("name", StringType, nullable = false),
        StructField("value_number", DoubleType, nullable = true)))
      val ddl = ClickHouseDdl.signalTableDdl(schema)
      new graft.sources.ClickHouseHttpClient(url(server)).execute(ddl)
      import scala.jdk.CollectionConverters._
      val sent = captured.asScala.map(_._2).mkString
      assert(sent.contains("CREATE TABLE") && sent.contains("MergeTree"),
        s"the DDL must travel as the POST body: $sent")
    } finally server.stop(0)
  }

  test("distributed batch insert: every partition posts its own CSV batch; union = the DataFrame") {
    val captured = new ConcurrentLinkedQueue[(String, String)]()
    val server = startStub(captured)
    try {
      val schema = StructType(Seq(
        StructField("token_id", LongType, nullable = false),
        StructField("name", StringType, nullable = true),
        StructField("value_number", DoubleType, nullable = true)))
      val rows = (0 until 100).map(i =>
        Row(i.toLong, if (i % 10 == 0) null else s"sig,\"$i\"", if (i % 7 == 0) null else i * 0.5))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      new graft.sources.ClickHouseHttpClient(url(server)).insertSignals(df, "signal")

      import scala.jdk.CollectionConverters._
      val inserts = captured.asScala.toSeq
      assert(inserts.size === 4, s"one CSV POST per non-empty partition, got ${inserts.size}")
      inserts.foreach { case (q, _) =>
        assert(q === "INSERT INTO `signal` (`token_id`, `name`, `value_number`) FORMAT CSV")
      }
      // decode the union back (quote-doubled strings, empty = NULL)
      val got = inserts.flatMap(_._2.split("\n")).filter(_.nonEmpty).map { line =>
        // token,(quoted name|empty),(double|empty) — split CSV respecting quotes
        val m = java.util.regex.Pattern
          .compile("^(\\d+),(\"((?:[^\"]|\"\")*)\"|),(.*)$").matcher(line)
        assert(m.matches(), s"unparsable CSV line: $line")
        val name = Option(m.group(3)).map(_.replace("\"\"", "\""))
        val v = if (m.group(4).isEmpty) None else Some(m.group(4).toDouble)
        (m.group(1).toLong, name, v)
      }.toSet
      val want = rows.map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got === want, "the CSV batches must reproduce the DataFrame exactly")
    } finally server.stop(0)
  }

  test("queryStream consumes rows INCREMENTALLY off the socket (first row arrives before the last byte is sent)") {
    // the ofLines posture: if the client buffered the whole body
    // (ofString), the first row could not be observed until the server
    // released the held tail — this test would time out instead of pass
    val gate = new java.util.concurrent.CountDownLatch(1)
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        ex.sendResponseHeaders(200, 0) // chunked — total length unknown up front
        val os = ex.getResponseBody
        os.write("1\tearly\n".getBytes(StandardCharsets.UTF_8)); os.flush()
        gate.await(30, java.util.concurrent.TimeUnit.SECONDS)
        os.write("2\tlate\n".getBytes(StandardCharsets.UTF_8))
        ex.close()
      }
    })
    server.start()
    try {
      import scala.concurrent._
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val c = new graft.sources.ClickHouseHttpClient(url(server), timeoutMs = 60000)
      val it = Await.result(Future(c.queryStream("SELECT `token_id` FROM `signal`")), 15.seconds)
      val first = Await.result(Future(it.next()), 15.seconds)
      assert(first.toSeq === Seq("1", "early"),
        "row 1 must be consumable while the server still holds the tail")
      gate.countDown()
      assert(it.next().toSeq === Seq("2", "late"))
      assert(!it.hasNext)
    } finally { gate.countDown(); server.stop(0) }
  }

  test("HTTP-status failures raise typed (no message sniffing) and are never transport-retried") {
    val hitCount = new java.util.concurrent.atomic.AtomicInteger()
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        hitCount.incrementAndGet()
        ex.getRequestBody.readAllBytes()
        val err = "Code: 60. DB::Exception: Table default.signal does not exist"
        val bytes = err.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(404, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val c = new graft.sources.ClickHouseHttpClient(url(server))
      val e = intercept[graft.sources.ChHttpStatusException](c.query("SELECT 1"))
      assert(e.statusCode === 404 && e.getMessage.contains("does not exist"))
      assert(hitCount.get() === 1, "a semantic failure must not burn transport retries")
      val es = intercept[graft.sources.ChHttpStatusException](c.queryStream("SELECT 1"))
      assert(es.statusCode === 404, "the streaming path shares the typed-status contract")
    } finally server.stop(0)
  }

  test("transport failures (connection reset — IOExceptions whose message may be null) retry and recover") {
    // a raw socket that hard-closes the first 2 connections (the classic
    // null-message IOException producer), then speaks just enough HTTP —
    // the old `getMessage.startsWith` guard NPE'd here instead of retrying
    val failures = new java.util.concurrent.atomic.AtomicInteger(2)
    val ss = new java.net.ServerSocket(0, 16, java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() => {
      try {
        while (!ss.isClosed) {
          val s = ss.accept()
          if (failures.getAndDecrement() > 0) s.close() // reset mid-handshake
          else {
            val in = s.getInputStream
            val buf = new Array[Byte](8192)
            var seen = new StringBuilder
            var done = false
            while (!done && in.read(buf) != -1) {
              seen ++= new String(buf).takeWhile(_ != 0)
              // naive: one read usually carries the whole small request
              done = seen.toString().contains("FORMAT TabSeparated")
            }
            val body = "7\n"
            s.getOutputStream.write(
              (s"HTTP/1.1 200 OK\r\nContent-Length: ${body.length}\r\nConnection: close\r\n\r\n$body")
                .getBytes(StandardCharsets.UTF_8))
            s.getOutputStream.flush()
            s.close()
          }
        }
      } catch { case _: Throwable => () }
    }, "ch-reset-stub")
    t.setDaemon(true); t.start()
    try {
      val c = new graft.sources.ClickHouseHttpClient(s"http://127.0.0.1:${ss.getLocalPort}")
      val rows = c.query("SELECT count() FROM `signal`")
      assert(rows.map(_.toSeq) === Seq(Seq("7")),
        "the idempotent SELECT must survive two connection resets via retry")
      assert(failures.get() <= 0, "the resets must actually have been consumed")
    } finally ss.close()
  }

  test("a 429 with Retry-After floors the retry delay (server-named backoff, 15s clamp)") {
    // first request: 429 + `Retry-After: 1`; second: the answer. The pin
    // is the ORDERING the header imposes — the retry must not arrive
    // before the named delay elapses (blind exponential backoff would
    // re-send after ~50 ms), mirroring the ES client's contract.
    val arrivals = new ConcurrentLinkedQueue[Long]()
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        arrivals.add(System.nanoTime())
        ex.getRequestBody.readAllBytes()
        if (arrivals.size() == 1) {
          ex.getResponseHeaders.set("Retry-After", "1")
          val err = "Code: 202. DB::Exception: Too many simultaneous queries"
            .getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(429, err.length)
          ex.getResponseBody.write(err)
        } else {
          val body = "42\n".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, body.length)
          ex.getResponseBody.write(body)
        }
        ex.close()
      }
    })
    server.start()
    try {
      val c = new graft.sources.ClickHouseHttpClient(url(server))
      val rows = c.query("SELECT count() FROM `signal`")
      assert(rows.map(_.toSeq) === Seq(Seq("42")))
      import scala.jdk.CollectionConverters._
      val ts = arrivals.asScala.toSeq
      assert(ts.size === 2, "one throttle, one retry")
      assert(ts(1) - ts(0) >= 1000L * 1000000L,
        "the retry arrived before the server-named Retry-After elapsed")
    } finally server.stop(0)
  }

  test("timestamps ship as zone-independent epoch decimals (micros), never local-time strings") {
    val captured = new ConcurrentLinkedQueue[(String, String)]()
    val server = startStub(captured)
    try {
      val schema = StructType(Seq(
        StructField("token_id", LongType, nullable = false),
        StructField("timestamp", TimestampType, nullable = true)))
      val t = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00.123456Z"))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(1L, t), Row(2L, null)), 1), schema)
      new graft.sources.ClickHouseHttpClient(url(server)).insertSignals(df, "signal")
      import scala.jdk.CollectionConverters._
      val body = captured.asScala.map(_._2).mkString
      assert(body.contains("1,1704067200.123456"),
        s"epoch-decimal encoding expected (executor-TZ independent), got: $body")
      assert(body.contains("2,"), "null timestamp = empty CSV field")
      assert(!body.contains("2024-"), "no local-time string form may leak onto the wire")
    } finally server.stop(0)
  }
}
