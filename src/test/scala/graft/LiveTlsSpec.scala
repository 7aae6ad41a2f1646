package graft

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler}

import graft.queries.{ChSignalStub, TlsStub}
import graft.sources.{ClickHouseDdl, ClickHouseHttpClient, EsHttpClient, LiveHttp, LiveWire}

/** The live tier's TLS trust surface ([[LiveWire]]) against REAL
  * handshakes: a keytool-generated private CA in miniature
  * ([[TlsStub]]), `HttpsServer` on loopback, and the JDK HttpClient's
  * always-on endpoint identification. Pins the four contracts a
  * production ES/CH deployment needs:
  *
  *   1. a private-CA endpoint is REJECTED under default trust (a client
  *      that silently accepted it would be MITM-able);
  *   2. the `tlsTruststore` option completes the handshake and the
  *      protocol floor (TLS ≥ 1.2, the reference's clickhouse.go:41-47
  *      posture) still applies to the custom context;
  *   3. mutual TLS: a server demanding a client certificate rejects a
  *      keystore-less client and accepts the `tlsKeystore`-configured
  *      one;
  *   4. the whole DSv2 write/read path (`graft-signal-live`) runs over
  *      mTLS end-to-end when the options are set — the same grammar
  *      stub, a real handshake under it.
  */
class LiveTlsSpec extends SparkTestBase {

  private lazy val m = TlsStub.shared

  /** A one-route HTTPS stub answering every POST with `body`. */
  private def esLikeServer(needClientAuth: Boolean, body: String)
      : com.sun.net.httpserver.HttpsServer = {
    val server = TlsStub.httpsServer(m, needClientAuth)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def url(s: com.sun.net.httpserver.HttpServer) =
    s"https://127.0.0.1:${s.getAddress.getPort}"

  private val searchBody =
    """{"hits":{"total":{"value":1,"relation":"eq"},"hits":[
      |{"_id":"d1","_source":{"subject":"s1","time":"2024-01-01T00:00:00Z"}}]}}"""
      .stripMargin.replace("\n", "")

  test("a private-CA https endpoint is REJECTED under default trust") {
    val server = esLikeServer(needClientAuth = false, searchBody)
    try {
      val untrusted = new EsHttpClient(url(server), timeoutMs = 5000)
      val e = intercept[java.io.IOException] {
        untrusted.searchTree("device-status", "{}")
      }
      // the failure is the HANDSHAKE, not a status/semantic error
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Seq.empty else t +: causes(t.getCause)
      assert(causes(e).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"expected an SSL failure, got: $e")
    } finally server.stop(0)
  }

  test("tlsTruststore trusts the private CA; the TLS >= 1.2 floor still applies") {
    val server = esLikeServer(needClientAuth = false, searchBody)
    try {
      val wire = TlsStub.clientWire(m, mtls = false)
      val trusted = new EsHttpClient(url(server), timeoutMs = 5000, wire = wire)
      val root = trusted.searchTree("device-status", "{}")
      assert(root.path("hits").path("hits").size() === 1)
      assert(trusted.countFor("device-status", Seq.empty) === 1L)
      // the custom SSLContext does not loosen the protocol allowlist
      val protos = LiveHttp.newClient(1000, wire).sslParameters().getProtocols.toSet
      assert(protos === Set("TLSv1.3", "TLSv1.2"))
    } finally server.stop(0)
  }

  test("mTLS: a keystore-less client is rejected; tlsKeystore completes the handshake") {
    val server = esLikeServer(needClientAuth = true, searchBody)
    try {
      val trustOnly = new EsHttpClient(url(server), timeoutMs = 5000,
        wire = TlsStub.clientWire(m, mtls = false))
      intercept[java.io.IOException] { trustOnly.searchTree("device-status", "{}") }
      val mtls = new EsHttpClient(url(server), timeoutMs = 5000,
        wire = TlsStub.clientWire(m, mtls = true))
      assert(mtls.searchTree("device-status", "{}")
        .path("hits").path("hits").size() === 1)
    } finally server.stop(0)
  }

  test("the full wire posture composes: mTLS + gzip + basic auth in one round") {
    val server = ChSignalStub.start(TlsStub.httpsServer(m, needClientAuth = true),
      gzip = true, auth = Some(("ops", "pw-42")))
    try {
      val base = url(server)
      val wire = TlsStub.clientWire(m, mtls = true)
        .copy(gzip = true, username = Some("ops"), password = Some("pw-42"))
      val client = new ClickHouseHttpClient(base, timeoutMs = 5000, wire = wire)
      client.execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
      client.insertCsv("signal",
        Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        (1 to 50).map(i => s"""$i,${1700000000L + i}.000000,"speed",$i.0,""")
          .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
        dedupToken = Some("graft-compose-1"))
      assert(client.query("SELECT count() FROM `signal`").head(0).toLong === 50L)
      // streamed read through handshake + inflater + auth, all at once
      val it = client.queryStream("SELECT `token_id` FROM `signal` WHERE `token_id` >= 1")
      try assert(it.map(_(0).toLong).toVector.sorted === (1L to 50L).toVector)
      finally it.close()
      // and the DSv2 read plumbs the same composed wire from options
      import spark.implicits._
      val live = spark.read.format("graft-signal-live")
        .option("url", base)
        .option("tlsTruststore", m.truststore)
        .option("tlsTruststorePassword", m.password)
        .option("tlsKeystore", m.clientKeystore)
        .option("tlsKeystorePassword", m.password)
        .option("compression", "gzip")
        .option("username", "ops").option("password", "pw-42")
        .load()
      assert(live.select($"token_id").collect().map(_.getLong(0)).sorted
        === (1L to 50L).toArray)
    } finally server.stop(0)
  }

  test("graft-signal-live DSv2 write + read runs end-to-end over mTLS") {
    val server = ChSignalStub.start(TlsStub.httpsServer(m, needClientAuth = true))
    try {
      val base = url(server)
      val wire = TlsStub.clientWire(m, mtls = true)
      val client = new ClickHouseHttpClient(base, timeoutMs = 5000, wire = wire)
      client.execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))

      import spark.implicits._
      val df = Seq(
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "speed", Some(41.0), None: Option[String]),
        (7L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "speed", Some(43.0), None: Option[String]),
        (9L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), "make", None: Option[Double], Some("m")))
        .toDF("token_id", "timestamp", "name", "value_number", "value_string")
      df.write.format("graft-signal-live")
        .option("url", base)
        .option("tlsTruststore", m.truststore)
        .option("tlsTruststorePassword", m.password)
        .option("tlsKeystore", m.clientKeystore)
        .option("tlsKeystorePassword", m.password)
        .mode("append").save()

      val back = spark.read.format("graft-signal-live")
        .option("url", base)
        .option("tlsTruststore", m.truststore)
        .option("tlsTruststorePassword", m.password)
        .option("tlsKeystore", m.clientKeystore)
        .option("tlsKeystorePassword", m.password)
        .load()
        .groupBy($"token_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(back === Map(7L -> 2L, 9L -> 1L))

      // the SAME read WITHOUT the tls options cannot even plan (the
      // envelope probe's handshake fails) — per-source trust is the
      // surface, not a JVM-global fallback
      intercept[Exception] {
        spark.read.format("graft-signal-live").option("url", base).load().count()
      }
    } finally server.stop(0)
  }
}
