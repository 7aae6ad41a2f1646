package graft

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.queries.{ChSignalStub, LiveQueries}
import graft.sources.{ChHttpStatusException, ClickHouseDdl, ClickHouseHttpClient, EsHttpClient, LiveWire}

/** Client credentials for the live tier — the reference authenticates
  * BOTH connections (elastic.go:29-30 [ext]: Username/Password on the ES
  * client; clickhouse.go:40-43 [ext]: `Auth{Username, Password}`), and
  * both servers' HTTP interfaces accept standard basic auth. Pins:
  *
  *   - the `username`/`password` options emit `Authorization: Basic` on
  *     EVERY request of both clients (searches, probes, DDL, inserts,
  *     streamed scans);
  *   - wrong or missing credentials surface as the server's 401, typed
  *     on the CH side ([[ChHttpStatusException]]) — never silently
  *     retried into success;
  *   - secrets never reach logs: [[LiveWire]]'s toString (serialized
  *     into factories Spark freely prints) redacts every password.
  */
class LiveAuthSpec extends SparkTestBase {

  private val User = "sync_user"
  private val Pass = "s3cret-pw"
  private def basic(u: String, p: String) =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$u:$p".getBytes(StandardCharsets.UTF_8))

  private def url(s: HttpServer) = s"http://127.0.0.1:${s.getAddress.getPort}"

  test("ES requests carry Authorization: Basic; wrong credentials surface the 401") {
    val server = LiveQueries.loopbackServer()
    val body =
      """{"hits":{"total":{"value":1,"relation":"eq"},"hits":[
        |{"_id":"a","_source":{"subject":"s","time":"2024-01-01T00:00:00Z"}}]}}"""
        .stripMargin.replace("\n", "")
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        val ok = Option(ex.getRequestHeaders.getFirst("Authorization"))
          .contains(basic(User, Pass))
        val bytes = (if (ok) body else """{"error":{"type":"security_exception"}}""")
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(if (ok) 200 else 401, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val authed = new EsHttpClient(url(server),
        wire = LiveWire(username = Some(User), password = Some(Pass)))
      assert(authed.searchTree("device-status", "{}")
        .path("hits").path("hits").size() === 1)
      val anonymous = new EsHttpClient(url(server))
      val e = intercept[java.io.IOException] { anonymous.searchTree("device-status", "{}") }
      assert(e.getMessage.contains("401"))
      val wrongPw = new EsHttpClient(url(server),
        wire = LiveWire(username = Some(User), password = Some("nope")))
      intercept[java.io.IOException] { wrongPw.searchTree("device-status", "{}") }
    } finally server.stop(0)
  }

  test("CH auth: the full DSv2 write/read round authenticates; anonymous gets the typed 401") {
    val server = ChSignalStub.start(auth = Some((User, Pass)))
    try {
      val base = url(server)
      val wire = LiveWire(username = Some(User), password = Some(Pass))
      new ClickHouseHttpClient(base, wire = wire)
        .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
      // anonymous and wrong-password clients both get the server's 401,
      // typed — DDL is unretried, so exactly one refusal each
      val e = intercept[ChHttpStatusException] {
        new ClickHouseHttpClient(base).query("SELECT count() FROM `signal`")
      }
      assert(e.statusCode === 401 && e.getMessage.contains("Authentication failed"))
      intercept[ChHttpStatusException] {
        new ClickHouseHttpClient(base,
          wire = LiveWire(username = Some(User), password = Some("nope")))
          .query("SELECT count() FROM `signal`")
      }

      import spark.implicits._
      val df = (1 to 60).map(i =>
        (i.toLong % 3, new java.sql.Timestamp(1700000000000L + i), "speed",
          Some(i.toDouble), None: Option[String]))
        .toDF("token_id", "timestamp", "name", "value_number", "value_string")
        .repartition(3)
      df.write.format("graft-signal-live")
        .option("url", base).option("username", User).option("password", Pass)
        .mode("append").save()
      val back = spark.read.format("graft-signal-live")
        .option("url", base).option("username", User).option("password", Pass)
        .load()
        .groupBy($"token_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(back === Map(0L -> 20L, 1L -> 20L, 2L -> 20L))
      // an option-less read cannot even plan (the envelope probe 401s)
      intercept[Exception] {
        spark.read.format("graft-signal-live").option("url", base).load().count()
      }
    } finally server.stop(0)
  }

  test("LiveWire.toString redacts every secret (Spark prints serialized factories freely)") {
    val w = LiveWire(truststore = Some("/etc/ts.p12"), truststorePassword = Some("ts-pw"),
      keystore = Some("/etc/ks.p12"), keystorePassword = Some("ks-pw"),
      username = Some(User), password = Some(Pass))
    val s = w.toString
    assert(!s.contains(Pass) && !s.contains("ts-pw") && !s.contains("ks-pw"))
    assert(s.contains(User), "the username (not a secret) stays visible for diagnostics")
  }
}
