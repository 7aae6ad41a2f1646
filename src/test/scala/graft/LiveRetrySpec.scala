package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.queries.LiveQueries
import graft.sources.{ChHttpStatusException, ClickHouseHttpClient, EsHttpClient, LiveHttp, LiveWire}

/** Transient-overload retry for the live clients — the statuses a loaded
  * production cluster actually serves: ES bulk/search rejections and
  * proxy hops (429/502/503/504, with `Retry-After`), CH's
  * too-many-queries 503. Pins:
  *
  *   - an idempotent ES search retries through a 429+Retry-After burst;
  *   - the circuit breaker's OWN 429 ("Data too large" — real ES serves
  *     CircuitBreakingException as 429) is NOT retried: it is the
  *     halving/drain trigger and must surface immediately;
  *   - CH SELECTs retry through a 503 burst; DDL (non-idempotent
  *     posture) surfaces the 503 on the first attempt;
  *   - the JVM-level HttpClient cache: same (timeout, TLS material) ⇒
  *     same pooled client (no per-task handshake pile-up), different
  *     config ⇒ different client.
  */
class LiveRetrySpec extends SparkTestBase {

  private def url(s: HttpServer) = s"http://127.0.0.1:${s.getAddress.getPort}"

  private val searchBody =
    """{"hits":{"total":{"value":1,"relation":"eq"},"hits":[
      |{"_id":"a","_source":{"subject":"s","time":"2024-01-01T00:00:00Z"}}]}}"""
      .stripMargin.replace("\n", "")

  /** Serves `failures` transient errors, then succeeds. */
  private def flakyServer(failures: Int, failCode: Int, failBody: String,
      okBody: String, requests: AtomicInteger): HttpServer = {
    val server = LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        val n = requests.incrementAndGet()
        val (code, body) = if (n <= failures) (failCode, failBody) else (200, okBody)
        if (code != 200) ex.getResponseHeaders.set("Retry-After", "0")
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  test("ES search retries through a 429 burst, honoring Retry-After") {
    val requests = new AtomicInteger
    val server = flakyServer(2, 429, """{"error":{"type":"es_rejected_execution_exception"}}""",
      searchBody, requests)
    try {
      val c = new EsHttpClient(url(server))
      assert(c.searchTree("idx", "{}").path("hits").path("hits").size() === 1)
      assert(requests.get() === 3, "two rejections, one success")
    } finally server.stop(0)
  }

  test("the circuit breaker's 429 is NOT retried (it is the halving/drain trigger)") {
    val requests = new AtomicInteger
    val server = flakyServer(Int.MaxValue, 429,
      """{"error":{"type":"circuit_breaking_exception","reason":"Data too large"}}""",
      searchBody, requests)
    try {
      val c = new EsHttpClient(url(server))
      val e = intercept[java.io.IOException] { c.searchTree("idx", "{}") }
      assert(e.getMessage.contains("Data too large"))
      assert(requests.get() === 1,
        "a too-large rejection must surface on the FIRST attempt — retries only delay the halving")
    } finally server.stop(0)
  }

  test("CH SELECT retries through a 503 burst; DDL surfaces it immediately") {
    val requests = new AtomicInteger
    val server = flakyServer(2, 503, "Code: 202. DB::Exception: Too many simultaneous queries",
      "7\n", requests)
    try {
      val c = new ClickHouseHttpClient(url(server))
      assert(c.query("SELECT count() FROM `signal`").head(0).toLong === 7L)
      assert(requests.get() === 3)
    } finally server.stop(0)
    // DDL: non-idempotent posture — one attempt, typed failure
    val req2 = new AtomicInteger
    val server2 = flakyServer(Int.MaxValue, 503, "Too many simultaneous queries", "", req2)
    try {
      val c2 = new ClickHouseHttpClient(url(server2))
      val e = intercept[ChHttpStatusException] { c2.execute("CREATE TABLE t (x Int64)") }
      assert(e.statusCode === 503 && req2.get() === 1)
    } finally server2.stop(0)
  }

  test("the HttpClient cache pools per (timeout, TLS material)") {
    val a = LiveHttp.newClient(12345L)
    val b = LiveHttp.newClient(12345L)
    val c = LiveHttp.newClient(54321L)
    assert(a eq b, "same config must reuse the pooled client")
    assert(!(a eq c), "a different timeout is a different client")
    // gzip/auth are per-REQUEST concerns: they share the pooled client
    val d = LiveHttp.newClient(12345L, LiveWire(gzip = true, username = Some("u")))
    assert(a eq d, "request-level options must not fragment the pool")
  }
}
