package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._

/** Edge protocol behaviors of the live ES page loop (ADVICE r13):
  *
  *   - a real ES rejects over-window pages with "Result window is too
  *     large" (`index.max_result_window`, default 10k) rather than the
  *     circuit breaker's "Data too large" — BOTH must halve outside a
  *     widen cycle and enter the `search_after` drain inside one;
  *   - the widen cycle must never double past the window either: at
  *     [[graft.sources.EsHttpClient.MaxWidenSize]] it switches to the
  *     drain proactively (a doubled request would only be rejected);
  *   - exhaustion ("short page") compares the RAW `hits.hits` length to
  *     the requested size: a full page containing one `_source`-less hit
  *     must not read as short (that would end the window early and
  *     silently lose every older document).
  */
class EsPagingEdgeSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()

  private case class Doc(id: String, subject: String, timeMs: Long,
      sourceless: Boolean = false) {
    def json: String =
      s"""{"id":"$id","subject":"$subject","source":"dimo/integration/live",""" +
        s""""specversion":"1.0","time":"${java.time.Instant.ofEpochMilli(timeMs)}",""" +
        s""""dataschema":"dimo.zone.status/v2.0","type":"com.dimo.device.status",""" +
        s""""data":{}}"""
  }

  /** `_search` stub speaking BOTH page grammars (time-desc window pages
    * and the `_id`-asc `search_after` drain), with a configurable
    * over-size rejection: `windowError = true` answers like a real ES's
    * max_result_window (400, "Result window is too large"), `false` like
    * the circuit breaker (500, "Data too large"). A `sourceless` doc's
    * hit carries no `_source` at all (stored-fields/_source-disabled
    * responses).
    */
  private def startStub(docs: Seq[Doc], requests: ConcurrentLinkedQueue[String],
      sizeCap: Int = Int.MaxValue, windowError: Boolean = false): HttpServer = {
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try handle0(ex) catch {
        case e: Throwable => System.err.println(s"STUB HANDLER THREW: $e"); throw e
      }
      private def handle0(ex: HttpExchange): Unit = {
        if (ex.getRequestURI.getPath.endsWith("/_pit")) {
          // no point-in-time support here: the drain must fall back to
          // the `_id` grammar (404 is the clean probe answer)
          ex.getRequestBody.readAllBytes()
          ex.sendResponseHeaders(404, -1)
          ex.close()
          return
        }
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        requests.add(body)
        val req = mapper.readTree(body)
        val size = req.path("size").asInt(10)
        if (size > sizeCap) {
          val (code, err) =
            if (windowError)
              (400, """{"error":{"type":"illegal_argument_exception","reason":""" +
                s""""Result window is too large, from + size must be less than or equal to: [$sizeCap]"}}""")
            else (500, """{"error":"circuit_breaking_exception: Data too large"}""")
          val bytes = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(code, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close(); return
        }
        var subject: Option[String] = None
        var gte: Option[Long] = None
        var lt: Option[Long] = None
        req.path("query").path("bool").path("filter").forEach { f =>
          val m = f.path("match").path("subject").path("query")
          if (m.isTextual) subject = Some(m.asText())
          val r = f.path("range").path("time")
          if (r.has("gte")) gte = Some(r.get("gte").asText().toLong)
          if (r.has("lt")) lt = Some(r.get("lt").asText().toLong)
        }
        val idSort = req.path("sort").size() > 0 && req.path("sort").get(0).has("_id")
        val after = Option(req.get("search_after")).filter(_.isArray).map(_.get(0).asText())
        val matched = docs.filter(d => subject.forall(_ == d.subject) &&
          gte.forall(d.timeMs >= _) && lt.forall(d.timeMs < _))
        val ordered =
          if (idSort) matched.sortBy(_.id).filter(d => after.forall(d.id > _))
          else matched.sortBy(d => (-d.timeMs, d.id))
        if (size == 0) {
          val res = s"""{"hits":{"total":{"value":${matched.length},"relation":"eq"},"hits":[]}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close(); return
        }
        val hits = ordered.take(size).map { d =>
          if (d.sourceless) s"""{"_index":"device-status","_id":"${d.id}"}"""
          else s"""{"_index":"device-status","_id":"${d.id}","_source":${d.json}}"""
        }
        val res = s"""{"hits":{"hits":[${hits.mkString(",")}]}}"""
        val bytes = res.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def liveDf(server: HttpServer, batchSize: Int) =
    spark.read.format("graft-status-live")
      .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
      .option("batchSize", batchSize.toString)
      .load()

  test("max_result_window rejection halves like the circuit breaker (no tie run)") {
    val docs = (0 until 30).map(i => Doc(s"w$i", "s0", 1704000000000L + i * 1000L))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests, sizeCap = 8, windowError = true)
    try {
      val got = liveDf(server, batchSize = 64).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0)).toSet
      assert(got === docs.map(_.id).toSet)
      import scala.jdk.CollectionConverters._
      val sizes = requests.asScala.toSeq.map(mapper.readTree(_).path("size").asInt())
      assert(sizes.contains(64) && sizes.contains(8),
        s"window rejections must halve 64→32→16→8 like the breaker: $sizes")
    } finally server.stop(0)
  }

  test("max_result_window rejection MID-WIDEN enters the search_after drain (exactly-once)") {
    // 30 docs on one tied millisecond, window capped at 10: the widen
    // cycle (10 → 20) is REJECTED with the window error, not the breaker —
    // the drain must still engage and deliver all 30 exactly once
    val docs = (0 until 30).map(i => Doc(f"t$i%03d", "s0", 1704000000000L))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests, sizeCap = 10, windowError = true)
    try {
      val got = liveDf(server, batchSize = 10).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0))
      assert(got.length === 30 && got.toSet === docs.map(_.id).toSet,
        s"the drain must deliver the tie exactly once (got ${got.length})")
      import scala.jdk.CollectionConverters._
      assert(requests.asScala.exists(b => {
        val n = mapper.readTree(b)
        n.path("sort").size() > 0 && n.path("sort").get(0).has("_id")
      }), "the _id-asc drain grammar must appear on the wire")
    } finally server.stop(0)
  }

  test("the widen cycle never doubles past MaxWidenSize — it drains instead") {
    // a tie run wider than ES's default window (12,000 docs on one
    // millisecond) against an UNCAPPED stub: a real ES would reject any
    // page above 10k, so the loop must stop doubling there and drain —
    // pinned by asserting no request ever exceeded MaxWidenSize
    val n = 12000
    val docs = (0 until n).map(i => Doc(f"b$i%05d", "s0", 1704000000000L))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val got = liveDf(server, batchSize = 500).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0))
      assert(got.length === n && got.toSet === docs.map(_.id).toSet,
        s"over-window tie run must survive exactly once (got ${got.length})")
      import scala.jdk.CollectionConverters._
      val sizes = requests.asScala.toSeq.map(mapper.readTree(_).path("size").asInt())
      assert(sizes.max <= graft.sources.EsHttpClient.MaxWidenSize,
        s"no request may exceed index.max_result_window: max=${sizes.max}")
      assert(requests.asScala.exists(b => {
        val nd = mapper.readTree(b)
        nd.path("sort").size() > 0 && nd.path("sort").get(0).has("_id")
      }), "the over-window tie must have drained via search_after")
    } finally server.stop(0)
  }

  test("a full page containing a _source-less hit is NOT a short page (raw-count exhaustion)") {
    // 20 timed docs + one sourceless hit landing inside the first page of
    // 5: post-filter counting would read 4 < 5 ⇒ "window exhausted" and
    // silently lose the 15 older docs. Raw counting keeps paging.
    val timed = (0 until 20).map(i => Doc(f"s$i%02d", "s0", 1704000000000L + i * 1000L))
    val odd = Doc("zz-nosource", "s0", 1704000000000L + 17500L, sourceless = true)
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(timed :+ odd, requests)
    try {
      val got = liveDf(server, batchSize = 5).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0)).toSet
      assert(got === timed.map(_.id).toSet,
        s"every decodable doc must arrive despite the _source-less hit (got ${got.size} of 20)")
    } finally server.stop(0)
  }
}
