package graft.sources

import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Seeded fuzz harness for the wire pagination state machine
  * ([[EsHttpClient.pagedLines]]) against an in-memory model — the
  * boundary-overlap/`_id`-dedup/size-doubling/Data-too-large-halving/
  * `search_after`-tie-drain interactions are the subtlest loop in the
  * live tier. The harness lives in MAIN so the bench ledger can run a
  * pinned-seed round as a gate entry (a fuzz regression then fails the
  * driver's bench run, not just CI); `EsPaginationFuzzSpec` drives the
  * same harness plus deterministic pins.
  *
  * The stub implements the protocol surface the client speaks: windowed
  * `_search` sorted time-desc with a servable-size cap (over-cap ⇒ the
  * circuit-breaker "Data too large" error, sync.go:163-178 [ext]) and the
  * `search_after` drain grammar ([[EsQueryDsl.searchAfterRequest]]: `_id`
  * ascending within a window, cursor-exclusive).
  *
  * No SparkSession needed — plain JVM + loopback HTTP.
  */
private[graft] object PaginationFuzz {

  private val mapper = new ObjectMapper()

  /** (id, Some(timeMs)) = normal doc; (id, None) = doc whose `_source.time`
    * is MALFORMED but which the server still serves inside any window (the
    * index-time-vs-source-time pathology) — `indexMs` orders it.
    */
  final case class FDoc(id: String, timeMs: Option[Long], indexMs: Long) {
    def json: String = {
      val t = timeMs.map(ms => s""""time":"${java.time.Instant.ofEpochMilli(ms)}",""")
        .getOrElse(""""time":"not-a-timestamp",""")
      s"""{"id":"$id","subject":"s0","source":"x","specversion":"1.0",$t""" +
        s""""dataschema":"v2.0","type":"c","data":{}}"""
    }
  }

  /** Stub: sorts (-indexMs, id), filters the pushed window on indexMs,
    * rejects any request with size > cap as Data-too-large, and serves
    * the `search_after` drain grammar (sort `_id` asc + exclusive
    * cursor) the same way a real ES would.
    */
  def serve(docs: Seq[FDoc], cap: Int,
      requests: java.util.concurrent.ConcurrentLinkedQueue[String] = null): HttpServer = {
    val sorted = docs.sortBy(d => (-d.indexMs, d.id))
    val byId = docs.sortBy(_.id)
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        if (requests != null) requests.add(body)
        val req = mapper.readTree(body)
        val size = req.path("size").asInt(10)
        if (size > cap) {
          val err = """{"error":"circuit_breaking_exception: Data too large"}"""
          ex.sendResponseHeaders(500, err.length)
          ex.getResponseBody.write(err.getBytes(StandardCharsets.UTF_8))
          ex.close(); return
        }
        var gte: Option[Long] = None
        var lt: Option[Long] = None
        req.path("query").path("bool").path("filter").forEach { f =>
          val r = f.path("range").path("time")
          if (r.has("gte")) gte = Some(r.get("gte").asText().toLong)
          if (r.has("lt")) lt = Some(r.get("lt").asText().toLong)
        }
        def inWindow(d: FDoc) = gte.forall(d.indexMs >= _) && lt.forall(d.indexMs < _)
        val idSort = req.path("sort").size() > 0 && req.path("sort").get(0).has("_id")
        val picked =
          if (idSort) {
            // the drain grammar: `_id` ascending, cursor-exclusive
            val after = Option(req.get("search_after")).filter(_.isArray)
              .map(_.get(0).asText())
            byId.iterator.filter(inWindow)
              .filter(d => after.forall(d.id > _))
              .take(size)
          } else sorted.iterator.filter(inWindow).take(size)
        val hits = picked
          .map(d => s"""{"_id":"${d.id}","_source":${d.json}}""")
          .mkString(",")
        val res = s"""{"hits":{"hits":[$hits]}}"""
        val bytes = res.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  /** Drain one pagedDocs loop fully; returns the emitted payload ids. */
  def drain(server: HttpServer, batch: Int, startMs: Long, stopMs: Long): Seq[String] = {
    val client = new EsHttpClient(s"http://127.0.0.1:${server.getAddress.getPort}")
    val src = client.pagedDocs("idx", batch, startMs, stopMs, None, Seq.empty)
    val out = Seq.newBuilder[String]
    var doc = src.next()
    var guard = 0
    while (doc != null) {
      out += doc.path("id").asText()
      doc = src.next()
      guard += 1
      require(guard < 100000, "runaway page loop")
    }
    out.result()
  }

  val Base = 1704000000000L

  /** One seeded fuzz campaign: randomized corpora (tie runs wider than
    * pages AND wider than the server's cap, random windows, random size
    * caps) checked for exactly-once delivery against the model. Raises on
    * the first divergence (seeded ⇒ reproducible).
    */
  def run(seed: Long, trials: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    for (trial <- 0 until trials) {
      val nDocs = rnd.nextInt(260)
      val span = 1 + rnd.nextInt(24) // few distinct timestamps ⇒ wide tie runs
      val docs = (0 until nDocs).map { i =>
        val t = Base + rnd.nextInt(span) * 1000L
        FDoc(f"d$i%04d", Some(t), t)
      }
      val batch = 1 + rnd.nextInt(16)
      // caps range from adversarial (often BELOW the widest tie run — the
      // search_after drain's territory) to comfortable
      val cap = 1 + rnd.nextInt(40)
      val (start, stop) =
        if (rnd.nextBoolean()) (0L, Base + 10000000L)
        else {
          val a = Base + rnd.nextInt(span) * 1000L
          val b = Base + rnd.nextInt(span) * 1000L
          (math.min(a, b), math.max(a, b) + (if (rnd.nextBoolean()) 1000L else 0L))
        }
      val expected = docs.filter(d => d.indexMs >= start && d.indexMs < stop).map(_.id)
      val server = serve(docs, cap)
      try {
        val got = drain(server, batch, start, stop)
        require(got.sorted == got.distinct.sorted,
          s"pagination fuzz trial $trial (seed $seed): duplicates in $got")
        require(got.toSet == expected.toSet,
          s"pagination fuzz trial $trial (seed $seed, n=$nDocs span=$span batch=$batch " +
            s"cap=$cap window=[$start,$stop)): got ${got.size}, want ${expected.size}")
      } finally server.stop(0)
    }
  }
}
