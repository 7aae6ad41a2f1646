package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EsHttpClient

/** Seeded fuzz of the wire pagination state machine
  * ([[EsHttpClient.pagedLines]]) against an in-memory model — the
  * boundary-overlap/`_id`-dedup/size-doubling/Data-too-large-halving
  * interactions are the subtlest loop in the live tier, so it gets the
  * `StoreLifecycleFuzzSpec` treatment: randomized corpora (tie runs wider
  * than pages, random windows, random server size caps) checked for
  * exactly-once delivery, plus deterministic pins of the widen-floor
  * behavior (a halving may not undershoot a page size already proven
  * all-seen; a tie run wider than the largest servable page fails LOUDLY
  * instead of livelocking or silently skipping like the reference,
  * sync.go:151-155 [ext]) and the untimed-tail stop.
  *
  * No SparkSession needed — the loop under test is plain JVM + loopback
  * HTTP.
  */
class EsPaginationFuzzSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** (id, Some(timeMs)) = normal doc; (id, None) = doc whose `_source.time`
    * is MALFORMED but which the server still serves inside any window (the
    * index-time-vs-source-time pathology) — `indexMs` orders it.
    */
  private case class FDoc(id: String, timeMs: Option[Long], indexMs: Long) {
    def json: String = {
      val t = timeMs.map(ms => s""""time":"${java.time.Instant.ofEpochMilli(ms)}",""")
        .getOrElse(""""time":"not-a-timestamp",""")
      s"""{"id":"$id","subject":"s0","source":"x","specversion":"1.0",$t""" +
        s""""dataschema":"v2.0","type":"c","data":{}}"""
    }
  }

  /** Stub: sorts (-indexMs, id), filters the pushed window on indexMs,
    * rejects any request with size > cap as Data-too-large.
    */
  private def serve(docs: Seq[FDoc], cap: Int): HttpServer = {
    val sorted = docs.sortBy(d => (-d.indexMs, d.id))
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = mapper.readTree(ex.getRequestBody.readAllBytes())
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
        val hits = sorted.iterator
          .filter(d => gte.forall(d.indexMs >= _) && lt.forall(d.indexMs < _))
          .take(size)
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

  private def drain(server: HttpServer, batch: Int, startMs: Long, stopMs: Long): Seq[String] = {
    val client = new EsHttpClient(s"http://127.0.0.1:${server.getAddress.getPort}")
    val src = client.pagedLines("idx", batch, startMs, stopMs, None, Seq.empty)
    val out = Seq.newBuilder[String]
    var line = src.next()
    var guard = 0
    while (line != null) {
      out += mapper.readTree(line).path("id").asText()
      line = src.next()
      guard += 1
      require(guard < 100000, "runaway page loop")
    }
    out.result()
  }

  private val Base = 1704000000000L

  test("fuzz: exactly-once delivery under ties, windows and halving (seeded)") {
    val rnd = new scala.util.Random(20260815)
    for (trial <- 0 until 40) {
      val nDocs = rnd.nextInt(260)
      val span = 1 + rnd.nextInt(24) // few distinct timestamps ⇒ wide tie runs
      val docs = (0 until nDocs).map { i =>
        val t = Base + rnd.nextInt(span) * 1000L
        FDoc(f"d$i%04d", Some(t), t)
      }
      val batch = 1 + rnd.nextInt(16)
      val maxTie = if (docs.isEmpty) 0
      else docs.groupBy(_.timeMs).values.map(_.size).max
      // cap ≥ widest-tie-run + 1 ⇒ always drainable: a page one wider than
      // a full tie block is what reveals the first OLDER doc behind it
      val cap = math.max(1, maxTie) + 1 + rnd.nextInt(20)
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
        assert(got.sorted === got.distinct.sorted, s"trial $trial: duplicates in $got")
        assert(got.toSet === expected.toSet,
          s"trial $trial (n=$nDocs span=$span batch=$batch cap=$cap window=[$start,$stop)): " +
            s"got ${got.size}, want ${expected.size}")
      } finally server.stop(0)
    }
  }

  test("fuzz: a server cap below the tie width never loses rows SILENTLY (drain fully or throw)") {
    val rnd = new scala.util.Random(42)
    var threw = 0
    for (trial <- 0 until 15) {
      val nDocs = 20 + rnd.nextInt(120)
      val span = 1 + rnd.nextInt(4) // very wide tie runs
      val docs = (0 until nDocs).map { i =>
        val t = Base + rnd.nextInt(span) * 1000L
        FDoc(f"d$i%04d", Some(t), t)
      }
      val batch = 1 + rnd.nextInt(8)
      val cap = 1 + rnd.nextInt(12) // often below the tie width
      val server = serve(docs, cap)
      try {
        val got = try Some(drain(server, batch, 0L, Base + 10000000L))
        catch { case e: java.io.IOException if e.getMessage.contains("Data too large") =>
          threw += 1; None
        }
        got.foreach { g =>
          assert(g.sorted === g.distinct.sorted, s"trial $trial: duplicates")
          assert(g.toSet === docs.map(_.id).toSet,
            s"trial $trial: a COMPLETED drain must be complete (got ${g.size}/${docs.size})")
        }
      } finally server.stop(0)
    }
    assert(threw > 0, "the adversarial caps must exercise the loud-failure path at least once")
  }

  test("widen floor: doubling past the cap clamps to the floor and still drains (cap between)") {
    // 10 ties, batch 8, cap 12: widen 8→16 fails, floor is 9, halving
    // clamps 16→9 (not 8!), page of 9 = 8 seen + 1 new ⇒ progress ⇒ drains
    val docs = (0 until 10).map(i => FDoc(f"t$i%02d", Some(Base), Base))
    val server = serve(docs, cap = 12)
    try {
      val got = drain(server, 8, 0L, Base + 1000L)
      assert(got.toSet === docs.map(_.id).toSet)
    } finally server.stop(0)
  }

  test("widen floor: a tie run wider than the largest servable page fails loudly, not silently") {
    // 10 ties, cap 5: no servable page can ever reveal doc #6 — the
    // reference would silently skip the run; this loop must raise
    val docs = (0 until 10).map(i => FDoc(f"t$i%02d", Some(Base), Base))
    val server = serve(docs, cap = 5)
    try {
      val e = intercept[java.io.IOException](drain(server, 5, 0L, Base + 1000L))
      assert(e.getMessage.contains("Data too large"))
    } finally server.stop(0)
  }

  test("an untimed tail (malformed _source.time) stops the loop cleanly after its page") {
    // newest-first: 3 timed docs, then an untimed one, then 2 older timed
    // docs the loop can no longer reach (it cannot advance `stop` past a
    // doc it cannot time) — emit what arrived, stop, never spin
    val docs = Seq(
      FDoc("a1", Some(Base + 5000), Base + 5000),
      FDoc("a2", Some(Base + 4000), Base + 4000),
      FDoc("a3", Some(Base + 3000), Base + 3000),
      FDoc("bad", None, Base + 2000),
      FDoc("z1", Some(Base + 1000), Base + 1000),
      FDoc("z2", Some(Base), Base))
    val server = serve(docs, cap = 100)
    try {
      val got = drain(server, 4, 0L, Base + 10000L)
      assert(got === Seq("a1", "a2", "a3", "bad"),
        "the page containing the untimed doc is emitted; the loop stops there")
    } finally server.stop(0)
  }
}
