package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._

/** The LIVE Elasticsearch read path (`graft-status-live` +
  * [[graft.sources.EsHttpClient]]) against a loopback stub implementing
  * enough of the `_search` API to honor the reference's request shape:
  * bool.filter match/range, size, sort time desc. Asserts wire-level
  * request parity with EsQueryDsl, pagination without the reference's
  * page-boundary tie skip, Data-too-large halving, per-subject task
  * fan-out, and end-to-end equality with the FILE source over the same
  * documents (one decode path, two transports).
  */
class EsLiveSourceSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()

  /** All documents the stub serves, newest-first per request. */
  private case class Doc(id: String, subject: String, timeMs: Long, vss: Double,
      rawJson: Option[String] = None) {
    def json: String = rawJson.getOrElse(
      s"""{"id":"$id","subject":"$subject","source":"dimo/integration/live",""" +
        s""""specversion":"1.0","time":"${java.time.Instant.ofEpochMilli(timeMs)}",""" +
        s""""dataschema":"dimo.zone.status/v2.0","type":"com.dimo.device.status",""" +
        s""""data":{"vehicle":{"speed":$vss}}}""")
  }

  /** ES-style `_source` projection: keep only the dotted `includes` paths
    * (what a real ES does with `_source.includes`).
    */
  private def projectSource(json: String, includes: Seq[String]): String = {
    val src = mapper.readTree(json)
    val out = mapper.createObjectNode()
    includes.foreach { path =>
      val parts = path.split('.')
      var node = src
      var ok = true
      parts.foreach { p => if (ok) { node = node.path(p); ok = !node.isMissingNode } }
      if (ok) {
        var tgt = out
        parts.dropRight(1).foreach { p =>
          tgt = if (tgt.has(p)) tgt.get(p).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
          else tgt.putObject(p)
        }
        tgt.set[com.fasterxml.jackson.databind.JsonNode](parts.last, node)
      }
    }
    mapper.writeValueAsString(out)
  }

  /** Minimal ES `_search` stub: parses the pushed bool.filter, sorts time
    * desc, applies size; optionally fails big pages with Data-too-large.
    */
  private def startStub(docs: Seq[Doc], requests: ConcurrentLinkedQueue[String],
      tooLargeOver: Int = Int.MaxValue, exactTotals: Boolean = true,
      statsStoreBytes: Option[Long] = None): HttpServer = {
    val server = graft.queries.LiveQueries.loopbackServer()
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try handle0(ex) catch {
        case e: Throwable => System.err.println(s"STUB HANDLER THREW: $e"); throw e
      }
      private def handle0(ex: HttpExchange): Unit = {
        if (ex.getRequestURI.getPath.contains("/_stats")) {
          // sizing probe: configurable store bytes; absent ⇒ 404 (the
          // client must fall back to its conservative default)
          statsStoreBytes match {
            case Some(b) =>
              val res = s"""{"_all":{"primaries":{"docs":{"count":${docs.length}},""" +
                s""""store":{"size_in_bytes":$b}}}}"""
              val bytes = res.getBytes(StandardCharsets.UTF_8)
              ex.sendResponseHeaders(200, bytes.length)
              ex.getResponseBody.write(bytes)
            case None => ex.sendResponseHeaders(404, -1)
          }
          ex.close()
          return
        }
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        requests.add(ex.getRequestURI.getPath + "\n" + body)
        val req = mapper.readTree(body)
        val size = req.path("size").asInt(10)
        if (size > tooLargeOver) {
          val err = """{"error":"circuit_breaking_exception: Data too large"}"""
          ex.sendResponseHeaders(500, err.length)
          ex.getResponseBody.write(err.getBytes(StandardCharsets.UTF_8))
          ex.close(); return
        }
        var subject: Option[String] = None
        var subjectSet: Option[Set[String]] = None // `terms` membership clause
        var gte: Option[Long] = None
        var lt: Option[Long] = None
        req.path("query").path("bool").path("filter").forEach { f =>
          val m = f.path("match").path("subject").path("query")
          if (m.isTextual) subject = Some(m.asText())
          val t = f.path("terms").path("subject")
          if (t.isArray) {
            val b = Set.newBuilder[String]
            t.forEach(v => b += v.asText())
            subjectSet = Some(b.result())
          }
          val r = f.path("range").path("time")
          if (!r.isMissingNode) {
            if (r.has("gte")) gte = Some(r.get("gte").asText().toLong)
            if (r.has("lt")) lt = Some(r.get("lt").asText().toLong)
          }
        }
        // `should: exists` + minimum_should_match (the reference's signal
        // filter) and `_source.includes` (the projection) — a real ES
        // honors both, so the stub must too or the pushdown is untested
        val existsFields = Seq.newBuilder[String]
        req.path("query").path("bool").path("should").forEach { s =>
          val f = s.path("exists").path("field")
          if (f.isTextual) existsFields += f.asText()
        }
        val exists = existsFields.result()
        val msm = req.path("query").path("bool").path("minimum_should_match").asInt(0)
        val includes = Seq.newBuilder[String]
        req.path("_source").path("includes").forEach(i => includes += i.asText())
        val incl = includes.result()
        def hasPath(json: String, path: String): Boolean = {
          var node = mapper.readTree(json)
          path.split('.').foreach(p => node = node.path(p))
          !node.isMissingNode
        }
        val matched = docs
          .filter(d => subject.forall(_ == d.subject) &&
            subjectSet.forall(_.contains(d.subject)) &&
            gte.forall(d.timeMs >= _) && lt.forall(d.timeMs < _) &&
            (msm == 0 || exists.count(hasPath(d.json, _)) >= msm))
        val hits = matched
          .sortBy(-_.timeMs)
          .take(size)
          .map { d =>
            val src = if (incl.isEmpty) d.json else projectSource(d.json, incl)
            s"""{"_index":"device-status","_id":"${d.id}","_source":$src}"""
          }
        // real-ES total semantics: exact (relation "eq") only when the
        // request opts in with track_total_hits; otherwise the default cap
        // applies and the relation is a lower bound ("gte") — which the
        // client must treat as UNKNOWN, not as a usable count
        val track = req.path("track_total_hits").asBoolean(false)
        val totalJson =
          if (track && exactTotals) s"""{"value":${matched.length},"relation":"eq"}"""
          else s"""{"value":${math.min(matched.length, 10000)},"relation":"gte"}"""
        val res = s"""{"hits":{"total":$totalJson,"hits":[${hits.mkString(",")}]}}"""
        val bytes = res.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    server
  }

  private def liveDf(server: HttpServer, batchSize: Int = 7) =
    spark.read.format("graft-status-live")
      .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
      .option("batchSize", batchSize.toString)
      .load()

  test("live read ≡ file read over the same documents; requests are EsQueryDsl bodies") {
    val docs = (0 until 25).map(i =>
      Doc(s"d$i", s"s${i % 2}", 1704000000000L + i * 1000L, i * 1.5))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      // file twin: the same documents as NDJSON
      val f = java.nio.file.Files.createTempFile("graft-es-live", ".ndjson")
      java.nio.file.Files.writeString(f, docs.map(_.json).mkString("\n"))
      val live = liveDf(server).where(col("subject") === "s1")
        .select("id", "subject", "time", "data")
      val file = spark.read.format("graft-status").load(f.toString)
        .where(col("subject") === "s1")
        .select("id", "subject", "time", "data")
      val a = live.collect().map(_.toSeq).toSet
      val b = file.collect().map(_.toSeq).toSet
      assert(a === b, "one decode path, two transports")
      assert(a.size === 12, "subject s1 has 12 of the 25 docs")
      // wire parity: every request is exactly the generator's body for the
      // pushed state (match subject + range window + size + sort desc)
      import scala.jdk.CollectionConverters._
      val bodies = requests.asScala.toSeq.map(_.split("\n", 2)(1))
      assert(requests.asScala.forall(_.startsWith("/device-status/_search")))
      bodies.foreach { b2 =>
        val n = mapper.readTree(b2)
        assert(n.path("sort").get(0).path("time").path("order").asText() === "desc")
        assert(n.path("query").path("bool").path("filter").get(0)
          .path("match").path("subject").path("query").asText() === "s1")
      }
      // pagination: batchSize 7 over 12 docs → a full page then the short
      // final page (a short page proves exhaustion — no terminator needed)
      assert(bodies.length >= 2, s"expected a paged read, got ${bodies.length} request(s)")
    } finally server.stop(0)
  }

  test("pagination loses nothing on timestamp ties wider than a page (the reference's skip, fixed)") {
    // 30 docs, ALL the same timestamp, page size 6: the reference's
    // next-stop-equals-last-timestamp loop would return one page and skip
    // 24 docs; boundary-overlap + id dedup (+ size doubling) reads all 30
    val docs = (0 until 30).map(i => Doc(s"t$i", "s0", 1704000000000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val got = liveDf(server, batchSize = 6).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0)).toSet
      assert(got === docs.map(_.id).toSet,
        s"tie run must survive pagination (got ${got.size} of 30)")
    } finally server.stop(0)
  }

  test("Data-too-large responses halve the page size and the read still completes") {
    val docs = (0 until 20).map(i =>
      Doc(s"g$i", "s0", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests, tooLargeOver = 4)
    try {
      val got = liveDf(server, batchSize = 32).where(col("subject") === "s0")
        .select("id").collect().map(_.getString(0)).toSet
      assert(got === docs.map(_.id).toSet)
      import scala.jdk.CollectionConverters._
      val sizes = requests.asScala.toSeq.map(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt())
      assert(sizes.contains(32) && sizes.contains(4),
        s"halving 32→16→8→4 must be visible on the wire: $sizes")
    } finally server.stop(0)
  }

  test("the signals option pushes _source.includes + exists + minimum_should_match (the reference's required-fields contract)") {
    // d0/d2/d4… carry speed (+ a make field the projection must strip);
    // d1/d3/… carry only make — the exists filter must drop them server-side
    val docs = (0 until 10).map { i =>
      val data = if (i % 2 == 0) s"""{"speed":${i * 1.5},"make":"Ford"}""" else """{"make":"Audi"}"""
      Doc(s"d$i", "s0", 1704000000000L + i * 1000L, 0.0, Some(
        s"""{"id":"d$i","subject":"s0","source":"dimo/integration/live",""" +
          s""""specversion":"1.0","time":"${java.time.Instant.ofEpochMilli(1704000000000L + i * 1000L)}",""" +
          s""""dataschema":"dimo.zone.status/v1.0","type":"com.dimo.device.status",""" +
          s""""data":$data}"""))
    }
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val rows = liveDf(server).where(col("subject") === "s0")
        .select(col("id"),
          get_json_object(col("data"), "$.speed").cast("double").as("speed"),
          get_json_object(col("data"), "$.make").as("make"))
      val withSignals = spark.read.format("graft-status-live")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("batchSize", "7")
        .option("signals", "Vehicle.Speed")
        .load()
        .where(col("subject") === "s0")
        .select(col("id"),
          get_json_object(col("data"), "$.speed").cast("double").as("speed"),
          get_json_object(col("data"), "$.make").as("make"))
        .collect()
      // exists+msm dropped the speed-less docs server-side
      assert(withSignals.map(_.getString(0)).toSet === Set("d0", "d2", "d4", "d6", "d8"))
      // includes stripped make from _source — the projection REALLY arrived
      assert(withSignals.forall(_.isNullAt(2)), "make must be projected away")
      assert(withSignals.forall(r => !r.isNullAt(1)), "speed must survive the projection")
      // and the request body is the reference's literal contract
      import scala.jdk.CollectionConverters._
      val body = mapper.readTree(requests.asScala.last.split("\n", 2)(1))
      val incl = body.path("_source").path("includes").elements().asScala.map(_.asText()).toSeq
      assert(incl === graft.sources.EsQueryDsl.RootFields ++ Seq("data.speed"))
      assert(body.path("query").path("bool").path("should").get(0)
        .path("exists").path("field").asText() === "data.speed")
      assert(body.path("query").path("bool").path("minimum_should_match").asInt() === 1)
      // sanity: WITHOUT the option, full _source flows (make visible)
      val without = rows.collect()
      assert(without.length === 10 && without.count(!_.isNullAt(2)) === 10)
    } finally server.stop(0)
  }

  test("a scan not needing `data` projects the envelope (pure includes, no exists — row set unchanged)") {
    val docs = (0 until 8).map(i => Doc(s"e$i", s"s${i % 2}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val got = liveDf(server).where(col("subject") === "s1")
        .select("id", "subject", "time").collect()
      assert(got.length === 4)
      import scala.jdk.CollectionConverters._
      val body = mapper.readTree(requests.asScala.last.split("\n", 2)(1))
      val incl = body.path("_source").path("includes").elements().asScala.map(_.asText()).toSeq
      assert(incl === graft.sources.EsQueryDsl.RootFields,
        "envelope-only scans must ship _source.includes instead of the whole document")
      assert(body.path("query").path("bool").path("should").isMissingNode,
        "pure projection must NOT add exists clauses (that would change the row set)")
    } finally server.stop(0)
  }

  test("accepted filters are enforced: IsNotNull drops null-subject docs; duplicate range bounds tighten") {
    // NOTE: docs without a `time` field can never arrive over the wire —
    // every request carries a [start, stop) range filter a real ES
    // evaluates server-side — so the live IsNotNull case that matters is
    // `subject`: an UNFILTERED scan fetches subject-less docs and only the
    // client-side re-evaluation can honor `subject IS NOT NULL`
    val timed = (0 until 3).map(i => Doc(s"t$i", "s0", 1704000000000L + i * 60000L, i * 1.0))
    val noSubject = (0 until 2).map { i =>
      val t = 1704000300000L + i * 1000L
      Doc(s"n$i", s"__none$i", t, 0.0, Some(
        s"""{"id":"n$i","source":"x","specversion":"1.0",""" +
          s""""time":"${java.time.Instant.ofEpochMilli(t)}",""" +
          s""""dataschema":"dimo.zone.status/v2.0","type":"c","data":{}}"""))
    }
    val server = startStub(timed ++ noSubject, new ConcurrentLinkedQueue[String]())
    try {
      val df = liveDf(server)
      assert(df.select("id", "time").collect().length === 5)
      val notNull = df.where(col("subject").isNotNull).select("id").collect()
      assert(notNull.length === 3, "a pushed IsNotNull(subject) must drop subject-less docs")
      // duplicate conjuncts: time >= a AND time >= b (b tighter) — both
      // pushed; the tighter bound must win
      val a = new java.sql.Timestamp(1704000000000L)
      val b = new java.sql.Timestamp(1704000060000L)
      val dup = df.where(col("subject") === "s0" && col("time") >= a && col("time") >= b)
        .select("id").collect().map(_.getString(0)).toSet
      assert(dup === Set("t1", "t2"), s"the TIGHTER of duplicate >= bounds must apply: $dup")
      val dupLt = df.where(col("subject") === "s0" &&
          col("time") < new java.sql.Timestamp(1704000120000L) &&
          col("time") < new java.sql.Timestamp(1704000060000L))
        .select("id").collect().map(_.getString(0)).toSet
      assert(dupLt === Set("t0"), s"the TIGHTER of duplicate < bounds must apply: $dupLt")
      // contradictory subject conjuncts: intersection is empty ⇒ no rows,
      // no requests needed
      assert(df.where(col("subject") === "s0" && col("subject") === "s1").collect().isEmpty)
    } finally server.stop(0)
  }

  test("a non-exact total (relation != eq — ES's 10k cap) reports NO statistics") {
    // ADVICE r12: an under-reported count does not "err safe" — it makes
    // the planner BROADCAST an arbitrarily large live scan. Anything short
    // of relation "eq" must leave statistics unreported (planner default).
    val docs = (0 until 30).map(i =>
      Doc(s"nx$i", s"s${i % 3}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests, exactTotals = false)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      assert(new graft.sources.EsHttpClient(url).countFor("device-status", Seq.empty) === -1L,
        "a gte/capped total is unknown, never a usable lower bound")
      val live = liveDf(server).select("id", "subject")
      val sz = live.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sz > BigInt(1000000L),
        s"capped totals must fall back to the planner default (no tiny estimate), got $sz")
    } finally server.stop(0)
  }

  test("reported statistics (hits.total probe) let a small live snapshot broadcast") {
    val docs = (0 until 30).map(i =>
      Doc(s"st$i", s"s${i % 3}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val live = liveDf(server).select("id", "subject")
      assert(live.queryExecution.optimizedPlan.stats.sizeInBytes === BigInt(30 * 512L),
        "the size-0 probe's hits.total must reach the planner")
      // the probe itself must OPT IN to exact totals — without
      // track_total_hits a real ES caps at 10k and the stub answers "gte"
      import scala.jdk.CollectionConverters._
      val probe = requests.asScala.map(r => mapper.readTree(r.split("\n", 2)(1)))
        .find(_.path("size").asInt(-1) == 0).get
      assert(probe.path("track_total_hits").asBoolean(false),
        "the count probe must send track_total_hits: true")
      val fact = spark.range(0, 5000).selectExpr("CAST(id % 3 AS STRING) as subject", "id as x")
      val j = fact.join(live, Seq("subject"))
      j.collect()
      val nodes = allExecNodes(j.queryExecution.executedPlan).map(_.getClass.getSimpleName)
      assert(nodes.exists(_.contains("BroadcastHashJoin")),
        s"true (tiny) reported stats must yield BHJ, got:\n${nodes.mkString(", ")}")
    } finally server.stop(0)
  }

  test("sizeInBytes uses the index-stats probe: heavy-payload indexes must NOT broadcast") {
    // VERDICT r13 #6: with the old 512 B/doc guess, 3000 fat docs read as
    // ~1.5 MB and broadcast; their real store size (configured here as
    // 20 KB/doc = 60 MB) is far past the 10 MB threshold — the probe-fed
    // estimate must keep the join off the broadcast path.
    val docs = (0 until 3000).map(i =>
      Doc(s"fat$i", s"s${i % 3}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests,
      statsStoreBytes = Some(3000L * 20480L))
    try {
      val live = liveDf(server).select("id", "subject")
      val sz = live.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sz === BigInt(3000L * 20480L),
        s"rows × measured bytes/doc must reach the planner, got $sz")
      // the fact side estimates well past the 10 MB broadcast threshold,
      // so the ONLY broadcast candidate is the live side — under the old
      // 512 B/doc guess it read as ~1.5 MB and would have broadcast; the
      // probe-fed 60 MB must keep it off that path entirely
      val fact = spark.range(0, 2000000).selectExpr("CAST(id AS STRING) as subject", "id as x")
      val j = fact.join(live, Seq("subject"))
      j.count()
      // (even if a side broadcasts, it must never be the live scan)
      def liveUnderBroadcast(p: org.apache.spark.sql.execution.SparkPlan,
          under: Boolean): Boolean = {
        val b = under || p.getClass.getSimpleName.startsWith("BroadcastExchange")
        val isLiveScan = p.getClass.getSimpleName == "BatchScanExec" &&
          p.toString.contains("graft_status_live")
        if (b && isLiveScan) true
        else (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case other => other.children
        }).exists(liveUnderBroadcast(_, b))
      }
      assert(!liveUnderBroadcast(j.queryExecution.executedPlan, under = false),
        s"a 60 MB live side must not broadcast:\n${j.queryExecution.executedPlan}")
    } finally server.stop(0)
  }

  test("COUNT(*) pushes as one exact-total probe — no document ever pages over the wire") {
    val docs = (0 until 35).map(i =>
      Doc(s"c$i", s"s${i % 3}", 1704000000000L + i * 60000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      assert(liveDf(server).count() === 35)
      // filters ride into the probe: one subject + a half-open window
      val a = new java.sql.Timestamp(1704000300000L) // >= doc 5
      val filtered = liveDf(server)
        .where(col("subject") === "s1" && col("time") >= a)
      assert(filtered.count() === docs.count(d =>
        d.subject == "s1" && d.timeMs >= a.getTime))
      import scala.jdk.CollectionConverters._
      val sizes = requests.asScala.toSeq.map(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt(-1))
      assert(sizes.forall(_ === 0),
        s"a pushed COUNT must be answered by size-0 probes alone, sizes=$sizes")
      val plan = filtered.groupBy().count().queryExecution.executedPlan.toString
      assert(plan.contains("count(*) via track_total_hits probe"), plan)
    } finally server.stop(0)
  }

  test("COUNT pushdown falls back wherever the probe's semantics could diverge from the row scan") {
    val docs = (0 until 12).map(i =>
      Doc(s"f$i", s"s${i % 2}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      import scala.jdk.CollectionConverters._
      def pagedRequests(): Int = requests.asScala.count(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt(-1) > 0)
      // a signal filter changes the row set (exists clauses): must row-scan
      requests.clear()
      val withSignals = spark.read.format("graft-status-live")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("batchSize", "7").option("signals", "Vehicle.Speed").load()
      assert(withSignals.count() >= 0 && pagedRequests() > 0,
        "signals set: the count must come from the decoded rows")
      // an IsNotNull conjunct is enforced client-side: must row-scan
      requests.clear()
      assert(liveDf(server).where(col("subject").isNotNull).count() === 12)
      assert(pagedRequests() > 0, "IsNotNull: the count must come from the decoded rows")
      // a capped (non-eq) total: the probe rejects itself, row scan answers
      requests.clear()
      val capped = startStub(docs, new ConcurrentLinkedQueue[String](), exactTotals = false)
      try assert(spark.read.format("graft-status-live")
        .option("url", s"http://127.0.0.1:${capped.getAddress.getPort}")
        .option("batchSize", "7").load().count() === 12)
      finally capped.stop(0)
    } finally server.stop(0)
  }

  test("wire shape surfaces as scan metrics: pages fetched, docs shipped") {
    val good = (0 until 20).map(i => Doc(s"m$i", "s0", 1704000000000L + i * 1000L, i * 1.0))
    val server = startStub(good, new ConcurrentLinkedQueue[String]())
    try {
      val df = liveDf(server, batchSize = 6).where(col("subject") === "s0").select("id")
      assert(df.collect().length === 20)
      val scan = df.queryExecution.executedPlan.collectLeaves()
        .find(_.getClass.getSimpleName == "BatchScanExec").get
      assert(scan.metrics.contains("skippedLines"), s"metrics: ${scan.metrics.keys}")
      val pages = scan.metrics("livePages").value
      val docs = scan.metrics("liveDocs").value
      assert(pages >= 4, s"20 docs at page size 6 must take several round trips, got $pages")
      assert(docs >= 20, s"every served doc counts (boundary overlap may add more): $docs")
      assert(docs - 20 >= 0 && docs - 20 <= pages,
        s"the overlap overhead is at most one re-served boundary doc per page: $docs docs / $pages pages")
    } finally server.stop(0)
  }

  test("pushed limit and top-K bound the wire: size = K, DESC loops stop at their first K lines") {
    val docs = (0 until 40).map(i =>
      Doc(s"k$i", s"s${i % 2}", 1704000000000L + i * 1000L, i * 1.0))
    val requests = new ConcurrentLinkedQueue[String]()
    val server = startStub(docs, requests)
    try {
      val df = liveDf(server, batchSize = 100)
        .where(col("subject").isin("s0", "s1"))
        .select("id", "subject", "time")
      // DESC top-3 across both subjects: the global TakeOrdered merges the
      // per-loop top-3s; each loop requested ONE page of size 3
      val top = df.orderBy(col("time").desc).limit(3).collect().map(_.getString(0))
      assert(top.toSeq === Seq("k39", "k38", "k37"))
      import scala.jdk.CollectionConverters._
      // size-0 entries are the scan's statistics probe (hits.total)
      val sizes = requests.asScala.toSeq.map(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt()).filter(_ != 0)
      assert(sizes === Seq(3, 3),
        s"one size-3 request per subject loop (the reference's sort desc + size): $sizes")
      // file-source twin agrees
      val f = java.nio.file.Files.createTempFile("graft-es-topn", ".ndjson")
      java.nio.file.Files.writeString(f, docs.map(_.json).mkString("\n"))
      val fileTop = spark.read.format("graft-status").load(f.toString)
        .where(col("subject").isin("s0", "s1")).select("id", "subject", "time")
        .orderBy(col("time").desc).limit(3).collect().map(_.getString(0))
      assert(fileTop.toSeq === top.toSeq)

      // plain limit: per-partition early stop, pages of (at most) limit
      requests.clear()
      val lim = df.limit(5).collect()
      assert(lim.length === 5)
      assert(requests.asScala.forall(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt() <= 5))

      // ASC top-K stays correct (heap path; no early loop stop, full pages)
      requests.clear()
      val asc = df.orderBy(col("time").asc).limit(2).collect().map(_.getString(0))
      assert(asc.toSeq === Seq("k0", "k1"))
      assert(requests.asScala.map(r =>
        mapper.readTree(r.split("\n", 2)(1)).path("size").asInt()).filter(_ != 0)
        .forall(_ === 100),
        "an ASC top-K must keep full-size pages (it reads its whole window)")
    } finally server.stop(0)
  }

  test("a pushed subject IN-set fans out one task per subject (the per-token goroutine, as tasks)") {
    val docs = (0 until 12).map(i =>
      Doc(s"p$i", s"s${i % 3}", 1704000000000L + i * 1000L, i * 1.0))
    val server = startStub(docs, new ConcurrentLinkedQueue[String]())
    try {
      val df = liveDf(server).where(col("subject").isin("s0", "s1", "s2"))
        .select("id", "subject")
      assert(df.rdd.getNumPartitions === 3,
        "one live page loop per subject, in parallel")
      assert(df.collect().length === 12)
    } finally server.stop(0)
  }
}
