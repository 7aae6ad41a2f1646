package graft.queries

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Declared queries through the LIVE wire clients — the network half of
  * the reference's sync loop, gate-checked end to end with no socket
  * leaving the machine: a loopback stub implements enough of the
  * Elasticsearch `_search` API (bool.filter match/range, size, sort time
  * desc — exactly the request shape [[graft.sources.EsQueryDsl]] emits and
  * elastic.go:46-108 [ext] sends) and is seeded deterministically from the
  * `events` table, so DuckDB over the same table is the oracle. The read
  * runs the REAL client stack: `graft-status-live` → one paged `_search`
  * loop per subject (the reference's per-token fan-out, as Spark tasks) →
  * [[graft.sources.EsHttpClient]]'s boundary-overlap pagination → the
  * common NDJSON decode path.
  */
object LiveQueries {

  /** Loopback HttpServer factory for every stub (gate rows, specs,
    * probes). Sets `sun.net.httpserver.nodelay` BEFORE the server class
    * loads: without it the JDK HttpServer leaves Nagle on, and every
    * small response with a body pays the classic 40 ms
    * Nagle×delayed-ACK stall — a test-double artifact (a real
    * Elasticsearch/ClickHouse sets TCP_NODELAY) that was inflating every
    * driver-side round trip ~17× (45 ms → 2.7 ms measured). The property
    * is read once at the server class's static init, so it must be set
    * by the FIRST creator — which is why all stubs go through here.
    */
  private[graft] def loopbackServer(backlog: Int = 0): HttpServer = {
    System.setProperty("sun.net.httpserver.nodelay", "true")
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), backlog)
  }

  /** One stub-corpus document. `signalJson` — the `_source` a real ES
    * would return under the reference's signal projection
    * (`_source.includes`), or None when the doc carries NONE of the
    * requested signals (the `exists` + `minimum_should_match: 1` clauses
    * drop it server-side). Both precomputed at seed time so the stub
    * stays a lookup, not a per-request JSON walk.
    */
  private[graft] final case class StubDoc(id: String, subject: String, timeUs: Long,
      json: String, signalJson: Option[String] = None)

  /** Minimal `_search` stub over a fixed corpus. Honors the pushed
    * filters + size + desc sort, and — when the request carries the
    * reference's signal-filter clauses — the `exists`/`minimum_should_
    * match` row filter and the `_source.includes` projection.
    * `requireSignalClauses` makes the stub REJECT (400) any search
    * missing them: the gate row then fails loudly if the projection
    * pushdown ever regresses to full `_source`. Daemon-pooled executor;
    * the caller stops it.
    */
  private[graft] def startStub(docs: IndexedSeq[StubDoc],
      requireSignalClauses: Boolean = false,
      served: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong,
      sizeCap: Int = Int.MaxValue,
      pitMode: Boolean = false,
      sliceSeen: java.util.concurrent.ConcurrentLinkedQueue[Int] =
        new java.util.concurrent.ConcurrentLinkedQueue[Int](),
      pitOpened: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong,
      pitTransientFailures: Int = 0,
      slicedSubjects: java.util.concurrent.ConcurrentLinkedQueue[String] =
        new java.util.concurrent.ConcurrentLinkedQueue[String](),
      servedSliced: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong,
      pitClosedIds: java.util.concurrent.ConcurrentLinkedQueue[String] =
        new java.util.concurrent.ConcurrentLinkedQueue[String](),
      servedSlicedAtFirstClose: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong(-1),
      timeCutsMode: Boolean = true,
      msearchMode: Boolean = true,
      msearchRequests: java.util.concurrent.atomic.AtomicLong =
        new java.util.concurrent.atomic.AtomicLong): HttpServer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val pitSeq = new java.util.concurrent.atomic.AtomicLong()
    // ids actually ISSUED: a search under an unknown PIT id is a 400,
    // like a real ES ("No search context found") — pins that every slice
    // rides the DRIVER's shared snapshot, not a homemade id
    val issuedPits = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pitFails = new java.util.concurrent.atomic.AtomicInteger(pitTransientFailures)
    val server = loopbackServer(1024)
    val tf = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "live-es-stub"); t.setDaemon(true); t
      }
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32, tf))
    // the stub's own inverted index: docs pre-bucketed by subject and
    // pre-sorted newest-first, so a per-subject page request costs its
    // bucket, not a corpus scan (a real ES does at least this well)
    val bySubject: Map[String, IndexedSeq[StubDoc]] =
      docs.groupBy(_.subject).view.mapValues(
        _.sortBy(d => (-d.timeUs, d.id))).toMap
    val allSorted = docs.sortBy(d => (-d.timeUs, d.id))
    // the search_after drain grammar reads `_id` ascending
    lazy val bySubjectId: Map[String, IndexedSeq[StubDoc]] =
      docs.groupBy(_.subject).view.mapValues(_.sortBy(_.id)).toMap
    lazy val allById = docs.sortBy(_.id)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        if (ex.getRequestURI.getPath.contains("/_stats")) {
          // the sizing probe (GET {index}/_stats/docs,store): primaries
          // doc count + stored bytes — deterministic from the corpus, and
          // carrying ZERO hits (the served counter must not move)
          val bytes0 = docs.iterator.map(_.json.length.toLong).sum
          val res = s"""{"_all":{"primaries":{"docs":{"count":${docs.length}},""" +
            s""""store":{"size_in_bytes":$bytes0}}}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        if (ex.getRequestURI.getPath.endsWith("/_pit") ||
          ex.getRequestURI.getPath == "/_pit") {
          // point-in-time lifecycle: offered only in pitMode (the ES 8
          // posture); a 404 makes the client fall back to the `_id` drain
          val pitBody = ex.getRequestBody.readAllBytes()
          if ("POST" == ex.getRequestMethod && pitMode) {
            if (pitFails.getAndDecrement() > 0) {
              // an injected transient blip: the client must RETRY (and
              // surface a task/planning failure if retries exhaust) —
              // never silently conclude "no PIT support"
              val b = """{"error":"stub transient overload"}"""
                .getBytes(StandardCharsets.UTF_8)
              ex.sendResponseHeaders(503, b.length)
              ex.getResponseBody.write(b)
              ex.close()
              return
            }
            pitOpened.incrementAndGet()
            val id = s"pit-${pitSeq.incrementAndGet()}"
            issuedPits.add(id)
            val b = s"""{"id":"$id"}""".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          } else if ("DELETE" == ex.getRequestMethod) {
            // the query-end release hook lands here: record WHICH id was
            // closed and how many sliced docs had been served by then —
            // a release firing before the last slice request would show
            // as a short tally (and the 400-on-unknown-pit search guard
            // above would fail any still-draining sibling loudly)
            val closedId = mapper.readTree(pitBody).path("id").asText("")
            pitClosedIds.add(closedId)
            // a real ES frees the search context: any later search under
            // this id is a search_context_missing 400
            issuedPits.remove(closedId)
            servedSlicedAtFirstClose.compareAndSet(-1L, servedSliced.get())
            val b = """{"succeeded":true}""".getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(200, b.length)
            ex.getResponseBody.write(b)
          } else ex.sendResponseHeaders(404, -1)
          ex.close()
          return
        }
        // the PIT-less drain's cut probe: time percentiles of the
        // matching docs (nearest-rank — any estimate is valid, cuts
        // only place window boundaries); size-0, zero hits served.
        // `timeCutsMode=false` drops to the generic handler, whose
        // agg-less response makes the client keep the single loop —
        // the graceful posture of a server without the aggregation.
        // Shared by the single `_search` form and each `_msearch` slot.
        def cutsAggResponse(req: com.fasterxml.jackson.databind.JsonNode): String = {
          var subj: Option[String] = None
          var gte: Option[Long] = None
          var lt: Option[Long] = None
          req.path("query").path("bool").path("filter").forEach { f =>
            val m = f.path("match").path("subject").path("query")
            if (m.isTextual) subj = Some(m.asText())
            val r = f.path("range").path("time")
            if (r.has("gte")) gte = Some(r.get("gte").asText().toLong)
            if (r.has("lt")) lt = Some(r.get("lt").asText().toLong)
          }
          // per-subject probes cost their bucket, not a corpus scan (same
          // inverted-index posture as the page handler)
          val probeBase = subj.map(s => bySubject.getOrElse(s, IndexedSeq.empty))
            .getOrElse(docs)
          val ms = probeBase.iterator
            .filter(d => subj.forall(_ == d.subject) &&
              gte.forall(d.timeUs / 1000 >= _) && lt.forall(d.timeUs / 1000 < _))
            .map(_.timeUs / 1000).toVector.sorted
          val vals = Seq.newBuilder[String]
          req.path("aggs").path("time_cuts").path("percentiles").path("percents").forEach { p =>
            val v =
              if (ms.isEmpty) "null"
              else ms(math.min(ms.size - 1,
                math.max(0, math.ceil(p.asDouble() / 100.0 * ms.size).toInt - 1))).toString
            vals += s"""{"key":${p.asDouble()},"value":$v}"""
          }
          s"""{"aggregations":{"time_cuts":{"values":[${vals.result().mkString(",")}]}},""" +
            s""""hits":{"hits":[]}}"""
        }
        if (ex.getRequestURI.getPath.endsWith("/_msearch")) {
          // the batched cut probe: NDJSON header/body pairs in, a
          // positionally-aligned `responses` array out — offered only
          // when the server has the percentiles agg at all; without
          // `_msearch` (msearchMode=false) a 404 sends the client to
          // per-request probes, like an older ES or a strict proxy
          if (!msearchMode || !timeCutsMode) {
            ex.sendResponseHeaders(404, -1)
            ex.close()
            return
          }
          msearchRequests.incrementAndGet()
          val lines = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            .split("\n").filter(_.nonEmpty)
          val resp = lines.grouped(2).map { pair =>
            val body = mapper.readTree(pair(1))
            if (body.path("aggs").has("time_cuts")) cutsAggResponse(body)
            else """{"error":{"type":"unsupported msearch body"}}"""
          }.mkString("""{"responses":[""", ",", "]}")
          val bytes = resp.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        val req = mapper.readTree(ex.getRequestBody.readAllBytes())
        if (req.path("aggs").has("time_cuts") && timeCutsMode) {
          val bytes = cutsAggResponse(req).getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        if (req.path("aggs").has("max_time")) {
          // the streaming tail's offset probe: size-0 max aggregation
          val v = if (docs.isEmpty) "null" else (docs.map(_.timeUs).max / 1000).toString
          val res = s"""{"aggregations":{"max_time":{"value":$v}},"hits":{"hits":[]}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        val size = req.path("size").asInt(10)
        if (size > sizeCap) {
          // a capped cluster: an over-sized page trips the circuit breaker
          // (the reference's halving trigger, sync.go:163-178)
          val err = """{"error":"circuit_breaking_exception: Data too large"}"""
          val bytes = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(500, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        var subject: Option[String] = None
        var subjectSet: Option[Set[String]] = None // `terms` membership clause
        var gteMs: Option[Long] = None
        var ltMs: Option[Long] = None
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
          if (r.has("gte")) gteMs = Some(r.get("gte").asText().toLong)
          if (r.has("lt")) ltMs = Some(r.get("lt").asText().toLong)
        }
        val idSort = req.path("sort").size() > 0 && req.path("sort").get(0).has("_id")
        val hasExists = req.path("query").path("bool").path("should").size() > 0 &&
          req.path("query").path("bool").path("minimum_should_match").asInt(0) >= 1
        val hasIncludes = req.path("_source").path("includes").size() > 0
        if (requireSignalClauses && !(hasExists && hasIncludes)) {
          // the assertion the gate row rides on: a request without the
          // reference's projection contract is refused outright
          val err = """{"error":"stub requires _source.includes + exists + minimum_should_match"}"""
          val bytes = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(400, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        val signalMode = hasExists && hasIncludes
        val pitReq = req.path("pit").path("id").isTextual
        if (pitReq && !pitMode) {
          val err = """{"error":"stub has no point-in-time support"}"""
          val bytes = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(400, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        if (idSort && pitMode) {
          // the real-ES 8 posture: sorting on _id needs fielddata — once
          // the server offers PITs, the client must drain on _shard_doc
          val err = """{"error":{"type":"illegal_argument_exception","reason":""" +
            """"Fielddata is disabled on [_id] in [device-status]"}}"""
          val bytes = err.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(400, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        if (pitReq) {
          // the _shard_doc drain: stable corpus position as the sort
          // value, cursor-exclusive; all pushed clauses still apply.
          // `slice: {id, max}` (the parallel-scan form) partitions docs
          // into disjoint subsets the way a real ES does server-side —
          // opaque to the client, modeled here as a hash of the doc id
          if (!issuedPits.contains(req.path("pit").path("id").asText(""))) {
            val err = """{"error":{"type":"search_context_missing_exception",""" +
              """"reason":"No search context found for id"}}"""
            val bytes = err.getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(400, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
            return
          }
          val after = Option(req.get("search_after")).filter(_.isArray)
            .map(_.get(0).asLong())
          val sliceNode = req.path("slice")
          val inSlice: StubDoc => Boolean =
            if (sliceNode.isObject) {
              val sid = sliceNode.path("id").asInt(0)
              val smax = math.max(1, sliceNode.path("max").asInt(1))
              sliceSeen.add(sid)
              subject.foreach(slicedSubjects.add) // hot-subject drains pin here
              d => math.floorMod(d.id.hashCode, smax) == sid
            } else _ => true
          // cursor-aware: the sort value IS the corpus position, so the
          // drain resumes AT the cursor instead of re-scanning from doc 0
          // every page (a real ES resumes from the PIT context the same
          // way; the old form made each drain O(corpus) PER PAGE)
          val startIdx = after.map(a => (a + 1).toInt.max(0)).getOrElse(0)
          val picked = Iterator.range(startIdx, docs.length)
            .map(i => (docs(i), i))
            .filter { case (d, i) =>
              subject.forall(_ == d.subject) &&
                subjectSet.forall(_.contains(d.subject)) &&
                gteMs.forall(d.timeUs / 1000 >= _) && ltMs.forall(d.timeUs / 1000 < _) &&
                (!signalMode || d.signalJson.isDefined) &&
                inSlice(d) &&
                after.forall(i > _)
            }.take(size).toSeq
          served.addAndGet(picked.size.toLong)
          // sliced-drain docs tracked separately: a hot subject's
          // exactly-once-across-slices pin needs the sliced tally alone
          // (cold loops legitimately re-serve page-boundary docs)
          if (sliceNode.isObject) servedSliced.addAndGet(picked.size.toLong)
          val hits = picked.map { case (d, i) =>
            val src = if (signalMode) d.signalJson.get else d.json
            s"""{"_index":"device-status","_id":"${d.id}","_source":$src,"sort":[$i]}"""
          }
          val res = s"""{"hits":{"hits":[${hits.mkString(",")}]}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        val base =
          if (idSort) {
            // the search_after drain grammar: `_id` ascending within the
            // window, cursor-exclusive. The bucket is sorted by `_id`, so
            // the cursor position binary-searches instead of rescanning
            // the bucket head every page (what a real ES's search_after
            // does against the index); the original `id > after` filter
            // stays on as the exactness check.
            val arr = subject.map(s => bySubjectId.getOrElse(s, IndexedSeq.empty))
              .getOrElse(allById)
            val after = Option(req.get("search_after")).filter(_.isArray)
              .map(_.get(0).asText())
            val from = after match {
              case Some(a) =>
                var lo = 0; var hi = arr.length
                while (lo < hi) { val m = (lo + hi) >>> 1; if (arr(m).id > a) hi = m else lo = m + 1 }
                lo
              case None => 0
            }
            Iterator.range(from, arr.length).map(arr(_))
              .filter(d => after.forall(d.id > _))
          } else {
            // newest-first buckets are sorted by (-timeUs, id) and the
            // pushed window is a half-open [gte, lt) on epoch-millis —
            // monotone along the sort — so both window edges binary-search
            // to a slice (the index lookup a real ES does); the original
            // per-doc window filter stays on as the exactness check.
            val arr = subject.map(s => bySubject.getOrElse(s, IndexedSeq.empty))
              .getOrElse(allSorted)
            def firstIdxBelow(bound: Long): Int = {
              var lo = 0; var hi = arr.length
              while (lo < hi) { val m = (lo + hi) >>> 1; if (arr(m).timeUs / 1000 < bound) hi = m else lo = m + 1 }
              lo
            }
            val from = ltMs.map(firstIdxBelow).getOrElse(0)
            val end = gteMs.map(firstIdxBelow).getOrElse(arr.length)
            Iterator.range(from, end).map(arr(_))
          }
        val matched = base
          .filter { d =>
            gteMs.forall(d.timeUs / 1000 >= _) && ltMs.forall(d.timeUs / 1000 < _) &&
              subjectSet.forall(_.contains(d.subject)) &&
              (!signalMode || d.signalJson.isDefined)
          }
        if (req.path("aggs").has("group_counts")) {
          // the grouped-count probe: a size-0 terms aggregation — buckets
          // by doc_count desc (key asc on ties, real-ES order), capped at
          // the requested terms size with the spill reported in
          // sum_other_doc_count (single shard ⇒ error bound 0)
          val terms = req.path("aggs").path("group_counts").path("terms")
          if (terms.path("field").asText("") != "subject") {
            val err = """{"error":"stub terms aggregation supports field subject only"}"""
            val bytes = err.getBytes(StandardCharsets.UTF_8)
            ex.sendResponseHeaders(400, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
            return
          }
          val tsize = terms.path("size").asInt(10)
          val grouped = matched.toSeq.groupBy(_.subject).view.mapValues(_.size).toSeq
          val taken = grouped.sortBy { case (k, n) => (-n, k) }.take(tsize)
          val other = grouped.map(_._2).sum - taken.map(_._2).sum
          val buckets = taken.map { case (k, n) => s"""{"key":"$k","doc_count":$n}""" }
            .mkString(",")
          val res = s"""{"aggregations":{"group_counts":{"doc_count_error_upper_bound":0,""" +
            s""""sum_other_doc_count":$other,"buckets":[$buckets]}},"hits":{"hits":[]}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        if (size == 0) {
          // the stats probe: hits.total for the pushed-filter state
          val res = s"""{"hits":{"total":{"value":${matched.size},"relation":"eq"},"hits":[]}}"""
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
          return
        }
        val hits = matched
          .take(size).toSeq
          .map { d =>
            val src = if (signalMode) d.signalJson.get else d.json
            s"""{"_index":"device-status","_id":"${d.id}","_source":$src}"""
          }
        served.addAndGet(hits.size.toLong)
        val res = s"""{"hits":{"hits":[${hits.mkString(",")}]}}"""
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

  /** Minimal stateful ClickHouse-HTTP stub: enforces DDL-before-INSERT,
    * stores every CSV insert batch, and answers exactly three statement
    * shapes — the reference's two literal reads (`tokenIdsSql`,
    * `oldestSignalSql`) plus one integrity aggregate. Rows live in a
    * concurrent queue (executor partitions POST in parallel).
    */
  private[graft] def startChStub(): (HttpServer, java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]) = {
    // (token_id, timestamp-as-sent, name, value_cents)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String, Long)]()
    val created = new java.util.concurrent.atomic.AtomicBoolean(false)
    // a real ClickHouse serves point reads from its primary-key index, not
    // a full scan per query — the stub memoizes a per-token index, rebuilt
    // lazily after inserts (1500 oldest-signal probes × 100k rows would
    // otherwise be 150M queue traversals and dominate the gate's wall)
    val dirty = new java.util.concurrent.atomic.AtomicBoolean(true)
    @volatile var byToken: Map[Long, IndexedSeq[(Long, String, String, Long)]] = Map.empty
    def index(): Map[Long, IndexedSeq[(Long, String, String, Long)]] = {
      if (dirty.getAndSet(false)) {
        import scala.jdk.CollectionConverters._
        byToken = rows.asScala.toIndexedSeq.groupBy(_._1)
      }
      byToken
    }
    val server = loopbackServer(1024)
    val tf = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "live-ch-stub"); t.setDaemon(true); t
      }
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32, tf))
    val oldestRe = java.util.regex.Pattern.compile(
      "SELECT `timestamp` FROM `signal` WHERE `token_id` = (\\d+) " +
        "ORDER BY `timestamp` ASC LIMIT 1 FORMAT TabSeparated\\s*")
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val q = Option(ex.getRequestURI.getRawQuery).flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith("query=") =>
            java.net.URLDecoder.decode(kv.substring(6), "UTF-8")
        }).getOrElse("")
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        import scala.jdk.CollectionConverters._
        if (q.startsWith("INSERT INTO `signal`")) {
          if (!created.get()) { respond(ex, 400, "Table signal does not exist"); return }
          // CSV: token,(epoch decimal),("quoted name"|empty),cents
          body.split("\n").iterator.filter(_.nonEmpty).foreach { line =>
            val m = java.util.regex.Pattern
              .compile("^(\\d+),([0-9.]+),(?:\"((?:[^\"]|\"\")*)\")?,(-?\\d+)$").matcher(line)
            require(m.matches(), s"stub cannot parse CSV line: $line")
            rows.add((m.group(1).toLong, m.group(2),
              Option(m.group(3)).map(_.replace("\"\"", "\"")).getOrElse(""),
              m.group(4).toLong))
          }
          dirty.set(true)
          respond(ex, 200, "")
        } else if (body.startsWith("CREATE TABLE")) {
          created.set(true); respond(ex, 200, "")
        } else if (body.startsWith("SELECT DISTINCT `token_id` FROM `signal`")) {
          val ids = index().keys.toSeq.sorted
          respond(ex, 200, ids.mkString("", "\n", if (ids.isEmpty) "" else "\n"))
        } else if (body.startsWith("SELECT `timestamp` FROM `signal` WHERE")) {
          val m = oldestRe.matcher(body)
          if (!m.matches()) { respond(ex, 400, s"unsupported statement: $body"); return }
          val tok = m.group(1).toLong
          val oldest = index().get(tok).flatMap(_.map(_._2).minByOption(BigDecimal(_)))
          respond(ex, 200, oldest.map(_ + "\n").getOrElse(""))
        } else if (body.startsWith("SELECT `token_id`, count(), sum(`value_cents`)")) {
          val agg = index().toSeq.sortBy(_._1)
            .map { case (tok, rs) => s"$tok\t${rs.size}\t${rs.map(_._4).sum}" }
          respond(ex, 200, agg.mkString("", "\n", if (agg.isEmpty) "" else "\n"))
        } else respond(ex, 400, s"unsupported statement: $q$body")
      }
    })
    server.start()
    (server, rows)
  }

  def defs: Seq[QueryDef] = Seq(

    // ── LIVE per-device sync read, gate-declared (r11): seed the stub
    //    cluster from `events` (one CloudEvents status doc per non-null-ts
    //    event, epoch-micro times in RFC3339, cents as the payload
    //    signal), push the full subject census as an IN-set (one paged
    //    `_search` loop PER SUBJECT — sync.go:60-84's goroutine fan-out as
    //    tasks), decode through the common NDJSON path, and aggregate the
    //    envelope + payload per subject. `localCheckpoint` materializes
    //    through the live stack before the stub stops; the driver's write
    //    then reads the checkpoint blocks. Any pagination loss/dup, time
    //    decode drift, or payload corruption breaks the DuckDB match.
    QueryDef(
      "q212_live_es_read",
      (s, d) => {
        // this collect() seeds the TEST DOUBLE (the stub cluster's corpus),
        // not the query path — the measured read runs through the DSv2
        // live source and the HTTP client below
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect()
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            val json =
              s"""{"id":"e$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"vehicle":{"cents":$cents}}}"""
            StubDoc(s"e$i", subj, tsu, json)
          }
        val subjects = docs.map(_.subject).distinct.sorted
        val server = startStub(docs)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .load()
            .where(col("subject").isin(subjects: _*))
            .select(col("subject"), expr("unix_micros(time)").as("tsu"),
              get_json_object(col("data"), "$.vehicle.cents").cast(LongType).as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"),
              min(col("tsu")).as("oldest_us"),
              max(col("tsu")).as("newest_us"),
              sum(col("cents")).as("cents"))
          live.localCheckpoint(true) // materialize THROUGH the live stack
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS VARCHAR) AS subject,
               count(*)::BIGINT AS n_docs,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE read under the reference's SIGNAL FILTER (r12): the
    //    `signals` option maps the configured VSS names to
    //    `data.<originalName>` fields (sync.go:236-256) and the request
    //    body carries `_source.includes` + `exists` should-clauses +
    //    `minimum_should_match: 1` (elastic.go:67-78). The stub REFUSES
    //    (400) any search missing those clauses — if the projection
    //    pushdown regresses to full `_source`, this row errors rather than
    //    silently matching — and serves the PROJECTED `_source` for docs
    //    carrying the signal, dropping the rest server-side. Docs with
    //    `value < 50` carry no `speed` field (the exists filter's prey);
    //    docs with it also carry a `make` field the projection must strip,
    //    pinned by `n_make = 0` in the oracle.
    QueryDef(
      "q213_live_es_projection",
      (s, d) => {
        // collect() seeds the TEST DOUBLE; the measured read is the DSv2
        // live source with signals=Vehicle.Speed below
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"),
            (col("value") >= 50.0).as("has_speed"))
          .collect()
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents, hasSpeed) =
              (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            val envelope =
              s""""id":"e$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status""""
            val data = if (hasSpeed) s"""{"speed":$cents,"make":"Ford"}""" else """{"make":"Audi"}"""
            StubDoc(s"e$i", subj, tsu, s"""{$envelope,"data":$data}""",
              signalJson =
                if (hasSpeed) Some(s"""{$envelope,"data":{"speed":$cents}}""") else None)
          }
        val subjects = docs.map(_.subject).distinct.sorted
        val server = startStub(docs, requireSignalClauses = true)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .option("signals", "Vehicle.Speed")
            .load()
            .where(col("subject").isin(subjects: _*))
            .select(col("subject"), expr("unix_micros(time)").as("tsu"),
              get_json_object(col("data"), "$.speed").cast(LongType).as("speed"),
              get_json_object(col("data"), "$.make").as("make"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("speed")).as("speed_sum"),
              max(col("tsu")).as("newest_us"),
              count(col("make")).as("n_make")) // projection strips make ⇒ 0
          live.localCheckpoint(true) // materialize THROUGH the live stack
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS VARCHAR) AS subject,
               count(*)::BIGINT AS n_docs,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS speed_sum,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us,
               (count(*) * 0)::BIGINT AS n_make
             FROM events
             WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value >= 50
             GROUP BY 1""")
    ),

    // ── LIVE ClickHouse WRITE, gate-declared (r12) — the write twin of
    //    q212 (clickhouse.go:113-130): DDL over the wire, then the
    //    DISTRIBUTED insert (each of 8 partitions POSTs its own CSV batch
    //    from the executor, timestamps as zone-independent epoch
    //    decimals), then read-back through the reference's LITERAL
    //    statements — `tokenIdsSql` once, `oldestSignalSql` per token (the
    //    sync loop's own per-token cadence, clickhouse.go:65-87) — plus
    //    one integrity aggregate so a lost or duplicated CSV row anywhere
    //    in the fan-out breaks the DuckDB match. The stub enforces
    //    DDL-before-INSERT like a real server.
    QueryDef(
      "q214_live_ch_write",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(LongType).as("value_cents"))
          .repartition(8) // the distributed insert fan-out under test
        val (server, _) = startChStub()
        try {
          val clientUrl = s"http://127.0.0.1:${server.getAddress.getPort}"
          val client = new ClickHouseHttpClient(clientUrl)
          client.execute(ClickHouseDdl.signalTableDdl(StructType(Seq(
            StructField("token_id", LongType, nullable = false),
            StructField("timestamp", TimestampType, nullable = false),
            StructField("name", StringType, nullable = false),
            StructField("value_cents", LongType, nullable = false)))))
          // executors POST CSV batches; the JOB-identity tag (sink table +
          // window) makes a re-submitted identical run dedup end-to-end,
          // not just its own task retries
          client.insertSignals(signals, "signal",
            runTag = Some(ClickHouseHttpClient.jobRunTag("signal", "q214-full-window")))
          // read-back: the reference's literal statements, driver-side —
          // exactly the sync loop's shape (one DISTINCT scan, then one
          // oldest-signal probe per token)
          val tokens = client.query(ClickHouseHttpClient.tokenIdsSql()).map(_(0).toLong)
          // the reference's per-token probes run CONCURRENTLY (its workers
          // are 25-100 goroutines, deviceapi/service.go + sync fan-out);
          // a serial loop here measured ~1.5 s of pure request latency at
          // 1500 tokens (r18). Bounded pool, one probe per token — the
          // statement grammar and count are unchanged.
          val pool = java.util.concurrent.Executors.newFixedThreadPool(25)
          val oldestUs: Map[Long, Long] =
            try tokens.map { tok =>
              tok -> pool.submit(new java.util.concurrent.Callable[Long] {
                override def call(): Long = {
                  val ts = client
                    .query(ClickHouseHttpClient.oldestSignalSql(tok, Seq.empty)).head(0)
                  (BigDecimal(ts) * 1000000).toLongExact
                }
              })
            }.map { case (tok, f) => tok -> f.get() }.toMap
            finally pool.shutdown()
          val agg: Map[Long, (Long, Long)] = client.query(
            "SELECT `token_id`, count(), sum(`value_cents`) FROM `signal` GROUP BY `token_id`")
            .map(r => r(0).toLong -> (r(1).toLong, r(2).toLong)).toMap
          val rows = tokens.sorted.map { tok =>
            org.apache.spark.sql.Row(tok, oldestUs(tok), agg(tok)._1, agg(tok)._2)
          }
          s.createDataFrame(
            new java.util.ArrayList[org.apache.spark.sql.Row](
              scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
            StructType(Seq(
              StructField("token_id", LongType, nullable = false),
              StructField("oldest_us", LongType, nullable = false),
              StructField("n_rows", LongType, nullable = false),
              StructField("cents", LongType, nullable = false))))
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1""")
    ),

    // ── The FULL reference pipeline OVER THE WIRE, gate-declared (r12):
    //    two sync rounds through `graft-status-live` → SyncJob watermarks
    //    → signal explosion → partitioned parquet sink (sync.go:92-125).
    //    Round 1's live cluster holds only the NEWER half of history
    //    (split at the events midpoint); the backfill then appears and
    //    round 2 must fetch ONLY strictly below each token's
    //    oldest-synced watermark — any re-fetch duplicates rows, any
    //    watermark overshoot loses them, and either breaks the DuckDB
    //    match on the final sink (which must equal one explosion of the
    //    whole events table: 2 signals per doc, exactly once).
    QueryDef(
      "q215_live_sync_e2e",
      (s, d) => {
        import graft.jobs.{SyncJob, SyncOptions}
        import graft.sources.{DeviceDim, SignalSink}
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val mid = {
          val ts = evs.map(_.getLong(1))
          (ts.min + ts.max) / 2
        }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"e$subj-$tsu-$i", subj, tsu,
              s"""{"id":"e$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status","data":{"speed":$cents,"make":"m"}}""")
          }
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) >= mid)
        val tokens = evs.map(_.getString(0)).distinct.sorted
        val dim = DeviceDim.identityDim(s, tokens.map(_.toLong).toSeq.sorted)
        val opts = SyncOptions(tokens = tokens.toSeq,
          start = Some(new java.sql.Timestamp(0L)),
          stop = Some(new java.sql.Timestamp(9999999999999L)))
        val sinkDir = java.nio.file.Files
          .createTempDirectory("graft-q215-sink").resolve("signals").toString
        def url(server: HttpServer) = s"http://127.0.0.1:${server.getAddress.getPort}"
        // round 1: the live cluster knows only the newer half
        val server1 = startStub(mkDocs(newer))
        try {
          val round1 = SyncJob.runLive(s, url(server1), dim, existingSink = None,
            opts, batchSize = 2000)
          SignalSink.appendParquet(round1, sinkDir, buckets = 8)
        } finally server1.stop(0)
        // round 2: the backfill appeared; resume strictly below watermarks —
        // runLive pushes each token's watermark as its request window's
        // exclusive stop (sync.go:96-100), so only the unsynced prefix
        // crosses the wire
        val server2 = startStub(mkDocs(newer ++ older))
        try {
          val sink1 = SignalSink.readParquet(s, sinkDir)
          val round2 = SyncJob.runLive(s, url(server2), dim, existingSink = Some(sink1),
            opts, batchSize = 2000)
          SignalSink.appendParquet(round2, sinkDir, buckets = 8)
        } finally server2.stop(0)
        // the final sink: aggregate reads parquet, no live dependency left
        SignalSink.readParquet(s, sinkDir)
          .groupBy(col("tokenId").as("token_id"))
          .agg(count(lit(1)).as("n_signals"),
            sum(when(col("name") === "Vehicle.Speed", col("valueNumber"))
              .otherwise(lit(0.0))).cast(LongType).as("speed_sum"),
            expr("min(unix_micros(timestamp))").as("oldest_us"),
            expr("max(unix_micros(timestamp))").as("newest_us"))
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               (count(*) * 2)::BIGINT AS n_signals,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS speed_sum,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1""")
    ),

    // ── LIVE ClickHouse READ source (r12): `graft-signal-live` compiles
    //    its pushdowns to CH SQL over HTTP — name filter + column pruning
    //    into the WHERE/SELECT, the grouped COUNT/SUM/MIN as PARTIAL
    //    aggregates the server answers per token range (Spark's retained
    //    final agg merges) — against a stub that 400s anything outside
    //    the declared grammar, so a regression to unpushed scans fails
    //    loudly. The store is seeded by the DISTRIBUTED CSV write
    //    (clickhouse.go:113-130), making this the full write→read wire
    //    round trip; value_number carries integral cents so the pushed
    //    SUM is order-independent.
    QueryDef(
      "q216_live_ch_scan",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val server = ChSignalStub.start()
        try {
          val url = s"http://127.0.0.1:${server.getAddress.getPort}"
          val client = new ClickHouseHttpClient(url)
          client.execute(ClickHouseDdl.signalTableDdl(StructType(Seq(
            StructField("token_id", LongType, nullable = false),
            StructField("timestamp", TimestampType, nullable = false),
            StructField("name", StringType, nullable = false),
            StructField("value_number", DoubleType, nullable = true),
            StructField("value_string", StringType, nullable = true)))))
          // the DSv2 writer (q214 gates the function-form insertSignals,
          // this row gates the idiomatic df.write form)
          signals.write.format("graft-signal-live").option("url", url)
            .mode("append").save()
          // plain-COLUMN aggregates so the pushdown fires (min over an
          // expression would block it); the micros conversion is a
          // post-aggregation projection
          val agg = s.read.format("graft-signal-live")
            .option("url", url).option("partitions", "8").load()
            .where(col("name").isin("click", "purchase", "view"))
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              min(col("timestamp")).as("t0"))
            .select(col("token_id"), col("n_rows"), col("cents"),
              expr("unix_micros(t0)").as("oldest_us"))
          agg.localCheckpoint(true) // materialize THROUGH the live stack
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us
             FROM events
             WHERE ts IS NOT NULL AND user_id IS NOT NULL
               AND event_type IN ('click','purchase','view')
             GROUP BY 1""")
    ),

    // ── LIVE streaming tail, gate-declared (r12): `readStream` over
    //    `graft-status-live` — the CONTINUOUS form of the reference's
    //    cron sync. Offsets are the server's own max event time; phase 1
    //    tails a cluster holding only the OLDER half of history into a
    //    parquet sink, then the stream restarts from its checkpoint
    //    against a cluster holding everything and must read ONLY the
    //    newer half (a re-read duplicates, an offset overshoot loses —
    //    either breaks the oracle on the final sink, which must be
    //    exactly one pass over the whole events table). The forward tail
    //    pairs with q215's watermark BACKFILL: together they are the
    //    reference deployment's two sync directions.
    QueryDef(
      "q217_live_stream_tail",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is the stream
        val mid = { val ts = evs.map(_.getLong(1)); (ts.min + ts.max) / 2 }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"t$subj-$tsu-$i", subj, tsu,
              s"""{"id":"t$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        // split on a MILLISECOND boundary: offsets are ms-granular, so the
        // two halves must not share a millisecond (the phase-2 floor is
        // olderMaxMs + 1)
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) / 1000 >= mid / 1000)
        val outDir = java.nio.file.Files
          .createTempDirectory("graft-q217-out").toString + "/tail"
        val ckpt = java.nio.file.Files.createTempDirectory("graft-q217-ck").toString
        def tailOnce(docs: IndexedSeq[StubDoc]): Unit = {
          val server = startStub(docs)
          try {
            val q = s.readStream.format("graft-status-live")
              .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
              .option("batchSize", "2000").load()
              .select(col("subject"), expr("unix_micros(time)").as("tsu"),
                get_json_object(col("data"), "$.cents").cast(LongType).as("cents"))
              .writeStream.format("parquet")
              .option("path", outDir).option("checkpointLocation", ckpt)
              .start()
            try q.processAllAvailable() finally q.stop()
          } finally server.stop(0)
        }
        tailOnce(mkDocs(older))          // phase 1: the older half
        tailOnce(mkDocs(older ++ newer)) // phase 2: restart; only the newer half arrives
        s.read.parquet(outDir)
          .groupBy(col("subject"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("cents")).as("cents"),
            min(col("tsu")).as("oldest_us"),
            max(col("tsu")).as("newest_us"))
      },
      Some("""SELECT CAST(user_id AS VARCHAR) AS subject,
               count(*)::BIGINT AS n_docs,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1""")
    ),

    // ── The reference's FULL configuration over the wire (r12):
    //    SIGNAL_NAMES set (sync.go:236-256) + two-round watermark resume —
    //    every request carries BOTH the signal projection
    //    (`_source.includes` + `exists` + msm, which the stub REQUIRES)
    //    AND the per-token windows; the sink's watermarks are computed
    //    over the configured signal only (SyncOps.watermarks wmNames),
    //    and the explode extracts exactly that signal (1 row/doc — the
    //    projection stripped everything else, so even a wrong-field
    //    extraction has nothing to find). Oracle: one pass over events,
    //    one signal per doc.
    QueryDef(
      "q218_live_sync_signals",
      (s, d) => {
        import graft.jobs.{SyncJob, SyncOptions}
        import graft.sources.{DeviceDim, SignalSink}
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val mid = { val ts = evs.map(_.getLong(1)); (ts.min + ts.max) / 2 }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            val envelope =
              s""""id":"g$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status""""
            StubDoc(s"g$subj-$tsu-$i", subj, tsu,
              s"""{$envelope,"data":{"speed":$cents,"make":"m"}}""",
              signalJson = Some(s"""{$envelope,"data":{"speed":$cents}}"""))
          }
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) / 1000 >= mid / 1000)
        val tokens = evs.map(_.getString(0)).distinct.sorted
        val dim = DeviceDim.identityDim(s, tokens.map(_.toLong).toSeq.sorted)
        val opts = SyncOptions(tokens = tokens.toSeq,
          signalNames = Seq("Vehicle.Speed"),
          start = Some(new java.sql.Timestamp(0L)),
          stop = Some(new java.sql.Timestamp(9999999999999L)))
        val sinkDir = java.nio.file.Files
          .createTempDirectory("graft-q218-sink").resolve("signals").toString
        def syncRound(docs: IndexedSeq[StubDoc],
            sink: Option[org.apache.spark.sql.DataFrame]): Unit = {
          // requireSignalClauses: a request WITHOUT the projection is 400
          val server = startStub(docs, requireSignalClauses = true)
          try {
            val out = SyncJob.runLive(s,
              s"http://127.0.0.1:${server.getAddress.getPort}", dim, sink, opts,
              batchSize = 2000)
            SignalSink.appendParquet(out, sinkDir, buckets = 8)
          } finally server.stop(0)
        }
        syncRound(mkDocs(newer), None)
        syncRound(mkDocs(newer ++ older), Some(SignalSink.readParquet(s, sinkDir)))
        SignalSink.readParquet(s, sinkDir)
          .groupBy(col("tokenId").as("token_id"))
          .agg(count(lit(1)).as("n_signals"),
            sum(col("valueNumber")).cast(LongType).as("speed_sum"),
            expr("min(unix_micros(timestamp))").as("oldest_us"))
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_signals,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS speed_sum,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE ClickHouse ROW SCAN, streamed (r13): the unaggregated read
    //    path — name-IN filter and column pruning compile into the CH
    //    SELECT (grammar-policed by the stub), and every matching ROW
    //    crosses the wire into Spark through `queryStream`
    //    (BodyHandlers.ofLines): the response is consumed incrementally
    //    off the socket, never materialized per partition — the
    //    reference's `rows.Next()` posture (clickhouse.go:79-84), and the
    //    r12 verdict's one scale hazard, closed. Row-level result (one
    //    output row per signal row) so any lost/duplicated/corrupted wire
    //    row breaks the DuckDB hash directly.
    QueryDef(
      "q219_live_ch_row_scan",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val server = ChSignalStub.start()
        try {
          val url = s"http://127.0.0.1:${server.getAddress.getPort}"
          val client = new ClickHouseHttpClient(url)
          client.execute(ClickHouseDdl.signalTableDdl(StructType(Seq(
            StructField("token_id", LongType, nullable = false),
            StructField("timestamp", TimestampType, nullable = false),
            StructField("name", StringType, nullable = false),
            StructField("value_number", DoubleType, nullable = true),
            StructField("value_string", StringType, nullable = true)))))
          signals.write.format("graft-signal-live").option("url", url)
            .mode("append").save()
          val rows = s.read.format("graft-signal-live")
            .option("url", url).option("partitions", "8").load()
            .where(col("name").isin("click", "view"))
            .select(col("token_id"),
              expr("unix_micros(timestamp)").as("ts_us"),
              col("name"),
              col("value_number").cast(LongType).as("cents"))
          rows.localCheckpoint(true) // materialize THROUGH the streamed live read
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,
               event_type AS name,
               CAST(round(value*100) AS BIGINT) AS cents
             FROM events
             WHERE ts IS NOT NULL AND user_id IS NOT NULL
               AND event_type IN ('click','view')"""),
    ),

    // ── LIVE ES read across tie runs WIDER than the servable page (r13):
    //    every document lands on one of three tied milliseconds (bucket =
    //    cents mod 3), thousands of ties each, against a stub whose
    //    circuit breaker caps pages at 600 docs — the backward-paging
    //    protocol alone CANNOT drain such a run (the reference silently
    //    skips it, sync.go:151-155), so the read must widen to the cap,
    //    fall back to the `search_after` drain
    //    ([[graft.sources.EsQueryDsl.searchAfterRequest]]), drain each
    //    tied millisecond by `_id` cursor, and resume below it. Any doc
    //    lost to the cap (the reference's behavior) or duplicated by the
    //    cursor breaks the count/sum oracle.
    QueryDef(
      "q220_live_es_tie_drain",
      (s, d) => {
        val Base = 1704000000000L
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val cents = r.getLong(0)
            val bucket = ((cents % 3) + 3) % 3 // deterministic tie bucket
            val ms = Base + bucket * 60000L
            val iso = java.time.Instant.ofEpochMilli(ms)
            val json =
              s"""{"id":"t$i","subject":"s0","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}"""
            StubDoc(f"t$i%07d", "s0", ms * 1000L, json)
          }
        val server = startStub(docs, sizeCap = 600)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .load()
            .select(expr("unix_micros(time)").as("tie_us"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("tie_us"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
          live.localCheckpoint(true) // materialize THROUGH the live stack
        } finally server.stop(0)
      },
      Some("""SELECT (1704000000000000 +
                      ((CAST(round(value*100) AS BIGINT) % 3 + 3) % 3) * 60000000)::BIGINT AS tie_us,
               count(*)::BIGINT AS n_docs,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE CH runtime filtering (r13): the DPP shape of q190 against
    //    the WIRE source — the VIP build side (events → HAVING
    //    sum(cents) > threshold) is only known after it aggregates; the
    //    join then hands `graft-signal-live` its ACTUAL token set, the
    //    scan re-plans, and every CH SELECT carries `token_id IN (…)`:
    //    the store answers a primary-key point lookup instead of shipping
    //    the whole table for the join to discard (the reference's
    //    per-token correlated lookup, clickhouse.go:65-87, arriving from
    //    the planner). DPP confs forced for the entry (stats heuristics
    //    must not decide whether the declared feature runs) and restored.
    QueryDef(
      "q221_live_ch_dpp",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val cents = round(col("value") * 100).cast(LongType)
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            cents.cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val vips = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull &&
            col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(cents).as("spend"))
          .where(col("spend") > 120000L)
          .select(col("user_id").cast(LongType).as("token_id"))
        val server = ChSignalStub.start()
        val confs = Seq(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val url = s"http://127.0.0.1:${server.getAddress.getPort}"
          val client = new ClickHouseHttpClient(url)
          client.execute(ClickHouseDdl.signalTableDdl(StructType(Seq(
            StructField("token_id", LongType, nullable = false),
            StructField("timestamp", TimestampType, nullable = false),
            StructField("name", StringType, nullable = false),
            StructField("value_number", DoubleType, nullable = true),
            StructField("value_string", StringType, nullable = true)))))
          signals.write.format("graft-signal-live").option("url", url)
            .mode("append").save()
          val joined = s.read.format("graft-signal-live")
            .option("url", url).option("partitions", "8").load()
            .join(vips, Seq("token_id"))
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"))
          joined.localCheckpoint(true) // materialize THROUGH the runtime-filtered live read
        } finally {
          saved.foreach { case (k, v) => v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
          server.stop(0)
        }
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) AS token_id, event_type,
                   CAST(round(value*100) AS BIGINT) AS c
                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        vip AS (SELECT token_id FROM e WHERE event_type = 'purchase'
                GROUP BY 1 HAVING sum(c) > 120000)
        SELECT e.token_id, count(*)::BIGINT AS n_rows, sum(e.c)::BIGINT AS cents
        FROM e JOIN vip USING (token_id) GROUP BY 1"""),
    ),

    // ── LIVE ES COUNT pushdown (r13): `live.count()` — bare, subject-
    //    filtered, and time-windowed — answered by size-0 exact-total
    //    probes (`track_total_hits: true`): not ONE document pages over
    //    the wire, enforced loudly (the entry raises if the stub's
    //    served-docs counter moves — a silent regression to paging cannot
    //    hash-match its way through). At 100 TB the difference is a
    //    monitoring query costing one request vs re-downloading an index.
    QueryDef(
      "q222_live_es_count",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu) = (r.getString(0), r.getLong(1))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"n$i", subj, tsu,
              s"""{"id":"n$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{}}""")
          }
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500").load()
          val nTotal = live.count()
          val minSubj = evs.map(_.getString(0)).min
          val us = evs.map(_.getLong(1))
          val midMs = ((us.min + us.max) / 2) / 1000
          val nSubj = live.where(col("subject") === minSubj).count()
          val nWin = live.where(col("time") >= new java.sql.Timestamp(midMs)).count()
          require(served.get() == 0,
            s"COUNT pushdown regressed to paging: ${served.get()} docs shipped")
          import org.apache.spark.sql.types._
          s.createDataFrame(
            java.util.List.of(org.apache.spark.sql.Row(nTotal, nSubj, nWin)),
            StructType(Seq(
              StructField("n_total", LongType, nullable = false),
              StructField("n_subj", LongType, nullable = false),
              StructField("n_window", LongType, nullable = false))))
        } finally server.stop(0)
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS subj,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        m AS (SELECT ((min(us)+max(us))//2)//1000*1000 AS wus, min(subj) AS s0 FROM e)
        SELECT count(*)::BIGINT AS n_total,
          sum(CASE WHEN e.subj = (SELECT s0 FROM m) THEN 1 ELSE 0 END)::BIGINT AS n_subj,
          sum(CASE WHEN e.us >= (SELECT wus FROM m) THEN 1 ELSE 0 END)::BIGINT AS n_window
        FROM e"""),
    ),

    // ── LIVE ES runtime filtering (r14): the DPP shape of q221 against
    //    the WIRE ES source — the VIP build side (purchase spend above a
    //    threshold) is only known after it aggregates; the broadcast join
    //    then hands `graft-status-live` its ACTUAL subject set, the scan
    //    re-plans its per-subject fan-out around it, and ONLY the runtime
    //    subjects' `_search` page loops run (the reference's per-token
    //    correlated lookup, sync.go:77-80 + elastic.go:53, arriving from
    //    the planner). Enforced loudly: the stub's served-docs counter
    //    must equal EXACTLY the VIP subjects' doc count — one extra
    //    non-VIP page and the entry raises before any oracle compare.
    //    DPP confs forced (stats heuristics must not decide whether the
    //    declared feature runs) and restored.
    QueryDef(
      "q224_live_es_dpp",
      (s, d) => {
        val cents = round(col("value") * 100).cast(LongType)
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            cents.as("cents"),
            col("event_type").as("etype"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, c) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"v$i", subj, tsu,
              s"""{"id":"v$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$c}}""")
          }
        val vips = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull &&
            col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(sum(cents).as("spend"))
          .where(col("spend") > 120000L)
          .select(col("user_id").cast("string").as("subject"))
        // ground truth for the wire pin: docs belonging to VIP subjects
        val vipSet = vips.collect().map(_.getString(0)).toSet
        val expectedServed = evs.count(r => vipSet(r.getString(0))).toLong
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        val confs = Seq(
          "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "10.0")
        val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
        confs.foreach { case (k, v) => s.conf.set(k, v) }
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "2000").load()
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast(LongType).as("cents"))
          val joined = live.join(vips, Seq("subject"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
          val out = joined.localCheckpoint(true) // materialize THROUGH the runtime-filtered read
          require(served.get() == expectedServed,
            s"runtime filtering regressed: ${served.get()} docs shipped, " +
              s"expected exactly the $expectedServed VIP docs")
          out
        } finally {
          saved.foreach { case (k, v) => v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
          server.stop(0)
        }
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS subject, event_type,
                   CAST(round(value*100) AS BIGINT) AS c
                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        vip AS (SELECT subject FROM e WHERE event_type = 'purchase'
                GROUP BY 1 HAVING sum(c) > 120000)
        SELECT e.subject, count(*)::BIGINT AS n_docs, sum(e.c)::BIGINT AS cents
        FROM e JOIN vip USING (subject) GROUP BY 1"""),
    ),

    // ── LIVE ES GROUPED COUNT pushdown (r14): `groupBy(subject).count()`
    //    — the most common fleet-monitoring query — answered by size-0
    //    `terms` aggregation probes (exact-only: any bucket spill or
    //    shard error bound rejects back to the row scan), not ONE
    //    document paging over the wire, enforced loudly via the stub's
    //    served-docs counter. Two grouped counts (full window + recent
    //    half) land as two probes; the pushed `subject IS NOT NULL` is
    //    the null-group guard the terms semantics require.
    QueryDef(
      "q225_live_es_group_count",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu) = (r.getString(0), r.getLong(1))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"gc$i", subj, tsu,
              s"""{"id":"gc$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{}}""")
          }
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500").load()
            .where(col("subject").isNotNull)
          val total = live.groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"))
          val us = evs.map(_.getLong(1))
          val midMs = ((us.min + us.max) / 2) / 1000
          val recent = live.where(col("time") >= new java.sql.Timestamp(midMs))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_recent"))
          val out = total.join(recent, Seq("subject"), "left")
            .select(col("subject"), col("n_docs"),
              coalesce(col("n_recent"), lit(0L)).as("n_recent"))
            .localCheckpoint(true) // materialize THROUGH the probe-backed scans
          require(served.get() == 0,
            s"grouped COUNT pushdown regressed to paging: ${served.get()} docs shipped")
          out
        } finally server.stop(0)
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS subject,
                   CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS us
                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        m AS (SELECT ((min(us)+max(us))//2)//1000*1000 AS wus FROM e)
        SELECT subject, count(*)::BIGINT AS n_docs,
          sum(CASE WHEN us >= (SELECT wus FROM m) THEN 1 ELSE 0 END)::BIGINT AS n_recent
        FROM e GROUP BY 1"""),
    ),

    // ── LIVE ES FLEET-SUBSET COUNTS (r14): a pushed `subject IN (…)`
    //    compiles to one `terms` clause in the size-0 probes — counting a
    //    fleet subset (the everyday "how many docs do MY vehicles have"
    //    monitoring query) costs ONE request ungrouped and ONE request
    //    grouped, zero documents paged (enforced via the served counter).
    //    The row scan is untouched: it fans the same IN into per-subject
    //    page loops; only probes carry terms.
    QueryDef(
      "q226_live_es_subset_count",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu) = (r.getString(0), r.getLong(1))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"fs$i", subj, tsu,
              s"""{"id":"fs$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{}}""")
          }
        // the monitored subset: even token ids (expressible in the oracle)
        val evens = evs.map(_.getString(0)).distinct.filter(_.toLong % 2 == 0).sorted
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500").load()
            .where(col("subject").isin(evens: _*))
          val nSubset = live.count() // ONE terms-scoped exact-total probe
          val out = live.groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs")) // ONE terms-scoped terms-agg probe
            .withColumn("n_subset", lit(nSubset))
            .localCheckpoint(true)
          require(served.get() == 0,
            s"subset COUNT pushdown regressed to paging: ${served.get()} docs shipped")
          out
        } finally server.stop(0)
      },
      Some("""WITH e AS (SELECT CAST(user_id AS VARCHAR) AS subject
                 FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
                   AND CAST(user_id AS BIGINT) % 2 = 0),
        g AS (SELECT subject, count(*)::BIGINT AS n_docs FROM e GROUP BY 1)
        SELECT subject, n_docs, (SELECT sum(n_docs) FROM g)::BIGINT AS n_subset FROM g"""),
    ),

    // ── LIVE ES tie drain on the ES 8 protocol (r14): q220's over-cap
    //    tie corpus against a stub in the REAL-ES-8 posture — `_pit` ids
    //    issued, `_id`-sort requests REJECTED outright (no fielddata on
    //    _id). The drain must probe the PIT, sort on `_shard_doc`, and
    //    cursor-page on each hit's own sort values; the reference
    //    silently skips such tie runs entirely (sync.go:151-155). Same
    //    oracle as q220: any doc lost to the cap or duplicated by the
    //    cursor breaks the count/sum hash.
    QueryDef(
      "q227_live_es_pit_drain",
      (s, d) => {
        val Base = 1704000000000L
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val cents = r.getLong(0)
            val bucket = ((cents % 3) + 3) % 3 // deterministic tie bucket
            val ms = Base + bucket * 60000L
            val iso = java.time.Instant.ofEpochMilli(ms)
            val json =
              s"""{"id":"p$i","subject":"s0","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}"""
            StubDoc(f"p$i%07d", "s0", ms * 1000L, json)
          }
        val server = startStub(docs, sizeCap = 600, pitMode = true)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .load()
            .select(expr("unix_micros(time)").as("tie_us"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("tie_us"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
          live.localCheckpoint(true) // materialize THROUGH the PIT-drained live stack
        } finally server.stop(0)
      },
      Some("""SELECT (1704000000000000 +
                      ((CAST(round(value*100) AS BIGINT) % 3 + 3) % 3) * 60000000)::BIGINT AS tie_us,
               count(*)::BIGINT AS n_docs,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE wire tier over MUTUAL TLS (r14): the whole DSv2 CH
    //    write/read path through a REAL handshake — keytool-generated
    //    private CA ([[TlsStub]]), `HttpsServer` demanding a client
    //    certificate, the same grammar-strict [[ChSignalStub]] on top.
    //    The `tlsTruststore`/`tlsKeystore` options (threaded
    //    driver→executor as [[graft.sources.LiveWire]]) are the managed-
    //    cluster deployment posture the reference's TLS floor implies
    //    (clickhouse.go:41-47 [ext]). The entry RAISES unless BOTH
    //    negative handshakes fail first: default trust must reject the
    //    private CA (MITM posture), and a trust-only client must be
    //    rejected by the server (mTLS is mutual) — only then does the
    //    configured client write and read the oracle's rows.
    QueryDef(
      "q228_live_tls",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8) // the distributed fan-out, every task handshaking
        val m = TlsStub.shared
        val server = ChSignalStub.start(TlsStub.httpsServer(m, needClientAuth = true))
        try {
          val base = s"https://127.0.0.1:${server.getAddress.getPort}"
          // negative pins BEFORE any data moves: a silently-succeeding
          // untrusted or certificate-less client would be the bug
          val defaultTrust = new ClickHouseHttpClient(base, timeoutMs = 3000)
          val rejectedByClient =
            try { defaultTrust.execute("SELECT 1"); false }
            catch { case _: java.io.IOException => true }
          require(rejectedByClient, "default trust accepted a private-CA endpoint")
          val trustOnly = new ClickHouseHttpClient(base, timeoutMs = 3000,
            wire = TlsStub.clientWire(m, mtls = false))
          val rejectedByServer =
            try { trustOnly.execute("SELECT 1"); false }
            catch { case _: java.io.IOException => true }
          require(rejectedByServer, "server accepted a client without a certificate")
          val wire = TlsStub.clientWire(m, mtls = true)
          new ClickHouseHttpClient(base, wire = wire)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          signals.write.format("graft-signal-live")
            .option("url", base)
            .option("tlsTruststore", m.truststore)
            .option("tlsTruststorePassword", m.password)
            .option("tlsKeystore", m.clientKeystore)
            .option("tlsKeystorePassword", m.password)
            .mode("append").save()
          s.read.format("graft-signal-live")
            .option("url", base)
            .option("tlsTruststore", m.truststore)
            .option("tlsTruststorePassword", m.password)
            .option("tlsKeystore", m.clientKeystore)
            .option("tlsKeystorePassword", m.password)
            .load()
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              expr("min(unix_micros(timestamp))").as("oldest_us"))
            .localCheckpoint(true) // materialize THROUGH the mTLS wire stack
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE wire tier COMPRESSED end-to-end (r14): the DSv2 CH
    //    write/read path under `compression=gzip` against a stub that
    //    REJECTS any identity posture — INSERT bodies must arrive
    //    `Content-Encoding: gzip`, SELECTs must carry
    //    `enable_http_compression=1`, every response (including the
    //    STREAMED row scans, inflated incrementally) is served gzipped.
    //    At 100 TB the insert/scan fan-out's wire bytes are the egress
    //    bill; CSV/TSV compress 5-10×, and the dedup token still hashes
    //    the UNCOMPRESSED bytes (content identity, not encoding). The
    //    entry RAISES first if an identity client can pass the stub —
    //    the enforcement is what makes the oracle compare meaningful.
    QueryDef(
      "q229_live_gzip",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient, LiveWire}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val server = ChSignalStub.start(gzip = true)
        try {
          val base = s"http://127.0.0.1:${server.getAddress.getPort}"
          val gz = LiveWire(gzip = true)
          new ClickHouseHttpClient(base, wire = gz)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          // negative pin: an identity-posture statement cannot pass
          val identity = new ClickHouseHttpClient(base)
          val rejected =
            try { identity.query("SELECT count() FROM `signal`"); false }
            catch { case e: graft.sources.ChHttpStatusException =>
              e.getMessage.contains("enable_http_compression") }
          require(rejected, "identity client passed the gzip-enforcing stub")
          signals.write.format("graft-signal-live")
            .option("url", base).option("compression", "gzip")
            .mode("append").save()
          s.read.format("graft-signal-live")
            .option("url", base).option("compression", "gzip")
            .load()
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
            .localCheckpoint(true) // materialize THROUGH the compressed wire stack
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE wire tier AUTHENTICATED (r14): the reference authenticates
    //    both connections (elastic.go:29-30, clickhouse.go:40-43 [ext]);
    //    here the `username`/`password` options ride [[graft.sources
    //    .LiveWire]] into every executor-side request as standard basic
    //    auth. The stub enforces credentials on EVERY request (401
    //    otherwise, a real CH's users.xml posture) and the entry RAISES
    //    first unless an anonymous client is refused with the typed 401 —
    //    then the whole DSv2 write/read round runs authenticated
    //    (envelope probe, DDL, per-partition inserts, streamed scans).
    QueryDef(
      "q230_live_auth",
      (s, d) => {
        import graft.sources.{ChHttpStatusException, ClickHouseDdl, ClickHouseHttpClient, LiveWire}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val (user, pass) = ("sync_user", "gate-s3cret")
        val server = ChSignalStub.start(auth = Some((user, pass)))
        try {
          val base = s"http://127.0.0.1:${server.getAddress.getPort}"
          val wire = LiveWire(username = Some(user), password = Some(pass))
          new ClickHouseHttpClient(base, wire = wire)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          // negative pin: anonymity must be refused, typed
          val refused =
            try { new ClickHouseHttpClient(base).query("SELECT count() FROM `signal`"); false }
            catch { case e: ChHttpStatusException => e.statusCode == 401 }
          require(refused, "anonymous client passed the authenticated stub")
          signals.write.format("graft-signal-live")
            .option("url", base).option("username", user).option("password", pass)
            .mode("append").save()
          s.read.format("graft-signal-live")
            .option("url", base).option("username", user).option("password", pass)
            .load()
            .groupBy(col("name"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              countDistinct(col("token_id")).as("n_tokens"))
            .localCheckpoint(true) // materialize THROUGH the authenticated wire stack
        } finally server.stop(0)
      },
      Some("""SELECT event_type AS name,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               count(DISTINCT user_id)::BIGINT AS n_tokens
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── PARALLEL whole-window live ES scan (r14): an unfiltered
    //    full-index read used to be ONE sequential page loop (the
    //    reference's loops are per-token; it has no full-index scan at
    //    all). `slices=8` plans 8 tasks, each draining its own
    //    server-side slice of a point-in-time (`slice:{id,max}` +
    //    `sort:_shard_doc` + `search_after` — the protocol a real ES 8
    //    serves natively), so a 100 TB index drain scales with the
    //    cluster. Exactly-once is two guarantees composed: the server's
    //    slice disjointness across tasks, each cursor's strict advance
    //    within one. The entry RAISES unless all 8 slices were actually
    //    requested AND the wire served each document exactly once —
    //    then the DuckDB compare catches any loss/duplication in the
    //    decode path.
    QueryDef(
      "q231_live_es_sliced",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"sl$i", subj, tsu,
              s"""{"id":"sl$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val served = new java.util.concurrent.atomic.AtomicLong
        val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val server = startStub(docs, pitMode = true, served = served,
          sliceSeen = sliceSeen)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500").option("slices", "8").load()
          require(live.rdd.getNumPartitions == 8, "sliced scan must plan 8 tasks")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the sliced wire stack
          import scala.jdk.CollectionConverters._
          require(sliceSeen.asScala.toSet == (0 until 8).toSet,
            s"expected all 8 slices requested, saw ${sliceSeen.asScala.toSet}")
          require(served.get() == docs.length.toLong,
            s"wire served ${served.get()} docs for a ${docs.length}-doc corpus " +
              "(slice overlap or loss)")
          out
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS VARCHAR) AS subject,
               count(*)::BIGINT AS n_docs,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── HOT-SUBJECT sliced drain (r15): a subject-constrained scan fans
    //    per-subject page loops, so ONE deep-history device serialized
    //    through a single sequential loop no matter how many executors
    //    idled — the last single-task shape in the live tier (and the
    //    reference's own deployment shape: 113 pinned tokens, some far
    //    hotter than others). With `slices=8`, planning runs ONE terms
    //    probe over the pushed subject set, spots subjects whose window
    //    exceeds `hotSubjectPages` pages, and fans EACH across 8
    //    sliced-PIT tasks (the slice composes with the match clause
    //    server-side) over ONE shared snapshot; cold subjects keep their
    //    grouped loops. The entry maps ~20% of users onto one 'hot'
    //    subject (≥20× any cold one), RAISES unless the stub counters
    //    prove the hot subject's docs were served across all 8 slices
    //    EXACTLY once while only it rode the sliced path — then the
    //    DuckDB compare catches any loss/duplication in the decode.
    QueryDef(
      "q234_live_es_hot_subject",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("hot"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"hs$i", subj, tsu,
              s"""{"id":"hs$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val hotTotal = docs.count(_.subject == "hot").toLong
        val subjects = docs.map(_.subject).distinct
        val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val slicedSubjects = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val servedSliced = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, pitMode = true, sliceSeen = sliceSeen,
          slicedSubjects = slicedSubjects, servedSliced = servedSliced)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "64").option("slices", "8")
            .option("hotSubjectPages", "2").load()
            .where(col("subject").isin(subjects: _*))
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the hot-sliced stack
          import scala.jdk.CollectionConverters._
          require(slicedSubjects.asScala.toSet == Set("hot"),
            s"only the hot subject may ride the sliced drain, saw ${slicedSubjects.asScala.toSet}")
          require(sliceSeen.asScala.toSet == (0 until 8).toSet,
            s"expected the hot subject across all 8 slices, saw ${sliceSeen.asScala.toSet}")
          require(servedSliced.get() == hotTotal,
            s"sliced path served ${servedSliced.get()} docs for a $hotTotal-doc hot subject " +
              "(slice overlap or loss)")
          out
        } finally server.stop(0)
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 'hot'
                           ELSE CAST(user_id AS VARCHAR) END AS subject,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT subject, count(*)::BIGINT AS n_docs, sum(cents)::BIGINT AS cents
             FROM m GROUP BY 1"""),
    ),

    // ── O(groups) RANGED census planning (r15): at 10M tokens the
    //    materialized census + watermark map costs the DRIVER ~2.1 GB at
    //    load() (LiveProbe §7 — the reference's own loop state). With
    //    `censusRanges=G` the planner streams the SORTED staged files
    //    once and records one BYTE RANGE per group — O(groups) driver
    //    state — and each task reads its own slice before driving the
    //    same per-subject page loops, per-token watermarks included. The
    //    entry stages an events census + a watermark cutting every EVEN
    //    user at the corpus midpoint, RAISES unless exactly G ranged
    //    tasks planned AND the wire shipped exactly the surviving rows
    //    (a watermark that failed to ride a byte range would overship),
    //    then the DuckDB compare re-derives the same cut independently.
    QueryDef(
      "q236_live_es_ranged_census",
      (s, d) => {
        import org.apache.spark.sql.types.LongType
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"),
            col("user_id").cast(LongType).as("uid"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val msAll = evs.map(_.getLong(1) / 1000)
        val cut = (msAll.min + msAll.max) / 2 // the even-user watermark
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"rc$i", subj, tsu,
              s"""{"id":"rc$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val census = evs.map(_.getString(0)).distinct.sorted
        val stops = census.filter(_.toLong % 2 == 0).map(sub => s"$sub\t$cut")
        def stage(lines: Seq[String]): java.nio.file.Path = {
          val f = java.nio.file.Files.createTempFile("graft-q236", ".txt")
          java.nio.file.Files.write(f, lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          f
        }
        val cPath = stage(census)
        val sPath = stage(stops)
        val expected = evs.count(r => r.getLong(3) % 2 == 1 || r.getLong(1) / 1000 < cut)
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "200")
            .option("subjectsPath", cPath.toString)
            .option("stopBySubjectPath", sPath.toString)
            .option("censusRanges", "6").load()
          require(live.rdd.getNumPartitions == 6,
            s"expected 6 byte-range groups, planned ${live.rdd.getNumPartitions}")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the ranged plan
          require(served.get() == expected.toLong,
            s"wire served ${served.get()} docs, watermark-surviving set is $expected " +
              "(a stop failed to ride its byte range, or a range re-read subjects)")
          out
        } finally {
          server.stop(0)
          java.nio.file.Files.deleteIfExists(cPath)
          java.nio.file.Files.deleteIfExists(sPath)
        }
      },
      Some("""WITH e AS (SELECT CAST(user_id AS BIGINT) uid,
                      CAST(round(value*100) AS BIGINT) cents,
                      epoch_us(CAST(ts AS TIMESTAMP))//1000 AS ms
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             c AS (SELECT (min(ms)+max(ms))//2 AS cut FROM e)
             SELECT CAST(uid AS VARCHAR) AS subject, count(*)::BIGINT AS n_docs,
               sum(cents)::BIGINT AS cents
             FROM e, c WHERE uid % 2 = 1 OR ms < cut GROUP BY 1"""),
    ),

    // ── PIT-less hot drain via TIME-WINDOW CUTS (r16): q234's parallel
    //    whale drain rides sliced-PIT — an ES 8 feature. On a server
    //    WITHOUT point-in-time support (an ES 7 posture, or a PIT-less
    //    proxy) the whale used to serialize through one loop again.
    //    Planning now probes the server's own time PERCENTILES for the
    //    whale's window and tiles it into DISJOINT half-open sub-ranges —
    //    each tile is the ordinary exactly-once page loop, disjoint BY
    //    FILTER (no snapshot to tear; an approximate percentile only
    //    unbalances tiles, never rows). The entry replays q234's corpus
    //    against a PIT-LESS stub and RAISES unless the whale actually
    //    planned ≥2 time tiles while NO slice or PIT request ever hit
    //    the wire; the DuckDB compare then catches any tile overlap or
    //    gap (a duplicated or lost document breaks the grouped sums).
    QueryDef(
      "q239_live_es_window_cuts",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("hot"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"wc$i", subj, tsu,
              s"""{"id":"wc$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val subjects = docs.map(_.subject).distinct
        val coldGroups = math.min(64, subjects.length - 1)
        val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val pitOpened = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, pitMode = false, sliceSeen = sliceSeen,
          pitOpened = pitOpened)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "64").option("slices", "8")
            .option("hotSubjectPages", "2").load()
            .where(col("subject").isin(subjects: _*))
          val parts = live.rdd.getNumPartitions
          require(parts > coldGroups + 1 && parts <= coldGroups + 8,
            s"expected $coldGroups cold groups + 2..8 whale time tiles, planned $parts")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the tiled plan
          import scala.jdk.CollectionConverters._
          require(sliceSeen.asScala.isEmpty,
            "no slice request may reach a PIT-less server")
          require(pitOpened.get() == 0L,
            "no PIT may be opened against a PIT-less server")
          out
        } finally server.stop(0)
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 'hot'
                           ELSE CAST(user_id AS VARCHAR) END AS subject,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT subject, count(*)::BIGINT AS n_docs, sum(cents)::BIGINT AS cents
             FROM m GROUP BY 1"""),
    ),

    // ── HOT-LIST composition for the RANGED census (r16): q236's
    //    byte-range groups are equal-SUBJECT-count and never probe for
    //    hot devices (a terms probe cannot enumerate a 10M-token fleet),
    //    so a mega-fleet with a few deep-history whales still straggled
    //    its byte-range group. `hotSubjectsPath` — the operator usually
    //    knows its whales, or one prior groupBy(subject).count() run
    //    does — carves each listed subject OUT of the tiles at planning
    //    (zero extra passes: they are lines the sortedness walk already
    //    visits) and drains it through the q234 sliced-PIT path, its
    //    stops-file watermark applied ON the slice windows. The entry
    //    maps ~20% of rows onto one 'hot' subject, watermarks it at its
    //    midpoint, and RAISES unless the whale rode all 8 slices (only
    //    it), its watermark reached the slice windows, AND the ranged
    //    tiles excluded it exactly (total served = surviving set — a
    //    tile re-looping the whale would double-serve); the DuckDB
    //    compare then re-derives the cut independently.
    QueryDef(
      "q237_live_es_ranged_hotlist",
      (s, d) => {
        import org.apache.spark.sql.types.LongType
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("hot"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"rh$i", subj, tsu,
              s"""{"id":"rh$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val hotMs = evs.filter(_.getString(0) == "hot").map(_.getLong(1) / 1000)
        val cut = (hotMs.min + hotMs.max) / 2 // the whale's midpoint watermark
        val census = evs.map(_.getString(0)).distinct.sorted
        def stage(lines: Seq[String]): java.nio.file.Path = {
          val f = java.nio.file.Files.createTempFile("graft-q237", ".txt")
          java.nio.file.Files.write(f, lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          f
        }
        val cPath = stage(census)
        val sPath = stage(Seq(s"hot\t$cut"))
        val hPath = stage(Seq("hot"))
        val hotSurviving = evs.count(r =>
          r.getString(0) == "hot" && r.getLong(1) / 1000 < cut)
        val expected = evs.count(_.getString(0) != "hot") + hotSurviving
        val served = new java.util.concurrent.atomic.AtomicLong
        val servedSliced = new java.util.concurrent.atomic.AtomicLong
        val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        val slicedSubjects = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val server = startStub(docs, pitMode = true, served = served,
          servedSliced = servedSliced, sliceSeen = sliceSeen,
          slicedSubjects = slicedSubjects)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "200")
            .option("subjectsPath", cPath.toString)
            .option("stopBySubjectPath", sPath.toString)
            .option("hotSubjectsPath", hPath.toString)
            .option("censusRanges", "6").option("slices", "8").load()
          require(live.rdd.getNumPartitions == 14,
            s"expected 6 byte-range groups + 8 whale slices, planned ${live.rdd.getNumPartitions}")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the hot-list ranged plan
          import scala.jdk.CollectionConverters._
          require(slicedSubjects.asScala.toSet == Set("hot"),
            s"only the hot-list may ride the sliced drain, saw ${slicedSubjects.asScala.toSet}")
          require(sliceSeen.asScala.toSet == (0 until 8).toSet,
            s"expected the whale across all 8 slices, saw ${sliceSeen.asScala.toSet}")
          require(servedSliced.get() == hotSurviving.toLong,
            s"sliced path served ${servedSliced.get()} of a $hotSurviving-doc watermarked whale " +
              "(the stops-file watermark must ride the slice windows)")
          require(served.get() == expected.toLong,
            s"wire served ${served.get()}, surviving set is $expected " +
              "(a tile failed to exclude the whale, or excluded a cold subject)")
          out
        } finally {
          server.stop(0)
          java.nio.file.Files.deleteIfExists(cPath)
          java.nio.file.Files.deleteIfExists(sPath)
          java.nio.file.Files.deleteIfExists(hPath)
        }
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 'hot'
                           ELSE CAST(user_id AS VARCHAR) END AS subject,
                      CAST(round(value*100) AS BIGINT) AS cents,
                      epoch_us(CAST(ts AS TIMESTAMP))//1000 AS ms
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             c AS (SELECT (min(ms)+max(ms))//2 AS cut FROM m WHERE subject = 'hot')
             SELECT subject, count(*)::BIGINT AS n_docs, sum(cents)::BIGINT AS cents
             FROM m, c WHERE subject <> 'hot' OR ms < cut GROUP BY 1"""),
    ),

    // ── The MEGA-FLEET sync e2e (r16): q215's two-round pipeline driven
    //    through SyncJob.runLiveRanged — the job-layer entry for fleets
    //    past the ~10M-token load() wall, where the census and watermark
    //    map stage into a CALLER-OWNED directory and the scan plans
    //    O(groups) byte-range tiles (censusRanges) with the fleet's one
    //    whale (~20% of rows, folded onto token 1) carved out via
    //    hotSubjectsPath and drained across 8 sliced-PIT tasks. Round 1
    //    syncs the newer half; the backfill appears and round 2 must
    //    fetch ONLY strictly below each token's watermark THROUGH the
    //    ranged machinery — the stops file rides byte ranges, the
    //    whale's watermark rides its slice windows. RAISES unless only
    //    the whale sliced (across all 8) and staging survived round 1
    //    (tasks read it — deletion at load() would be the r15 cadence
    //    bug); the DuckDB compare then equals one explosion of the whole
    //    events table, exactly once.
    QueryDef(
      "q238_live_sync_ranged",
      (s, d) => {
        import graft.jobs.{SyncJob, SyncOptions}
        import graft.sources.{DeviceDim, SignalSink}
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("1"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val mid = { val ts = evs.map(_.getLong(1)); (ts.min + ts.max) / 2 }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"g$subj-$tsu-$i", subj, tsu,
              s"""{"id":"g$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status","data":{"speed":$cents,"make":"m"}}""")
          }
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) >= mid)
        val tokens = evs.map(_.getString(0)).distinct.sorted
        val dim = DeviceDim.identityDim(s, tokens.map(_.toLong).toSeq.sorted)
        val opts = SyncOptions(tokens = tokens.toSeq,
          start = Some(new java.sql.Timestamp(0L)),
          stop = Some(new java.sql.Timestamp(9999999999999L)))
        val sinkDir = java.nio.file.Files
          .createTempDirectory("graft-q238-sink").resolve("signals").toString
        val staging = java.nio.file.Files.createTempDirectory("graft-q238-staging")
        def url(server: HttpServer) = s"http://127.0.0.1:${server.getAddress.getPort}"
        try {
          val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
          val slicedSubjects = new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val server1 = startStub(mkDocs(newer), pitMode = true,
            sliceSeen = sliceSeen, slicedSubjects = slicedSubjects)
          try {
            val round1 = SyncJob.runLiveRanged(s, url(server1), dim, existingSink = None,
              opts, stagingDir = staging.toString, batchSize = 2000,
              censusRanges = 6, slices = 8, hotSubjects = Seq("1"))
            SignalSink.appendParquet(round1, sinkDir, buckets = 8)
          } finally server1.stop(0)
          import scala.jdk.CollectionConverters._
          require(slicedSubjects.asScala.toSet == Set("1"),
            s"only the whale may ride the sliced drain, saw ${slicedSubjects.asScala.toSet}")
          require(sliceSeen.asScala.toSet == (0 until 8).toSet,
            s"expected the whale across all 8 slices, saw ${sliceSeen.asScala.toSet}")
          require(java.nio.file.Files.list(staging).iterator().asScala.nonEmpty,
            "caller-owned staging must survive the action (tasks read it mid-flight)")
          val server2 = startStub(mkDocs(newer ++ older), pitMode = true)
          try {
            val sink1 = SignalSink.readParquet(s, sinkDir)
            val round2 = SyncJob.runLiveRanged(s, url(server2), dim,
              existingSink = Some(sink1), opts, stagingDir = staging.toString,
              batchSize = 2000, censusRanges = 6, slices = 8, hotSubjects = Seq("1"))
            SignalSink.appendParquet(round2, sinkDir, buckets = 8)
          } finally server2.stop(0)
          SignalSink.readParquet(s, sinkDir)
            .groupBy(col("tokenId").as("token_id"))
            .agg(count(lit(1)).as("n_signals"),
              sum(when(col("name") === "Vehicle.Speed", col("valueNumber"))
                .otherwise(lit(0.0))).cast(LongType).as("speed_sum"),
              expr("min(unix_micros(timestamp))").as("oldest_us"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(staging).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 1
                           ELSE CAST(user_id AS BIGINT) END AS token_id,
                      CAST(round(value*100) AS BIGINT) AS cents,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT token_id, (count(*) * 2)::BIGINT AS n_signals,
               sum(cents)::BIGINT AS speed_sum,
               CAST(min(us) AS BIGINT) AS oldest_us,
               CAST(max(us) AS BIGINT) AS newest_us
             FROM m GROUP BY 1"""),
    ),

    // ── Whale AUTO-DISCOVERY in the mega-fleet sync (r17): q238 names
    //    its whale (`hotSubjects = Seq("1")` — operator knowledge). With
    //    `hotMinRows` set, runLiveRanged instead asks the SINK: subjects
    //    whose already-synced depth exceeds the threshold
    //    (SyncOps.hotSubjectsFromSink — one bounded cluster-side count,
    //    capped BEFORE its broadcast) join the hot-list unnamed, making
    //    whale handling the mega-fleet default. Round 1 has no sink —
    //    nothing to discover, plain ranged tiles (RAISED). Round 2 must
    //    discover token 1 from round 1's own output and fan it across
    //    all 8 slices while fetching ONLY below the watermarks (RAISED);
    //    the DuckDB compare then equals one explosion of the whole
    //    events table, exactly once — a tile double-draining the
    //    discovered whale, or the discovery misfiring on a cold token,
    //    breaks the grouped sums.
    QueryDef(
      "q240_live_sync_hot_discovery",
      (s, d) => {
        import graft.jobs.{SyncJob, SyncOptions}
        import graft.sources.{DeviceDim, SignalSink}
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("1"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is below
        val mid = { val ts = evs.map(_.getLong(1)); (ts.min + ts.max) / 2 }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"h$subj-$tsu-$i", subj, tsu,
              s"""{"id":"h$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status","data":{"speed":$cents,"make":"m"}}""")
          }
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) >= mid)
        // the discovery threshold, derived from the fixture itself: the
        // whale's round-1 sink depth (2 signal rows per doc) must clear
        // it, every cold token must not — the midpoint is the widest
        // margin both ways
        val sinkDepths = newer.groupBy(_.getString(0)).map { case (k, v) => k -> v.size * 2L }
        val whaleRows = sinkDepths("1")
        val maxCold = (sinkDepths - "1").values.maxOption.getOrElse(0L)
        require(whaleRows > maxCold,
          s"fixture: the folded whale ($whaleRows rows) must out-weigh every cold token ($maxCold)")
        val hotMin = (whaleRows + maxCold) / 2
        val tokens = evs.map(_.getString(0)).distinct.sorted
        val dim = DeviceDim.identityDim(s, tokens.map(_.toLong).toSeq.sorted)
        val opts = SyncOptions(tokens = tokens.toSeq,
          start = Some(new java.sql.Timestamp(0L)),
          stop = Some(new java.sql.Timestamp(9999999999999L)))
        val sinkDir = java.nio.file.Files
          .createTempDirectory("graft-q240-sink").resolve("signals").toString
        val staging = java.nio.file.Files.createTempDirectory("graft-q240-staging")
        def url(server: HttpServer) = s"http://127.0.0.1:${server.getAddress.getPort}"
        try {
          import scala.jdk.CollectionConverters._
          val sliced1 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val server1 = startStub(mkDocs(newer), pitMode = true, slicedSubjects = sliced1)
          try {
            val round1 = SyncJob.runLiveRanged(s, url(server1), dim, existingSink = None,
              opts, stagingDir = staging.toString, batchSize = 2000,
              censusRanges = 6, slices = 8, hotMinRows = hotMin)
            SignalSink.appendParquet(round1, sinkDir, buckets = 8)
          } finally server1.stop(0)
          require(sliced1.asScala.isEmpty,
            s"round 1 has no sink to probe — plain tiles, saw sliced ${sliced1.asScala.toSet}")
          val sliceSeen = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
          val sliced2 = new java.util.concurrent.ConcurrentLinkedQueue[String]()
          val server2 = startStub(mkDocs(newer ++ older), pitMode = true,
            sliceSeen = sliceSeen, slicedSubjects = sliced2)
          try {
            val sink1 = SignalSink.readParquet(s, sinkDir)
            val round2 = SyncJob.runLiveRanged(s, url(server2), dim,
              existingSink = Some(sink1), opts, stagingDir = staging.toString,
              batchSize = 2000, censusRanges = 6, slices = 8, hotMinRows = hotMin)
            SignalSink.appendParquet(round2, sinkDir, buckets = 8)
          } finally server2.stop(0)
          require(sliced2.asScala.toSet == Set("1"),
            s"round 2 must discover EXACTLY the whale from the sink, saw ${sliced2.asScala.toSet}")
          require(sliceSeen.asScala.toSet == (0 until 8).toSet,
            s"expected the discovered whale across all 8 slices, saw ${sliceSeen.asScala.toSet}")
          SignalSink.readParquet(s, sinkDir)
            .groupBy(col("tokenId").as("token_id"))
            .agg(count(lit(1)).as("n_signals"),
              sum(when(col("name") === "Vehicle.Speed", col("valueNumber"))
                .otherwise(lit(0.0))).cast(LongType).as("speed_sum"),
              expr("min(unix_micros(timestamp))").as("oldest_us"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(staging).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 1
                           ELSE CAST(user_id AS BIGINT) END AS token_id,
                      CAST(round(value*100) AS BIGINT) AS cents,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT token_id, (count(*) * 2)::BIGINT AS n_signals,
               sum(cents)::BIGINT AS speed_sum,
               CAST(min(us) AS BIGINT) AS oldest_us,
               CAST(max(us) AS BIGINT) AS newest_us
             FROM m GROUP BY 1"""),
    ),

    // ── LOAD-BALANCED ranged groups (r17): q236's byte-range groups are
    //    equal-SUBJECT-count, so a moderately-skewed fleet packs its
    //    heavy devices into straggler groups unless the operator names
    //    every one in a hot-list. `censusWeightsPath` — a cluster-staged
    //    subject<TAB>weight file (sink depth via runLiveRanged's
    //    weightBySinkDepth, or any census the caller has) — moves the
    //    group boundaries to equal CUMULATIVE weight: the planner
    //    merge-walks the weights file in lockstep with the census
    //    (O(groups) driver state unchanged). The entry folds ~20% of
    //    rows onto one first-sorting subject, weights by true doc
    //    counts, and RAISES unless the whale got a group of its OWN
    //    (its weight exceeds one equal-weight share) while every other
    //    group respects the provable bound ceil(W/g) + max cold weight;
    //    the DuckDB compare then pins exactly-once through the weighted
    //    tiling.
    QueryDef(
      "q241_live_es_ranged_weighted",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("0-hot"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"wb$i", subj, tsu,
              s"""{"id":"wb$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val wOf: Map[String, Long] =
          evs.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
        val census = wOf.keys.toSeq.sorted
        val g = 8
        val total = wOf.values.sum
        val share = (total + g - 1) / g
        val maxCold = (wOf - "0-hot").values.max
        // fixture invariants, RAISED loudly if testdata generation drifts:
        // the whale must out-weigh one equal-weight share (else isolation
        // is not the deterministic outcome) and sort FIRST in the census
        require(wOf("0-hot") > share && census.head == "0-hot",
          s"fixture: whale ${wOf("0-hot")} must exceed share $share and sort first")
        def stage(lines: Seq[String]): java.nio.file.Path = {
          val f = java.nio.file.Files.createTempFile("graft-q241", ".txt")
          java.nio.file.Files.write(f, lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          f
        }
        val cPath = stage(census)
        val wPath = stage(census.map(sub => s"$sub\t${wOf(sub)}"))
        // the planner's own tiling, checked against the model BEFORE the
        // read: whale isolated, every cold group within the provable bound
        val ranges = graft.sources.StatusLiveSource.planCensusRangesHot(
          cPath.toString, None, g, Set.empty, Some(wPath.toString)).ranges
        val tiles = ranges.map(r => graft.sources.StatusLiveSource.readRange(
          cPath.toString, r.cStart, r.cEnd))
        require(tiles.flatten == census, "weighted tiles must reconstruct the census")
        require(tiles.head == Seq("0-hot"),
          s"the whale must own its group, got head tile ${tiles.head.take(3)}…")
        val coldLoads = tiles.tail.map(_.map(wOf).sum)
        require(coldLoads.forall(_ <= share + maxCold),
          s"cold group past the provable bound ${share + maxCold}: $coldLoads")
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .option("subjectsPath", cPath.toString)
            .option("censusWeightsPath", wPath.toString)
            .option("censusRanges", g.toString).load()
          require(live.rdd.getNumPartitions == ranges.length,
            s"expected ${ranges.length} weighted groups, planned ${live.rdd.getNumPartitions}")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the weighted ranged plan
          // exactly-once on the WIRE, modulo the page loop's deliberate
          // boundary overlap: each page beyond a loop's first may
          // re-serve one boundary-tie doc (deduped by id in the reader),
          // so the ceiling is the modeled extra-page count — a tile
          // lost to the tiling (under) or re-read whole (over by a
          // subject's weight) breaks either side
          val extraPages = wOf.values.map(w => (w + 499) / 500 - 1).sum
          require(served.get() >= total && served.get() - total <= extraPages,
            s"wire served ${served.get()} of $total docs (allowed overlap $extraPages)")
          out
        } finally {
          server.stop(0)
          java.nio.file.Files.deleteIfExists(cPath)
          java.nio.file.Files.deleteIfExists(wPath)
        }
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN '0-hot'
                           ELSE CAST(user_id AS VARCHAR) END AS subject,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT subject, count(*)::BIGINT AS n_docs, sum(cents)::BIGINT AS cents
             FROM m GROUP BY 1"""),
    ),

    // ── Heavy-LAST weighted tiling (r17): the boundary rule's hard
    //    case. Fleets where newer ids run deeper put their heaviest
    //    subject at the END of the sorted census — a rule that tests
    //    only the cumulative weight BEFORE a line (the round's first
    //    cut) never places a boundary there and collapses the whole
    //    plan to ONE sequential group, exactly where the balance
    //    matters most. The MIDPOINT rule (boundary on the first line
    //    whose cum + w/2 crosses the next equal-weight cut) isolates
    //    the trailing whale; this entry folds ~20% of rows onto one
    //    LAST-sorting subject and RAISES unless it got a group of its
    //    own with every other group inside the provable bound — then
    //    the DuckDB compare pins exactly-once through the tiling.
    //    Fixture window: W/8 < whale < W/4 (both bounds RAISED — below,
    //    isolation is not the deterministic outcome; above, the
    //    midpoint crosses the last cut early and the whale may merge).
    QueryDef(
      "q242_live_es_ranged_weighted_tail",
      (s, d) => {
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            when(col("user_id") % 5 === 0, lit("z-hot"))
              .otherwise(col("user_id").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured read is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"wt$i", subj, tsu,
              s"""{"id":"wt$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        val wOf: Map[String, Long] =
          evs.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
        val census = wOf.keys.toSeq.sorted
        val g = 8
        val total = wOf.values.sum
        val share = (total + g - 1) / g
        val maxCold = (wOf - "z-hot").values.max
        require(census.last == "z-hot" && wOf("z-hot") > share && wOf("z-hot") < total / 4,
          s"fixture: trailing whale ${wOf("z-hot")} must sit in (share=$share, W/4=${total / 4})")
        def stage(lines: Seq[String]): java.nio.file.Path = {
          val f = java.nio.file.Files.createTempFile("graft-q242", ".txt")
          java.nio.file.Files.write(f, lines.mkString("", "\n", "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          f
        }
        val cPath = stage(census)
        val wPath = stage(census.map(sub => s"$sub\t${wOf(sub)}"))
        val ranges = graft.sources.StatusLiveSource.planCensusRangesHot(
          cPath.toString, None, g, Set.empty, Some(wPath.toString)).ranges
        val tiles = ranges.map(r => graft.sources.StatusLiveSource.readRange(
          cPath.toString, r.cStart, r.cEnd))
        require(tiles.flatten == census, "weighted tiles must reconstruct the census")
        require(tiles.last == Seq("z-hot"),
          s"the TRAILING whale must own its group, got last tile ${tiles.last.takeRight(3)}")
        val coldLoads = tiles.init.map(_.map(wOf).sum)
        require(coldLoads.forall(_ <= share + maxCold),
          s"cold group past the provable bound ${share + maxCold}: $coldLoads")
        val served = new java.util.concurrent.atomic.AtomicLong
        val server = startStub(docs, served = served)
        try {
          val live = s.read.format("graft-status-live")
            .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
            .option("batchSize", "500")
            .option("subjectsPath", cPath.toString)
            .option("censusWeightsPath", wPath.toString)
            .option("censusRanges", g.toString).load()
          require(live.rdd.getNumPartitions == ranges.length,
            s"expected ${ranges.length} weighted groups, planned ${live.rdd.getNumPartitions}")
          val out = live
            .select(col("subject"),
              get_json_object(col("data"), "$.cents").cast("long").as("cents"))
            .groupBy(col("subject"))
            .agg(count(lit(1)).as("n_docs"), sum(col("cents")).as("cents"))
            .localCheckpoint(true) // materialize THROUGH the weighted ranged plan
          val extraPages = wOf.values.map(w => (w + 499) / 500 - 1).sum
          require(served.get() >= total && served.get() - total <= extraPages,
            s"wire served ${served.get()} of $total docs (allowed overlap $extraPages)")
          out
        } finally {
          server.stop(0)
          java.nio.file.Files.deleteIfExists(cPath)
          java.nio.file.Files.deleteIfExists(wPath)
        }
      },
      Some("""WITH m AS (
               SELECT CASE WHEN user_id % 5 = 0 THEN 'z-hot'
                           ELSE CAST(user_id AS VARCHAR) END AS subject,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
             SELECT subject, count(*)::BIGINT AS n_docs, sum(cents)::BIGINT AS cents
             FROM m GROUP BY 1"""),
    ),

    // ── ALIAS-FLEET sync (r18): a dim mapping SEVERAL tokenIds to one
    //    subject (re-registrations, integration aliases — the reference's
    //    dim tolerates it, deviceapi/service.go:62-70 keys by subject).
    //    The cluster-staged stops/weights files are keyed BY SUBJECT, so
    //    the staging must re-aggregate after the dim join: per-token
    //    lines would duplicate the subject and crash the ranged planner's
    //    strict-sorted require. Tokens here carry DIFFERENT watermarks on
    //    one subject, so the aggregate CHOICE is observable: the backfill
    //    fetches `time < watermark`, so the subject's wire stop must be
    //    the MAX over its tokens (the union of their windows — an
    //    arbitrary or MIN pick UNDERSHIPS the newer-watermark token), and
    //    run()'s per-token watermark join clips the overlap exactly. The
    //    entry RAISES unless the staged files carry exactly ONE line per
    //    subject with the max-stop / summed-depth contents; the DuckDB
    //    compare then pins the exact per-token clipping.
    QueryDef(
      "q243_live_sync_alias_fleet",
      (s, d) => {
        import graft.jobs.{SyncJob, SyncOptions}
        import graft.sources.DeviceDim
        // pair CONSECUTIVE ids onto one subject: aliasing is guaranteed
        // at every SF, every aliased pair's (t % 3) differ (consecutive
        // ints), and the doc fan-out in the per-token watermark join
        // stays exactly 2x — a modulus-style mapping packs hundreds of
        // tokens per subject at sf0.1 and turns the join into the
        // fixture's own blow-up (first bench run: 18.9 s)
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token"),
            concat(lit("v"), expr("user_id DIV 2").cast("string")).as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured sync is below
        val docs: IndexedSeq[StubDoc] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(1), r.getLong(2), r.getLong(3))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"al$i", subj, tsu,
              s"""{"id":"al$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v1.0",""" +
                s""""type":"com.dimo.device.status","data":{"speed":$cents,"make":"m"}}""")
          }
        val tokens = evs.map(_.getLong(0)).distinct.sorted.toSeq
        val subjOf: Map[Long, String] = tokens.map(t => t -> s"v${t / 2}").toMap
        // per-TOKEN watermarks, deterministically spread so tokens of one
        // subject DIFFER (integer arithmetic mirrored exactly in the
        // oracle SQL's // divisions)
        val tsAll = evs.map(_.getLong(2))
        val wmin = tsAll.min
        val span = tsAll.max - wmin
        def wOfTok(t: Long): Long = wmin + span / 2 + (t % 3) * (span / 8)
        // fixture invariants, RAISED if testdata generation drifts: real
        // aliasing, and a subject whose tokens carry DIFFERENT watermarks
        val bySubj = tokens.groupBy(subjOf)
        require(bySubj.values.exists(_.size > 1), "fixture: no aliased subject")
        require(span > 8 && bySubj.values.exists(_.map(_ % 3).distinct.size > 1),
          "fixture: no subject with divergent per-token watermarks")
        import s.implicits._
        val sink = tokens.map(t => (t, wOfTok(t))).toDF("tokenId", "wus")
          .select(col("tokenId"), expr("timestamp_micros(wus)").as("timestamp"))
        val dim = DeviceDim.fromPairs(s, tokens.map(t => (t, subjOf(t))))
        val opts = SyncOptions(tokens = tokens.map(_.toString),
          start = Some(new java.sql.Timestamp(0L)),
          stop = Some(new java.sql.Timestamp(9999999999999L)))
        val staging = java.nio.file.Files.createTempDirectory("graft-q243-staging")
        val server = startStub(docs, pitMode = true)
        try {
          val out = SyncJob.runLiveRanged(s,
            s"http://127.0.0.1:${server.getAddress.getPort}", dim,
            existingSink = Some(sink), opts, stagingDir = staging.toString,
            batchSize = 2000, censusRanges = 4, weightBySinkDepth = true)
            .groupBy(col("tokenId").as("token_id"))
            .agg(count(lit(1)).as("n_signals"),
              sum(when(col("name") === "Vehicle.Speed", col("valueNumber"))
                .otherwise(lit(0.0))).cast(LongType).as("speed_sum"),
              expr("min(unix_micros(timestamp))").as("oldest_us"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
            .localCheckpoint(true) // materialize THROUGH the staged plan
          // the staging contract, RAISED: exactly ONE line per subject —
          // stops at the ceil-ms of the subject's MAX token watermark,
          // weights at the subject's SUMMED sink depth (1 row per token)
          import scala.jdk.CollectionConverters._
          def staged(name: String): Seq[String] = {
            val f = java.nio.file.Files.list(staging.resolve(name)).iterator().asScala
              .find(_.getFileName.toString.startsWith("part-")).get
            java.nio.file.Files.readAllLines(f).asScala.filter(_.nonEmpty).toSeq
          }
          val subjects = bySubj.keys.toSeq.sorted
          val wantStops = subjects.map { sub =>
            val stopMs = (bySubj(sub).map(wOfTok).max + 999L) / 1000L
            s"$sub\t$stopMs"
          }
          require(staged("stops") == wantStops,
            s"stops must stage ONE max-watermark line per subject: ${staged("stops")}")
          val wantWeights = subjects.map(sub => s"$sub\t${bySubj(sub).size}")
          require(staged("weights") == wantWeights,
            s"weights must stage ONE summed-depth line per subject: ${staged("weights")}")
          out
        } finally {
          server.stop(0)
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(staging).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      },
      Some("""WITH e AS (
               SELECT 'v' || CAST(user_id // 2 AS VARCHAR) AS subj,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             b AS (SELECT min(us) AS wmin, max(us) - min(us) AS span FROM e),
             tok AS (SELECT DISTINCT CAST(user_id AS BIGINT) AS token_id,
                            'v' || CAST(user_id // 2 AS VARCHAR) AS subj
                     FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
             wm AS (SELECT token_id, subj,
                           wmin + span // 2 + (token_id % 3) * (span // 8) AS w
                    FROM tok, b),
             x AS (SELECT wm.token_id, e.cents, e.us
                   FROM wm JOIN e ON e.subj = wm.subj WHERE e.us < wm.w)
             SELECT token_id, (count(*) * 2)::BIGINT AS n_signals,
               sum(cents)::BIGINT AS speed_sum,
               CAST(min(us) AS BIGINT) AS oldest_us,
               CAST(max(us) AS BIGINT) AS newest_us
             FROM x GROUP BY 1"""),
    ),

    // ── The reference's CONTINUOUS pipeline over BOTH wires (r14):
    //    `readStream` from live ES → transform → `writeStream` into live
    //    CH (its loop tails ES and inserts into CH forever, sync.go:92-125
    //    + clickhouse.go:113-130) — the streaming WRITE completing the
    //    tier's symmetry (both live sources stream-read; the CH side now
    //    stream-writes). Phase 1 tails the older half of history into the
    //    CH stub; the stream RESTARTS from its checkpoint after the newer
    //    half lands and must ship ONLY it. Exactly-once is the tail's
    //    monotonic offsets composed with the writer's epoch-scoped dedup
    //    tokens — a re-read duplicates, an offset overshoot loses, a
    //    replayed epoch double-inserts, and any of them breaks the DuckDB
    //    match on the CH read-back (one pass over the whole events table).
    QueryDef(
      "q232_live_stream_es_to_ch",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        val evs = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("subject"),
            expr("unix_micros(ts)").as("tsu"),
            round(col("value") * 100).cast(LongType).as("cents"))
          .collect() // seeds the TEST DOUBLE; the measured path is the stream
        val mid = { val ts = evs.map(_.getLong(1)); (ts.min + ts.max) / 2 }
        def mkDocs(rows: Seq[org.apache.spark.sql.Row]): IndexedSeq[StubDoc] =
          rows.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            StubDoc(s"sc$subj-$tsu-$i", subj, tsu,
              s"""{"id":"sc$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"cents":$cents}}""")
          }
        // ms-boundary split: the ES tail's offsets are ms-granular
        val (newer, older) = evs.toIndexedSeq.partition(_.getLong(1) / 1000 >= mid / 1000)
        val chServer = ChSignalStub.start()
        try {
          val chUrl = s"http://127.0.0.1:${chServer.getAddress.getPort}"
          new ClickHouseHttpClient(chUrl)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          val ckpt = java.nio.file.Files.createTempDirectory("graft-q232-ck").toString
          def pipeOnce(docs: IndexedSeq[StubDoc]): Unit = {
            val esServer = startStub(docs)
            try {
              val q = s.readStream.format("graft-status-live")
                .option("url", s"http://127.0.0.1:${esServer.getAddress.getPort}")
                .option("batchSize", "2000").load()
                .select(col("subject").cast(LongType).as("token_id"),
                  col("time").as("timestamp"),
                  lit("cents").as("name"),
                  get_json_object(col("data"), "$.cents").cast("double").as("value_number"),
                  col("id").cast("string").as("value_string"))
                .writeStream.format("graft-signal-live")
                .option("url", chUrl)
                .option("checkpointLocation", ckpt)
                .start()
              try q.processAllAvailable() finally q.stop()
            } finally esServer.stop(0)
          }
          pipeOnce(mkDocs(older))          // phase 1: the older half
          pipeOnce(mkDocs(older ++ newer)) // phase 2: restart; only the newer half ships
          s.read.format("graft-signal-live").option("url", chUrl).load()
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
            .localCheckpoint(true) // materialize THROUGH both wire stacks
        } finally chServer.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── Quantile-BALANCED token-range planning (r14): equal-width ranges
    //    over [min, max] collapse under id skew — one sparse outlier
    //    stretches the span a billion-fold and every real row lands in
    //    one task (at 100 TB: one task scans everything, the rest idle).
    //    Planning now asks the STORE for equal-rowcount cut points
    //    (`quantiles(1/m…)(token_id)` under the scan's WHERE) and builds
    //    ranges between them; a quantile-less server degrades to
    //    equal-width (one failed statement, never a wrong plan). The
    //    entry seeds the events fleet PLUS a far outlier token, RAISES
    //    unless the planned ranges are balanced (no partition owns >55%
    //    of rows) AND cover exactly, then reads back through the DSv2
    //    scan for the oracle compare.
    QueryDef(
      "q233_live_ch_balanced",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .union(s.range(1).select( // the skew: one token a billion away
            lit(1000000000L).as("token_id"),
            lit(java.sql.Timestamp.valueOf("2030-01-01 00:00:00")).as("timestamp"),
            lit("outlier").as("name"),
            lit(42.0).as("value_number"),
            lit("o1").cast(StringType).as("value_string")))
          .repartition(8)
        val server = ChSignalStub.start()
        try {
          val base = s"http://127.0.0.1:${server.getAddress.getPort}"
          new ClickHouseHttpClient(base)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          signals.write.format("graft-signal-live")
            .option("url", base).mode("append").save()
          // plan audit: the ranges the scan would run, executed directly —
          // balance AND exact coverage are REQUIRED before any oracle math
          val scan = new graft.sources.SignalLiveScanBuilder(base, "signal", 4)
            .build().asInstanceOf[graft.sources.SignalLiveScan]
          val client = new ClickHouseHttpClient(base)
          val counts = scan.planInputPartitions().toSeq
            .map(_.asInstanceOf[graft.sources.SignalLivePartition])
            .map(p => client.query(p.sql).size.toLong)
          val total = counts.sum
          require(counts.forall(_ > 0), s"empty partition under skew: $counts")
          require(counts.max.toDouble / total < 0.55,
            s"one task owns the skewed corpus (equal-width plan leaked): $counts")
          s.read.format("graft-signal-live")
            .option("url", base).option("partitions", "4").load()
            .groupBy(col("name"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              max(col("token_id")).as("max_token"))
            .localCheckpoint(true) // materialize THROUGH the balanced plan
        } finally server.stop(0)
      },
      Some("""WITH sig AS (
               SELECT CAST(user_id AS BIGINT) AS token_id, event_type AS name,
                      CAST(round(value*100) AS BIGINT) AS cents
               FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
               UNION ALL SELECT 1000000000, 'outlier', 42)
             SELECT name, count(*)::BIGINT AS n_rows,
               sum(cents)::BIGINT AS cents,
               max(token_id)::BIGINT AS max_token
             FROM sig GROUP BY 1"""),
    ),

    // ── SUB-TOKEN timestamp cuts (r15): q233 balances across token
    //    boundaries, but the commonest real skew is SINGLE-KEY — one hot
    //    device owning most of the table, which no token-granular cut can
    //    split (the quantiles collapse onto it and its whole history
    //    lands in one task). Planning now detects the collapse (a raw
    //    quantile value repeated ≥2 times — at m=4 even a 60%-of-rows
    //    token repeats only twice, SignalLiveSource), asks the store for that
    //    token's TIMESTAMP quantiles, and plans
    //    `token_id = hot AND ts ∈ [a,b)` partitions — still index-local
    //    reads (the primary key is (token_id, timestamp)), still
    //    disjoint and gap-free. The entry seeds ~90% of rows into one
    //    token, RAISES unless the hot token actually planned ≥2
    //    timestamp sub-ranges AND no partition owns >55% of rows, then
    //    reads back through the DSv2 scan for the oracle compare.
    QueryDef(
      "q235_live_ch_subtoken",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(
            // the skew: ~90% of users fold into token 7 (one hot device)
            when(col("user_id") % 10 =!= 0, lit(7L))
              .otherwise(col("user_id").cast(LongType)).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
          .repartition(8)
        val server = ChSignalStub.start()
        try {
          val base = s"http://127.0.0.1:${server.getAddress.getPort}"
          new ClickHouseHttpClient(base)
            .execute(ClickHouseDdl.signalTableDdl(graft.sources.SignalLiveSource.Schema))
          signals.write.format("graft-signal-live")
            .option("url", base).mode("append").save()
          // plan audit BEFORE any oracle math: the hot token must have
          // split by timestamp, and the split must actually balance
          val scan = new graft.sources.SignalLiveScanBuilder(base, "signal", 4)
            .build().asInstanceOf[graft.sources.SignalLiveScan]
          val client = new ClickHouseHttpClient(base)
          val parts = scan.planInputPartitions().toSeq
            .map(_.asInstanceOf[graft.sources.SignalLivePartition])
          require(parts.count(_.sql.contains("`token_id` = 7 AND `timestamp`")) >= 2,
            s"hot token kept one task (sub-token cuts did not plan): ${parts.map(_.sql)}")
          val counts = parts.map(p => client.query(p.sql).size.toLong)
          val total = counts.sum
          require(counts.forall(_ > 0), s"empty partition under single-key skew: $counts")
          require(counts.max.toDouble / total < 0.55,
            s"one task owns the hot token's history: $counts")
          s.read.format("graft-signal-live")
            .option("url", base).option("partitions", "4").load()
            .groupBy(col("name"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              countDistinct(col("token_id")).as("n_tokens"),
              expr("max(unix_micros(timestamp))").as("newest_us"))
            .localCheckpoint(true) // materialize THROUGH the sub-token plan
        } finally server.stop(0)
      },
      Some("""SELECT event_type AS name, count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               count(DISTINCT CASE WHEN user_id % 10 <> 0 THEN 7
                                   ELSE user_id END)::BIGINT AS n_tokens,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1"""),
    ),

    // ── LIVE CH streaming tail (r13): `readStream` over
    //    `graft-signal-live` — the CH-side twin of q217, completing the
    //    live tier's symmetry (every live source is a streaming table).
    //    Offsets are the server's own `count(), max(timestamp)` aggregate;
    //    phase 1 tails a store holding only the OLDER half of history into
    //    a parquet sink, then the stream RESTARTS from its checkpoint
    //    after the newer half lands and must read ONLY it (a re-read
    //    duplicates, an offset overshoot loses — either breaks the oracle
    //    on the final sink, which must equal exactly one pass over the
    //    whole events table).
    QueryDef(
      "q223_live_ch_stream_tail",
      (s, d) => {
        import graft.sources.{ClickHouseDdl, ClickHouseHttpClient}
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("token_id", LongType, nullable = false),
          StructField("timestamp", TimestampType, nullable = false),
          StructField("name", StringType, nullable = false),
          StructField("value_number", DoubleType, nullable = true),
          StructField("value_string", StringType, nullable = true)))
        val signals = Tables.load(s, d, "events")
          .where(col("ts").isNotNull && col("user_id").isNotNull)
          .select(col("user_id").cast(LongType).as("token_id"),
            col("ts").cast(TimestampType).as("timestamp"),
            col("event_type").cast(StringType).as("name"),
            round(col("value") * 100).cast(DoubleType).as("value_number"),
            col("event_id").cast(StringType).as("value_string"))
        // split by VALUE at the micro midpoint: halves never share a
        // microsecond, so the phase-2 floor (olderMax + 1µs) is exact
        val bounds = signals.agg(expr("min(unix_micros(timestamp))"),
          expr("max(unix_micros(timestamp))")).head()
        val midUs = (bounds.getLong(0) + bounds.getLong(1)) / 2
        val older = signals.where(expr(s"unix_micros(timestamp) < $midUs")).repartition(4)
        val newer = signals.where(expr(s"unix_micros(timestamp) >= $midUs")).repartition(4)
        val server = ChSignalStub.start()
        try {
          val url = s"http://127.0.0.1:${server.getAddress.getPort}"
          val client = new ClickHouseHttpClient(url)
          client.execute(ClickHouseDdl.signalTableDdl(schema))
          val outDir = java.nio.file.Files
            .createTempDirectory("graft-q223-out").toString + "/tail"
          val ckpt = java.nio.file.Files.createTempDirectory("graft-q223-ck").toString
          def tailOnce(): Unit = {
            val q = s.readStream.format("graft-signal-live")
              .option("url", url).option("partitions", "4").load()
              .select(col("token_id"), expr("unix_micros(timestamp)").as("us"),
                col("value_number"))
              .writeStream.format("parquet")
              .option("path", outDir).option("checkpointLocation", ckpt)
              .start()
            try q.processAllAvailable() finally q.stop()
          }
          // each phase is its own logical run, tagged by (table, window
          // identity): a re-submitted phase would dedup end-to-end
          client.insertSignals(older, "signal",
            runTag = Some(ClickHouseHttpClient.jobRunTag("signal", "q223-older-half")))
          tailOnce() // phase 1: the older half
          client.insertSignals(newer, "signal",
            runTag = Some(ClickHouseHttpClient.jobRunTag("signal", "q223-newer-half")))
          tailOnce() // phase 2: restart; only the newer half may arrive
          s.read.parquet(outDir)
            .groupBy(col("token_id"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("value_number")).cast(LongType).as("cents"),
              min(col("us")).as("oldest_us"),
              max(col("us")).as("newest_us"))
        } finally server.stop(0)
      },
      Some("""SELECT CAST(user_id AS BIGINT) AS token_id,
               count(*)::BIGINT AS n_rows,
               sum(CAST(round(value*100) AS BIGINT))::BIGINT AS cents,
               CAST(min(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS oldest_us,
               CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS newest_us
             FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
             GROUP BY 1""")
    )
  )
}
