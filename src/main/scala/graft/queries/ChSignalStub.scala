package graft.queries

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Loopback ClickHouse stub for the `graft-signal-live` READ source: a
  * 5-column `signal` table (token_id, timestamp, name, value_number,
  * value_string) behind CH's HTTP interface, evaluating exactly the SQL
  * grammar [[graft.sources.SignalLiveSource]] emits — the planning
  * envelope (`min/max(token_id), count()`), row SELECTs with translated
  * WHERE atoms and LIMIT, and partial-aggregate SELECTs with GROUP BY.
  * Anything outside the grammar is a 400: if the source ever emits SQL it
  * does not declare, the gate fails loudly instead of silently matching.
  * Inserts arrive as the writer's CSV batches (epoch-decimal timestamps).
  */
object ChSignalStub {

  final case class SRow(token: Long, us: Long, name: String,
      num: Option[Double], str: Option[String])

  private val CsvLine = java.util.regex.Pattern.compile(
    "^(\\d+),([0-9.]+),\"((?:[^\"]|\"\")*)\",([-0-9.eE+]*),(?:\"((?:[^\"]|\"\")*)\")?$")

  /** An aggregate SELECT item (vs a per-row expression — note the per-row
    * `toUnixTimestamp64Micro(\`timestamp\`)` also contains parens).
    */
  private def isAggItem(it: String): Boolean =
    it.startsWith("count(") || it.startsWith("min(") || it.startsWith("max(") ||
      it.startsWith("sum(") || it.startsWith("toUnixTimestamp64Micro(min(") ||
      it.startsWith("toUnixTimestamp64Micro(max(") || it.startsWith("quantiles(")

  private val Quantiles = java.util.regex.Pattern.compile(
    "quantiles\\(([0-9.,]+)\\)\\((`token_id`|toUnixTimestamp64Micro\\(`timestamp`\\))\\)")

  /** Parse one WHERE atom into a row predicate; None = outside grammar. */
  private def atom(a: String): Option[SRow => Boolean] = {
    val TokEq = """`token_id` = (\d+)""".r
    val TokIn = """`token_id` IN \(([\d,]+)\)""".r
    val TokGte = """`token_id` >= (-?\d+)""".r
    val TokLt = """`token_id` < (-?\d+)""".r
    val NameEq = """`name` = '((?:[^'\\]|\\.)*)'""".r
    val NameIn = """`name` IN \((.*)\)""".r
    val TsGte = """`timestamp` >= fromUnixTimestamp64Micro\((-?\d+)\)""".r
    val TsLt = """`timestamp` < fromUnixTimestamp64Micro\((-?\d+)\)""".r
    val NotNull = """`(\w+)` IS NOT NULL""".r
    def unesc(s: String) = s.replace("\\'", "'").replace("\\\\", "\\")
    a match {
      case TokEq(v)  => Some(r => r.token == v.toLong)
      case TokIn(vs) => val set = vs.split(',').map(_.toLong).toSet; Some(r => set(r.token))
      case TokGte(v) => Some(r => r.token >= v.toLong)
      case TokLt(v)  => Some(r => r.token < v.toLong)
      case NameEq(s) => val want = unesc(s); Some(r => r.name == want)
      case NameIn(vs) =>
        val set = vs.split(',').map(_.trim.stripPrefix("'").stripSuffix("'")).map(unesc).toSet
        Some(r => set(r.name))
      case TsGte(v)  => Some(r => r.us >= v.toLong)
      case TsLt(v)   => Some(r => r.us < v.toLong)
      case NotNull(c) => c match {
        case "token_id" | "timestamp" | "name" => Some(_ => true)
        case "value_number" => Some(_.num.isDefined)
        case "value_string" => Some(_.str.isDefined)
        case _ => None
      }
      case _ => None
    }
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n")

  /** Render one double the way both sides of the loopback agree on. */
  private def num(d: Double): String =
    if (d == d.longValue.toDouble) d.toString else d.toString

  /** Evaluate one SELECT item over a filtered group/row set. */
  private def item(expr: String, rows: Seq[SRow], one: Option[SRow],
      quantilesSupported: Boolean = true): Option[String] = {
    def agg[T](f: Seq[SRow] => T): Option[String] = Some(f(rows).toString)
    expr match {
      case "`token_id`" => one.map(_.token.toString)
      case "toUnixTimestamp64Micro(`timestamp`)" => one.map(_.us.toString)
      case "`name`" => one.map(r => esc(r.name))
      case "`value_number`" => one.map(_.num.map(num).getOrElse("\\N"))
      case "`value_string`" => one.map(_.str.map(esc).getOrElse("\\N"))
      case "1" => one.map(_ => "1")
      case "count()" => agg(_.size)
      case "count(`value_number`)" => agg(_.count(_.num.isDefined))
      case "count(`value_string`)" => agg(_.count(_.str.isDefined))
      case "count(`token_id`)" | "count(`name`)" | "count(`timestamp`)" => agg(_.size)
      case "min(`token_id`)" => agg(_.map(_.token).minOption.getOrElse(0L))
      case "max(`token_id`)" => agg(_.map(_.token).maxOption.getOrElse(0L))
      case "toUnixTimestamp64Micro(min(`timestamp`))" => agg(_.map(_.us).minOption.getOrElse(0L))
      case "toUnixTimestamp64Micro(max(`timestamp`))" => agg(_.map(_.us).maxOption.getOrElse(0L))
      case "min(`value_number`)" =>
        Some(rows.flatMap(_.num).minOption.map(num).getOrElse("\\N"))
      case "max(`value_number`)" =>
        Some(rows.flatMap(_.num).maxOption.map(num).getOrElse("\\N"))
      case "sum(`value_number`)" =>
        Some(if (rows.forall(_.num.isEmpty)) "\\N" else num(rows.flatMap(_.num).sum))
      case "sum(`token_id`)" => agg(_.map(_.token).sum)
      case "min(`name`)" => Some(rows.map(_.name).minOption.map(esc).getOrElse("\\N"))
      case "max(`name`)" => Some(rows.map(_.name).maxOption.map(esc).getOrElse("\\N"))
      case "min(`value_string`)" =>
        Some(rows.flatMap(_.str).minOption.map(esc).getOrElse("\\N"))
      case "max(`value_string`)" =>
        Some(rows.flatMap(_.str).maxOption.map(esc).getOrElse("\\N"))
      case q if q.startsWith("quantiles(") && quantilesSupported =>
        // the balanced-planning probes: CH's quantiles(...)(col) renders a
        // TabSeparated array like [3,7.5,12]; an empty set renders nans
        // (the client's parse failure then degrades it to equal-width).
        // Two column forms — token ids (the range plan) and epoch-micro
        // timestamps (the sub-token cuts a hot token is split by).
        val m = Quantiles.matcher(q)
        if (!m.matches()) None
        else {
          val ps = m.group(1).split(',').map(_.toDouble)
          val xs = (if (m.group(2) == "`token_id`") rows.map(_.token)
            else rows.map(_.us)).sorted
          val vals = ps.map { p =>
            if (xs.isEmpty) "nan"
            else xs(math.min(xs.size - 1,
              math.round(p * (xs.size - 1)).toInt)).toString
          }
          Some(vals.mkString("[", ",", "]"))
        }
      case _ => None
    }
  }

  /** Start the stub; returns the server. The caller stops it.
    *
    * @param server the listening server to attach to — the default plain
    *        loopback, or a caller-built `HttpsServer` (TLS/mTLS gate
    *        entries run the SAME grammar over a real handshake).
    * @param gzip when true the stub ENFORCES the compressed wire posture
    *        end-to-end, like a bandwidth-billed production cluster would
    *        reward: INSERT bodies must arrive `Content-Encoding: gzip`
    *        (identity bodies 400), every request must offer
    *        `Accept-Encoding: gzip`, SELECTs must carry
    *        `enable_http_compression=1`, and every response body —
    *        including the streamed row SELECTs — is served gzipped. A
    *        client whose compression stack is broken in either direction
    *        cannot pass a single statement.
    * @param auth when set, every request must carry `Authorization:
    *        Basic` for exactly these (user, password) credentials — 401
    *        otherwise, like a real CH with users configured (the
    *        reference authenticates every connection,
    *        clickhouse.go:40-43).
    * @param quantiles when false the stub models an older server without
    *        `quantiles(...)`: the balanced-planning probe 400s and the
    *        scan must degrade to equal-width ranges, never fail.
    */
  def start(server: HttpServer = LiveQueries.loopbackServer(1024),
      gzip: Boolean = false, auth: Option[(String, String)] = None,
      quantiles: Boolean = true,
      statements: java.util.concurrent.ConcurrentLinkedQueue[String] =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()): HttpServer = {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[SRow]()
    val created = new java.util.concurrent.atomic.AtomicBoolean(false)
    // insert_deduplication_token semantics (a real CH's insert-block
    // dedup): a re-sent tokened block is acknowledged but not re-stored
    val seenTokens = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val dirty = new java.util.concurrent.atomic.AtomicBoolean(true)
    val rebuildLock = new Object
    @volatile var snapshot: IndexedSeq[SRow] = IndexedSeq.empty
    // per-token index, rebuilt with the snapshot: a real CH's primary key
    // (ORDER BY token_id) answers a `token_id = N` probe from the index,
    // not a full scan — the reference's per-token oldest-signal loop
    // (clickhouse.go:65-87) issues exactly that shape once per token, and
    // a stub that rescans the corpus per probe turns an O(fleet) loop
    // into O(fleet × corpus) (r18; same test-double floor as the ES
    // stub's cursor resume)
    @volatile var byToken: Map[Long, IndexedSeq[SRow]] = Map.empty
    def all(): IndexedSeq[SRow] = {
      if (dirty.get()) rebuildLock.synchronized {
        if (dirty.getAndSet(false)) {
          import scala.jdk.CollectionConverters._
          snapshot = rows.asScala.toIndexedSeq
          byToken = snapshot.groupBy(_.token)
        }
      }
      snapshot
    }
    def tokenSlice(t: Long): IndexedSeq[SRow] = {
      all(); byToken.getOrElse(t, IndexedSeq.empty)
    }
    val Select = java.util.regex.Pattern.compile(
      "SELECT (.+) FROM `signal`(?: WHERE (.+?))?(?: GROUP BY (.+?))?" +
        "(?: ORDER BY `timestamp`( DESC| ASC)?)?(?: LIMIT (\\d+))? " +
        "FORMAT TabSeparated\\s*", java.util.regex.Pattern.DOTALL)
    def acceptsGzip(ex: HttpExchange): Boolean =
      Option(ex.getRequestHeaders.getFirst("Accept-Encoding"))
        .exists(_.toLowerCase.contains("gzip"))
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val plain = body.getBytes(StandardCharsets.UTF_8)
      val bytes =
        if (gzip && code == 200 && acceptsGzip(ex) && plain.nonEmpty) {
          ex.getResponseHeaders.set("Content-Encoding", "gzip")
          graft.sources.LiveHttp.gzipBytes(plain)
        } else plain
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }
    val expectedAuth = auth.map { case (u, pw) =>
      "Basic " + java.util.Base64.getEncoder.encodeToString(
        s"$u:$pw".getBytes(StandardCharsets.UTF_8))
    }
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        expectedAuth.foreach { want =>
          if (!Option(ex.getRequestHeaders.getFirst("Authorization")).contains(want)) {
            ex.getRequestBody.readAllBytes()
            respond(ex, 401, "Code: 516. DB::Exception: Authentication failed"); return
          }
        }
        val rawQuery = Option(ex.getRequestURI.getRawQuery)
        val q = rawQuery.flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith("query=") =>
            java.net.URLDecoder.decode(kv.substring(6), "UTF-8")
        }).getOrElse("")
        val rawBody = ex.getRequestBody.readAllBytes()
        val bodyGzipped = Option(ex.getRequestHeaders.getFirst("Content-Encoding"))
          .exists(_.equalsIgnoreCase("gzip"))
        val body = new String(
          if (bodyGzipped) graft.sources.LiveHttp.gunzip(rawBody) else rawBody,
          StandardCharsets.UTF_8)
        // compressed-posture enforcement: a gzip stub REJECTS any request
        // whose wire posture regressed to identity — the gate entry fails
        // before any oracle compare can accidentally match
        if (gzip && !acceptsGzip(ex)) {
          respond(ex, 400, "stub requires Accept-Encoding: gzip"); return
        }
        if (gzip && q.startsWith("INSERT") && !bodyGzipped) {
          respond(ex, 400, "stub requires gzip INSERT bodies"); return
        }
        if (gzip && body.startsWith("SELECT ") &&
          !rawQuery.exists(_.contains("enable_http_compression=1"))) {
          respond(ex, 400, "stub requires enable_http_compression=1 on SELECTs"); return
        }
        if (q.startsWith("INSERT INTO `signal`")) {
          if (!created.get()) { respond(ex, 400, "Table signal does not exist"); return }
          val token = Option(ex.getRequestURI.getRawQuery).flatMap(_.split("&").collectFirst {
            case kv if kv.startsWith("insert_deduplication_token=") =>
              java.net.URLDecoder.decode(kv.substring(27), "UTF-8")
          })
          if (token.exists(!seenTokens.add(_))) { respond(ex, 200, ""); return }
          body.split("\n").iterator.filter(_.nonEmpty).foreach { line =>
            val m = CsvLine.matcher(line)
            if (!m.matches()) { respond(ex, 400, s"stub cannot parse CSV line: $line"); return }
            val usDec = BigDecimal(m.group(2))
            rows.add(SRow(m.group(1).toLong, (usDec * 1000000).toLongExact,
              m.group(3).replace("\"\"", "\""),
              Option(m.group(4)).filter(_.nonEmpty).map(_.toDouble),
              Option(m.group(5)).map(_.replace("\"\"", "\""))))
          }
          dirty.set(true)
          respond(ex, 200, "")
        } else if (body.startsWith("CREATE TABLE")) {
          created.set(true); respond(ex, 200, "")
        } else if (body.startsWith("SELECT ")) {
          statements.add(body) // statement ledger: probe-economy pins read it
          val m = Select.matcher(body)
          if (!m.matches()) { respond(ex, 400, s"outside the declared grammar: $body"); return }
          val items = m.group(1).split(", ").toSeq
          val whereAtoms = Option(m.group(2)).toSeq.flatMap(_.split(" AND ").toSeq)
          val preds = whereAtoms.map { a =>
            atom(a).getOrElse { respond(ex, 400, s"unsupported WHERE atom: $a"); return }
          }
          val order = Option(m.group(4)).map(_.trim)
          val limit = Option(m.group(5)).map(_.toInt)
          // token-equality probes start from the per-token index slice (the
          // primary-key read path of a real CH); every predicate still
          // applies — the equality atom just re-verifies on the slice
          val TokEqAtom = """`token_id` = (\d+)""".r
          val base = whereAtoms.collectFirst { case TokEqAtom(v) => v.toLong }
            .map(tokenSlice).getOrElse(all())
          val matched0 = base.filter(r => preds.forall(_(r)))
          val matched = Option(m.group(4)).map(_ => // ORDER BY `timestamp`
            if (order.contains("DESC")) matched0.sortBy(-_.us) else matched0.sortBy(_.us)
          ).getOrElse(matched0)
          Option(m.group(3)) match {
            case Some(g) => // aggregate with GROUP BY (one row per group)
              // the quantiles flag threads through EVERY item() call site:
              // a quantiles-less server must refuse the function in any
              // statement shape, or the stub could mask a probe regression
              val groupExprs = g.split(", ").toSeq
              val out = matched.groupBy(r => groupExprs.map(ge =>
                item(ge, Seq(r), Some(r), quantiles).getOrElse {
                  respond(ex, 400, s"unsupported group expr: $ge"); return
                })).toSeq.sortBy(_._1.mkString("\t"))
                .map { case (_, rs) =>
                  items.map(it => item(it, rs, rs.headOption, quantiles).getOrElse {
                    respond(ex, 400, s"unsupported select item: $it"); return
                  }).mkString("\t")
                }
              respond(ex, 200, out.mkString("", "\n", if (out.isEmpty) "" else "\n"))
            case None if items.forall(isAggItem) =>
              // global aggregate (no GROUP BY): one row
              val out = items.map(it =>
                item(it, matched, matched.headOption, quantiles).getOrElse {
                  respond(ex, 400, s"unsupported select item: $it"); return
                }).mkString("\t")
              respond(ex, 200, out + "\n")
            case None => // row select: STREAMED (chunked), like a real CH —
              // the server never materializes the response either, so an
              // in-JVM probe of the CLIENT's retention isn't polluted by
              // the stub's own copy. Items are row-independent, so they
              // validate BEFORE headers go out (no mid-stream 400s).
              val rowItems = Set("`token_id`", "toUnixTimestamp64Micro(`timestamp`)",
                "`name`", "`value_number`", "`value_string`", "1")
              items.find(it => !rowItems.contains(it)).foreach { bad =>
                respond(ex, 400, s"unsupported select item: $bad"); return
              }
              val sel = matched.iterator.map { r =>
                items.map(it => item(it, Seq(r), Some(r), quantiles).get).mkString("\t")
              }
              val capped = limit.map(sel.take).getOrElse(sel)
              val compress = gzip && acceptsGzip(ex)
              if (compress) ex.getResponseHeaders.set("Content-Encoding", "gzip")
              ex.sendResponseHeaders(200, 0) // chunked
              // gzip mode streams through a GZIPOutputStream — compressed
              // responses stay incremental on the wire, like a real CH
              val os: java.io.OutputStream =
                if (compress) new java.util.zip.GZIPOutputStream(ex.getResponseBody, 1 << 13)
                else new java.io.BufferedOutputStream(ex.getResponseBody, 1 << 16)
              capped.foreach { line =>
                os.write(line.getBytes(StandardCharsets.UTF_8)); os.write('\n')
              }
              os.close()
              ex.close()
          }
        } else respond(ex, 400, s"unsupported statement: $q$body")
      }
    })
    // concurrent request handling, like the ES stub (and a real CH): the
    // default HttpServer executor runs handlers ON the dispatcher thread,
    // serializing every probe in the reference's per-token loop (r18)
    val tf = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "live-ch-stub"); t.setDaemon(true); t
      }
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32, tf))
    server.start()
    server
  }
}
