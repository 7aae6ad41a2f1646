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

  /** Minimal `_search` stub over a fixed corpus of (id, subject, timeUs,
    * json) docs. Single purpose: honor the pushed filters + size + desc
    * sort. Daemon-pooled executor; the caller stops it.
    */
  private[graft] def startStub(docs: IndexedSeq[(String, String, Long, String)]): HttpServer = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 1024)
    val tf = new java.util.concurrent.ThreadFactory {
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "live-es-stub"); t.setDaemon(true); t
      }
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32, tf))
    // the stub's own inverted index: docs pre-bucketed by subject and
    // pre-sorted newest-first, so a per-subject page request costs its
    // bucket, not a corpus scan (a real ES does at least this well)
    val bySubject: Map[String, IndexedSeq[(String, String, Long, String)]] =
      docs.groupBy(_._2).view.mapValues(
        _.sortBy { case (id, _, tUs, _) => (-tUs, id) }).toMap
    val allSorted = docs.sortBy { case (id, _, tUs, _) => (-tUs, id) }
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = mapper.readTree(ex.getRequestBody.readAllBytes())
        val size = req.path("size").asInt(10)
        var subject: Option[String] = None
        var gteMs: Option[Long] = None
        var ltMs: Option[Long] = None
        req.path("query").path("bool").path("filter").forEach { f =>
          val m = f.path("match").path("subject").path("query")
          if (m.isTextual) subject = Some(m.asText())
          val r = f.path("range").path("time")
          if (r.has("gte")) gteMs = Some(r.get("gte").asText().toLong)
          if (r.has("lt")) ltMs = Some(r.get("lt").asText().toLong)
        }
        val hits = subject.map(s => bySubject.getOrElse(s, IndexedSeq.empty))
          .getOrElse(allSorted).iterator
          .filter { case (_, _, tUs, _) =>
            gteMs.forall(tUs / 1000 >= _) && ltMs.forall(tUs / 1000 < _)
          }
          .take(size).toSeq
          .map { case (id, _, _, json) =>
            s"""{"_index":"device-status","_id":"$id","_source":$json}"""
          }
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
        val docs: IndexedSeq[(String, String, Long, String)] =
          evs.toIndexedSeq.zipWithIndex.map { case (r, i) =>
            val (subj, tsu, cents) = (r.getString(0), r.getLong(1), r.getLong(2))
            val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
            val json =
              s"""{"id":"e$i","subject":"$subj","source":"dimo/integration/live",""" +
                s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
                s""""type":"com.dimo.device.status","data":{"vehicle":{"cents":$cents}}}"""
            (s"e$i", subj, tsu, json)
          }
        val subjects = docs.map(_._2).distinct.sorted
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
             GROUP BY 1""")
    )
  )
}
