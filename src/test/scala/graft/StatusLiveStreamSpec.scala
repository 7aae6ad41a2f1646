package graft

import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import org.apache.spark.sql.functions._

/** Continuous sync over the wire: `readStream.format("graft-status-live")`
  * tails the live index in event-time micro-batches. Offsets come from the
  * server's own max-time aggregation, batches read half-open windows
  * through the same per-subject page loops as the batch scan, the
  * checkpoint survives restarts, and a late write below a committed offset
  * is (documented) the batch backfill path's job, not the tail's.
  */
class StatusLiveStreamSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()
  private val Base = 1704000000000L

  private def doc(id: String, subject: String, ms: Long): String =
    s"""{"id":"$id","subject":"$subject","source":"s","specversion":"1.0",""" +
      s""""time":"${java.time.Instant.ofEpochMilli(ms)}","data":{"n":1}}"""

  /** Mutable-corpus `_search` stub incl. the max-time aggregation. */
  private def startStub(corpus: CopyOnWriteArrayList[(String, String, Long)]): HttpServer = {
    val server = graft.queries.LiveQueries.loopbackServer(64)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = mapper.readTree(ex.getRequestBody.readAllBytes())
        import scala.jdk.CollectionConverters._
        def respond(res: String): Unit = {
          val bytes = res.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        }
        if (req.path("aggs").has("max_time")) {
          val v = corpus.asScala.map(_._3).maxOption.map(_.toString).getOrElse("null")
          respond(s"""{"aggregations":{"max_time":{"value":$v}},"hits":{"hits":[]}}""")
          return
        }
        val size = req.path("size").asInt(10)
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
        val hits = corpus.asScala
          .filter { case (_, s, t) => subject.forall(_ == s) &&
            gte.forall(t >= _) && lt.forall(t < _) }
          .sortBy { case (id, _, t) => (-t, id) }
          .take(size)
          .map { case (id, s, t) => s"""{"_id":"$id","_source":${doc(id, s, t)}}""" }
        respond(s"""{"hits":{"hits":[${hits.mkString(",")}]}}""")
      }
    })
    server.start()
    server
  }

  test("the live tail reads forward in event time, exactly once, across restarts") {
    val corpus = new CopyOnWriteArrayList[(String, String, Long)]()
    (0 until 10).foreach(i => corpus.add((s"a$i", s"s${i % 2}", Base + i * 1000L)))
    val server = startStub(corpus)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-live-stream").toString
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      def stream() = spark.readStream.format("graft-status-live")
        .option("url", url).option("batchSize", "4").load()
        .select(col("id"), col("subject"), col("time"))
      def start(sinkName: String) = stream().writeStream
        .format("memory").queryName(sinkName)
        .option("checkpointLocation", ckpt)
        .start()
      val q1 = start("live_tail_1")
      try {
        q1.processAllAvailable()
        assert(spark.table("live_tail_1").count() === 10, "batch 1 = the seed corpus")
        // newer docs appear: the next trigger reads ONLY them
        (0 until 5).foreach(i => corpus.add((s"b$i", "s0", Base + 20000L + i * 1000L)))
        q1.processAllAvailable()
        assert(spark.table("live_tail_1").count() === 15)
        val ids = spark.table("live_tail_1").select("id").collect().map(_.getString(0))
        assert(ids.length === ids.distinct.length, "exactly once — no boundary duplicates")
        // a LATE write below the committed offset is the batch backfill's
        // job (runLive), not the tail's — it must NOT duplicate or appear
        corpus.add(("late0", "s1", Base + 1000L))
        corpus.add(("c0", "s1", Base + 30000L))
        q1.processAllAvailable()
        val got = spark.table("live_tail_1").select("id").collect().map(_.getString(0)).toSet
        assert(got.contains("c0") && !got.contains("late0"),
          s"forward tail: new doc in, late backfill out — got ${got.size}")
      } finally q1.stop()

      // restart semantics need a recoverable sink (memory does not
      // checkpoint): tail into parquet, stop, append docs, restart with
      // the SAME checkpoint — only post-offset docs arrive, exactly once
      val outDir = java.nio.file.Files.createTempDirectory("graft-live-out").toString + "/out"
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-live-ck2").toString
      def startPq() = stream().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt2).start()
      val q2 = startPq()
      try q2.processAllAvailable() finally q2.stop()
      val before = spark.read.parquet(outDir).count() // the full corpus incl. late0
      (0 until 3).foreach(i => corpus.add((s"d$i", "s0", Base + 40000L + i * 1000L)))
      val q3 = startPq()
      try q3.processAllAvailable() finally q3.stop()
      val after = spark.read.parquet(outDir)
      assert(after.count() === before + 3,
        "the restarted tail resumes at the committed offset — 3 new rows, zero re-reads")
      val ids3 = after.select("id").collect().map(_.getString(0))
      assert(ids3.length === ids3.distinct.length, "exactly once across the restart")
      assert(Set("d0", "d1", "d2").subsetOf(ids3.toSet))
    } finally server.stop(0)
  }

  test("offsets are monotonic: a server max-time REGRESSION (shrink/reindex) never re-reads the gap") {
    // ADVICE r12: if the index shrinks (reindex, alias swap) the max-time
    // probe can return LESS than the committed offset; recording the lower
    // offset would make the next advance re-read [lower, previous) and
    // duplicate documents in the tail sink. latestOffset clamps to the
    // high-water mark instead.
    val corpus = new CopyOnWriteArrayList[(String, String, Long)]()
    (0 until 10).foreach(i => corpus.add((s"m$i", "s0", Base + i * 1000L)))
    val server = startStub(corpus)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val q = spark.readStream.format("graft-status-live")
        .option("url", url).option("batchSize", "50").load()
        .select("id")
        .writeStream.format("memory").queryName("live_tail_mono")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-live-mono").toString)
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("live_tail_mono").count() === 10)
        // the index SHRINKS: server max regresses from Base+9000 to Base+4000
        val dropped = new java.util.ArrayList[(String, String, Long)]()
        corpus.forEach(d => if (d._3 >= Base + 5000L) dropped.add(d))
        corpus.removeAll(dropped)
        q.processAllAvailable() // must be a no-op batch, not a rewind
        assert(spark.table("live_tail_mono").count() === 10)
        // the docs reappear (reindex completes) plus one genuinely new doc:
        // only the new doc may arrive — a regressed offset would re-read
        // the whole [regressed, previous) gap and duplicate m5..m9
        corpus.addAll(dropped)
        corpus.add(("new0", "s0", Base + 20000L))
        q.processAllAvailable()
        val ids = spark.table("live_tail_mono").collect().map(_.getString(0))
        assert(ids.length === ids.distinct.length,
          s"offset regression duplicated: ${ids.groupBy(identity).filter(_._2.length > 1).keys}")
        assert(ids.toSet === (0 until 10).map(i => s"m$i").toSet + "new0")
      } finally q.stop()
    } finally server.stop(0)
  }

  test("a pushed subject filter applies to the tail; offsets round-trip their JSON") {
    val corpus = new CopyOnWriteArrayList[(String, String, Long)]()
    (0 until 12).foreach(i => corpus.add((s"e$i", s"s${i % 3}", Base + i * 1000L)))
    val server = startStub(corpus)
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val q = spark.readStream.format("graft-status-live")
        .option("url", url).option("batchSize", "5").load()
        .where(col("subject") === "s1")
        .select("id")
        .writeStream.format("memory").queryName("live_tail_subj")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-live-stream2").toString)
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("live_tail_subj").collect().map(_.getString(0)).toSet
        assert(got === Set("e1", "e4", "e7", "e10"))
      } finally q.stop()
      import graft.sources.StatusLiveOffset
      val o = StatusLiveOffset(1704000012345L)
      assert(StatusLiveOffset.fromJson(o.json()) === o)
    } finally server.stop(0)
  }
}
