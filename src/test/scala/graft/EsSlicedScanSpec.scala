package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._

import graft.queries.LiveQueries.StubDoc

/** The PARALLEL whole-window live ES scan (`slices` option): an
  * unfiltered full-index read used to be ONE sequential page loop (the
  * reference has no such scan at all — its loops are per-token); with
  * `slices=N` the scan plans N tasks, each draining its own server-side
  * slice of a point-in-time (`slice:{id,max}` + `sort:_shard_doc` +
  * `search_after` — [[graft.sources.EsHttpClient.slicedDocs]]). Pins:
  *
  *   - exactly-once across slices (the server's disjointness + each
  *     cursor's strict advance): full corpus, no duplicates, N planned
  *     partitions, every slice id requested;
  *   - pushed time windows and LIMIT still apply (window in every slice
  *     request; limit caps each slice, Spark's global Limit above);
  *   - a PIT-less server DEGRADES to the sequential loop on slice 0 —
  *     identical result, never a torn parallel read;
  *   - subject-constrained scans keep the per-subject fan-out and a
  *     pushed DESC top-K keeps the sequential early-stopping loop
  *     (slices read everything; the loop reads K).
  */
class EsSlicedScanSpec extends SparkTestBase {

  private val BaseMs = 1704000000000L

  private def corpus(n: Int): IndexedSeq[StubDoc] =
    (0 until n).map { i =>
      val subj = s"s${i % 37}"
      val ms = BaseMs + i * 1000L
      val iso = java.time.Instant.ofEpochMilli(ms)
      StubDoc(f"d$i%06d", subj, ms * 1000L,
        s"""{"id":"d$i","subject":"$subj","source":"dimo/integration/live",""" +
          s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
          s""""type":"com.dimo.device.status","data":{"i":$i}}""")
    }

  private def url(s: com.sun.net.httpserver.HttpServer) =
    s"http://127.0.0.1:${s.getAddress.getPort}"

  test("slices=4 on a PIT server: full corpus exactly once across 4 parallel slice drains") {
    val docs = corpus(500)
    val served = new java.util.concurrent.atomic.AtomicLong
    val sliceSeen = new ConcurrentLinkedQueue[Int]()
    val server = graft.queries.LiveQueries.startStub(docs, pitMode = true,
      served = served, sliceSeen = sliceSeen)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "64")
        .option("slices", "4").load()
      assert(live.rdd.getNumPartitions === 4, "one task per slice")
      val ids = live.select(get_json_object(col("data"), "$.i").cast("long")).as[Long](
        org.apache.spark.sql.Encoders.scalaLong).collect()
      assert(ids.length === 500 && ids.toSet === (0L until 500L).toSet,
        "every document exactly once across slices")
      assert(served.get() === 500L, "no document served twice (disjoint slices)")
      import scala.jdk.CollectionConverters._
      assert(sliceSeen.asScala.toSet === Set(0, 1, 2, 3), "all four slice ids requested")
    } finally server.stop(0)
  }

  test("pushed time window and LIMIT apply inside every slice request") {
    val docs = corpus(400)
    val served = new java.util.concurrent.atomic.AtomicLong
    val server = graft.queries.LiveQueries.startStub(docs, pitMode = true, served = served)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "64")
        .option("slices", "4").load()
      // half-open window over the middle half of the corpus
      val lo = new java.sql.Timestamp(BaseMs + 100 * 1000L)
      val hi = new java.sql.Timestamp(BaseMs + 300 * 1000L)
      val windowed = live.where(col("time") >= lo && col("time") < hi)
      // a projection keeps this on the ROW path (a bare count() would be
      // answered by the pushed-COUNT probe and serve zero documents)
      assert(windowed.select(col("id")).collect().length === 200)
      // the window reached the server: only matching docs were served
      assert(served.get() === 200L, "the slice requests carried the pushed window")
      // a pushed LIMIT caps each slice loop; the global Limit returns n
      assert(live.limit(37).collect().length === 37)
    } finally server.stop(0)
  }

  test("a PIT-less server degrades to the sequential loop with an identical result") {
    val docs = corpus(300)
    val sliceSeen = new ConcurrentLinkedQueue[Int]()
    val server = graft.queries.LiveQueries.startStub(docs, pitMode = false,
      sliceSeen = sliceSeen)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "64")
        .option("slices", "4").load()
      assert(live.rdd.getNumPartitions === 4, "slices still plan (support is probed per task)")
      val ids = live.select(col("id")).collect().map(_.getString(0))
      assert(ids.length === 300 && ids.toSet.size === 300,
        "slice 0's sequential fallback reads everything exactly once")
      assert(sliceSeen.isEmpty, "no slice request ever reached the PIT-less server")
    } finally server.stop(0)
  }

  test("the streaming tail slices its micro-batch windows too (exactly-once into the sink)") {
    val docs = corpus(240)
    val sliceSeen = new ConcurrentLinkedQueue[Int]()
    val server = graft.queries.LiveQueries.startStub(docs, pitMode = true,
      sliceSeen = sliceSeen)
    try {
      val q = spark.readStream.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "64")
        .option("slices", "4").load()
        .select(col("id"))
        .writeStream.format("memory").queryName("sliced_tail").start()
      try q.processAllAvailable() finally q.stop()
      val ids = spark.sql("SELECT id FROM sliced_tail").collect().map(_.getString(0))
      assert(ids.length === 240 && ids.toSet.size === 240,
        "a sliced micro-batch window delivers exactly once")
      import scala.jdk.CollectionConverters._
      assert(sliceSeen.asScala.toSet === Set(0, 1, 2, 3),
        "the tail's window reads fan into all four slices")
    } finally server.stop(0)
  }

  test("subject fan-out and DESC top-K keep their own plans (slices never apply)") {
    val docs = corpus(200)
    val server = graft.queries.LiveQueries.startStub(docs, pitMode = true)
    try {
      val live = spark.read.format("graft-status-live")
        .option("url", url(server)).option("batchSize", "64")
        .option("slices", "4").load()
      val subjects = (0 until 10).map(i => s"s$i")
      val bySubject = live.where(col("subject").isin(subjects: _*))
      assert(bySubject.rdd.getNumPartitions === 10, "per-subject groups, not slices")
      assert(bySubject.count() === docs.count(d => subjects.contains(d.subject)).toLong)
      // DESC top-K: the sequential loop's newest-first early stop reads K
      // docs; a sliced plan would read the whole index for K rows
      val topK = live.orderBy(col("time").desc).limit(5)
      assert(topK.rdd.getNumPartitions === 1, "top-K keeps the single early-stopping loop")
      val times = topK.collect().map(_.getAs[java.sql.Timestamp]("time").getTime)
      assert(times.toSeq === docs.map(_.timeUs / 1000).sorted.reverse.take(5).toSeq)
    } finally server.stop(0)
  }
}
