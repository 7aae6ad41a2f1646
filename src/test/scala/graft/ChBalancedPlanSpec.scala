package graft

import org.apache.spark.sql.functions._

import graft.queries.ChSignalStub
import graft.sources.{ClickHouseDdl, ClickHouseHttpClient, SignalLiveSource}

/** Quantile-balanced token-range planning for the live CH scan — the
  * SKEW fix: equal-WIDTH ranges over [min(token), max(token)] collapse
  * when ids cluster (one sparse outlier id stretches the span a
  * billion-fold and every real row lands in one partition: at 100 TB
  * that is one task scanning everything while the rest idle). Planning
  * now asks the STORE for equal-rowcount cut points
  * (`quantiles(1/m…)(token_id)` under the scan's own WHERE) and builds
  * ranges between them. Pins:
  *
  *   - a skewed corpus (dense cluster + one far outlier) plans ranges
  *     whose per-partition row counts are BALANCED, and the ranges still
  *     partition the space exactly (disjoint, gap-free: the full read is
  *     exactly-once);
  *   - a server WITHOUT `quantiles` (older CH, minimal stub) degrades to
  *     the equal-width plan — one failed planning statement, identical
  *     results, never a failure;
  *   - tiny results (m == 1) never probe at all.
  */
class ChBalancedPlanSpec extends SparkTestBase {

  private def url(s: com.sun.net.httpserver.HttpServer) =
    s"http://127.0.0.1:${s.getAddress.getPort}"

  /** 8 dense tokens × 500 rows + one far outlier row: equal-width over
    * [1, 10^9] puts all 4000 dense rows in partition 0.
    */
  private def seedSkewed(base: String): Long = {
    val client = new ClickHouseHttpClient(base)
    client.execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
    val sb = new StringBuilder
    var us = 1700000000000000L
    for (tok <- 1 to 8; _ <- 1 to 500) {
      us += 1
      sb.append(s"""$tok,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",1.5,""").append('\n')
    }
    us += 1
    sb.append(s"""1000000000,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",9.5,""").append('\n')
    client.insertCsv("signal",
      Seq("token_id", "timestamp", "name", "value_number", "value_string"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    4001L
  }

  private def partitionCounts(base: String, partitions: Int): Seq[Long] = {
    val scan = new graft.sources.SignalLiveScanBuilder(base, "signal", partitions)
      .build().asInstanceOf[graft.sources.SignalLiveScan]
    val client = new ClickHouseHttpClient(base)
    scan.planInputPartitions().toSeq
      .map(_.asInstanceOf[graft.sources.SignalLivePartition])
      .map(p => client.query(p.sql).size.toLong)
  }

  test("skewed ids plan balanced ranges; coverage stays exactly-once") {
    val server = ChSignalStub.start()
    try {
      val base = url(server)
      val total = seedSkewed(base)
      val counts = partitionCounts(base, partitions = 4)
      assert(counts.sum === total, "ranges must partition the token space exactly")
      assert(counts.forall(_ > 0), s"no empty partitions under quantile planning: $counts")
      assert(counts.max.toDouble / total < 0.55,
        s"no partition may own the whole skewed corpus: $counts")
      // e2e through the DSv2 reader: same rows, exactly once
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      val got = live.select(col("token_id"),
        expr("unix_micros(timestamp)").as("us")).collect()
      assert(got.length.toLong === total)
      assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length.toLong === total)
    } finally server.stop(0)
  }

  test("a single hot token splits into timestamp sub-ranges (sub-token cuts)") {
    // 90% of rows in ONE token: token-granular quantile cuts collapse
    // (0.25/0.5/0.75 all land on the hot token) and no token boundary can
    // split it — the plan must carve the token into
    // `token_id = hot AND ts ∈ [a,b)` ranges balanced by the store's own
    // timestamp quantiles, still disjoint and gap-free
    val server = ChSignalStub.start()
    try {
      val base = url(server)
      val client = new ClickHouseHttpClient(base)
      client.execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      val sb = new StringBuilder
      var us = 1700000000000000L
      for (tok <- 1 to 4; _ <- 1 to 100) {
        us += 1
        sb.append(s"""$tok,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",1.5,""").append('\n')
      }
      for (_ <- 1 to 3600) {
        us += 1
        sb.append(s"""7,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",2.5,""").append('\n')
      }
      client.insertCsv("signal",
        Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val total = 4000L
      val scan = new graft.sources.SignalLiveScanBuilder(base, "signal", 4)
        .build().asInstanceOf[graft.sources.SignalLiveScan]
      val parts = scan.planInputPartitions().toSeq
        .map(_.asInstanceOf[graft.sources.SignalLivePartition])
      assert(parts.count(_.sql.contains("`token_id` = 7 AND `timestamp`")) >= 2,
        s"the hot token must plan timestamp sub-ranges: ${parts.map(_.sql)}")
      val counts = parts.map(p => client.query(p.sql).size.toLong)
      assert(counts.sum === total, "sub-token ranges must still cover exactly")
      assert(counts.forall(_ > 0), s"no empty partitions: $counts")
      assert(counts.max.toDouble / total < 0.55,
        s"the hot token's history may not land in one task: $counts")
      // e2e through the DSv2 reader: same rows, exactly once
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      val got = live.select(col("token_id"),
        expr("unix_micros(timestamp)").as("us")).collect()
      assert(got.length.toLong === total)
      assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length.toLong === total)
    } finally server.stop(0)
  }

  test("TWO hot tokens split independently (60/30/10): no partition above the target band") {
    // 60% in token 5, 30% in token 9, 10% across 4 cold tokens at m=4:
    // the 60% token repeats only TWO quantile points (0.25, 0.5 — a
    // r>=3 trigger would let it keep a 60% partition); the 30% token
    // rides its own range. Both must end below the 55% ceiling, coverage
    // exact, and only the dominant token needs timestamp sub-ranges.
    val server = ChSignalStub.start()
    try {
      val base = url(server)
      val client = new ClickHouseHttpClient(base)
      client.execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      val sb = new StringBuilder
      var us = 1700000000000000L
      def add(tok: Long, n: Int): Unit = (1 to n).foreach { _ =>
        us += 1
        sb.append(s"""$tok,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",1.5,""").append('\n')
      }
      for (tok <- 1 to 4) add(tok, 100) // 10% cold
      add(5, 2400) // 60%
      add(9, 1200) // 30%
      client.insertCsv("signal",
        Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val total = 4000L
      val scan = new graft.sources.SignalLiveScanBuilder(base, "signal", 4)
        .build().asInstanceOf[graft.sources.SignalLiveScan]
      val parts = scan.planInputPartitions().toSeq
        .map(_.asInstanceOf[graft.sources.SignalLivePartition])
      assert(parts.count(_.sql.contains("`token_id` = 5 AND `timestamp`")) >= 2,
        s"the dominant token must split by timestamp: ${parts.map(_.sql)}")
      val counts = parts.map(p => client.query(p.sql).size.toLong)
      assert(counts.sum === total, "still exact coverage with two hot tokens")
      assert(counts.max.toDouble / total < 0.55,
        s"no partition may keep a hot token whole above the ceiling: $counts")
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      val got = live.select(col("token_id"),
        expr("unix_micros(timestamp)").as("us")).collect()
      assert(got.length.toLong === total)
      assert(got.map(r => (r.getLong(0), r.getLong(1))).distinct.length.toLong === total)
    } finally server.stop(0)
  }

  test("a quantile-less server degrades to equal-width with identical results") {
    val server = ChSignalStub.start(quantiles = false)
    try {
      val base = url(server)
      val total = seedSkewed(base)
      val counts = partitionCounts(base, partitions = 4)
      assert(counts.sum === total, "equal-width fallback still covers exactly")
      // the known skew shape: the dense cluster lands in one range
      assert(counts.max >= 4000L, "fallback IS the equal-width plan (the skew is real)")
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      assert(live.select(col("token_id")).collect().length.toLong === total)
    } finally server.stop(0)
  }

  test("planning probes fire ONCE per action (memoized against Spark's repeated planning calls)") {
    // Spark calls planInputPartitions 2+ times per action; un-memoized,
    // every call re-issued the quantile probe AND the hot token's
    // timestamp probe against the live store. One .collect() through the
    // single-hot corpus must cost exactly one of each.
    val statements = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = ChSignalStub.start(statements = statements)
    try {
      val base = url(server)
      val client = new ClickHouseHttpClient(base)
      client.execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      val sb = new StringBuilder
      var us = 1700000000000000L
      for (tok <- 1 to 4; _ <- 1 to 100) {
        us += 1
        sb.append(s"""$tok,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",1.5,""").append('\n')
      }
      for (_ <- 1 to 3600) {
        us += 1
        sb.append(s"""7,${us / 1000000}.${f"${us % 1000000}%06d"},"speed",2.5,""").append('\n')
      }
      client.insertCsv("signal",
        Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      assert(live.select(col("token_id")).collect().length === 4000)
      import scala.jdk.CollectionConverters._
      val qstmts = statements.asScala.toSeq.filter(_.contains("quantiles("))
      assert(qstmts.count(_.contains("(`token_id`)")) === 1,
        s"one token-quantile probe per action, got: $qstmts")
      assert(qstmts.count(_.contains("toUnixTimestamp64Micro(`timestamp`)")) === 1,
        s"one timestamp probe for the one hot token, got: $qstmts")
    } finally server.stop(0)
  }

  test("tiny results keep single-partition plans (no quantile probe)") {
    val server = ChSignalStub.start(quantiles = false) // a probe would 400 — but none may fire
    try {
      val base = url(server)
      val client = new ClickHouseHttpClient(base)
      client.execute(ClickHouseDdl.signalTableDdl(SignalLiveSource.Schema))
      client.insertCsv("signal",
        Seq("token_id", "timestamp", "name", "value_number", "value_string"),
        "7,1700000000.000000,\"speed\",1.5,\n".getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
      val live = spark.read.format("graft-signal-live")
        .option("url", base).option("partitions", "4").load()
      assert(live.rdd.getNumPartitions === 1)
      assert(live.collect().length === 1)
    } finally server.stop(0)
  }
}
