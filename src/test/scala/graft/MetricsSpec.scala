package graft

import graft.jobs.{GraftMetricsListener, MetricsEndpoint}
import org.apache.spark.sql.functions._

/** The job-level metrics surface: listener counters fold real task
  * metrics, engine counters increment, and the Prometheus text endpoint
  * serves both over HTTP (reference `cmd/es-ch-sync/main.go:108-123`).
  */
class MetricsSpec extends SparkTestBase {

  test("listener folds task metrics; endpoint serves Prometheus text format") {
    val listener = new GraftMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .groupBy(col("o_orderpriority")).count().count()
      assert(n > 0)
      // the listener bus is async; poll briefly until events drain
      val deadline = System.nanoTime() + 10_000_000_000L
      while (listener.value("graft_tasks_completed_total") == 0 && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.value("graft_tasks_completed_total") > 0)
      assert(listener.value("graft_records_read_total") > 0)
      assert(listener.value("graft_tasks_failed_total") === 0)

      listener.inc("graft_documents_synced_total", 42)
      assert(listener.value("graft_documents_synced_total") === 42)

      val (server, port) = MetricsEndpoint.start(listener)
      try {
        val body = scala.io.Source
          .fromURL(s"http://localhost:$port/metrics")(scala.io.Codec.UTF8).mkString
        assert(body.contains("# TYPE graft_records_read_total counter"), body)
        assert(body.contains("graft_documents_synced_total 42"), body)
        // exposition is sorted for stable scrapes
        val names = body.linesIterator.filterNot(_.startsWith("#")).map(_.split(' ').head).toSeq
        assert(names === names.sorted, names.toString)
      } finally server.stop(0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
