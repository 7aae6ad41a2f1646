package graft.jobs

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.Success

/** Job-level metrics surface — the Spark analog of the reference's
  * Prometheus endpoint (`cmd/es-ch-sync/main.go:108-123`, which serves
  * `/metrics` next to the sync loop).
  *
  * Three layers:
  *   - [[GraftMetricsListener]] — a `SparkListener` folding every task's
  *     metrics into monotonic counters (records/bytes read and written,
  *     shuffle traffic, task outcomes, executor time). Listener-based, so
  *     it observes EVERY job in the session — queries, sync runs, writes —
  *     with zero instrumentation in operator code.
  *   - job-local counters ([[GraftMetricsListener.inc]]) for engine-level
  *     events (e.g. documents synced), the analog of the reference's
  *     custom collectors.
  *   - [[MetricsEndpoint]] — the counters in Prometheus text exposition
  *     format over plain HTTP (JDK built-in server; no new dependency).
  *
  * DSv2 custom metrics (e.g. the status source's `skippedLines`) remain
  * visible in the Spark UI per scan; this surface is the scrape-able
  * process-level aggregate.
  */
class GraftMetricsListener extends SparkListener {

  private val counters = new ConcurrentHashMap[String, LongAdder]()

  /** Add to a named counter (creates it on first use). */
  def inc(name: String, delta: Long = 1L): Unit = {
    require(delta >= 0, s"counters are monotonic; got $delta for $name")
    counters.computeIfAbsent(name, _ => new LongAdder).add(delta)
  }

  def value(name: String): Long =
    Option(counters.get(name)).map(_.sum()).getOrElse(0L)

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    // "completed" means SUCCEEDED (the conventional Prometheus reading);
    // failures count separately, never in both.
    if (taskEnd.reason == Success) inc("graft_tasks_completed_total")
    else inc("graft_tasks_failed_total")
    val m = taskEnd.taskMetrics
    if (m != null) {
      inc("graft_records_read_total", m.inputMetrics.recordsRead)
      inc("graft_bytes_read_total", m.inputMetrics.bytesRead)
      inc("graft_records_written_total", m.outputMetrics.recordsWritten)
      inc("graft_bytes_written_total", m.outputMetrics.bytesWritten)
      inc("graft_shuffle_read_bytes_total", m.shuffleReadMetrics.totalBytesRead)
      inc("graft_shuffle_write_bytes_total", m.shuffleWriteMetrics.bytesWritten)
      inc("graft_executor_run_ms_total", m.executorRunTime)
      inc("graft_memory_spill_bytes_total", m.memoryBytesSpilled)
    }
  }

  /** Prometheus text exposition format 0.0.4: one `# TYPE` line + value
    * per counter, sorted by name for a stable scrape.
    */
  def expose(): String = {
    val names = {
      val it = counters.keySet().iterator()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result().sorted
    }
    names.map { n => s"# TYPE $n counter\n$n ${value(n)}\n" }.mkString
  }
}

/** Minimal `/metrics` HTTP endpoint over a [[GraftMetricsListener]] —
  * `main.go:108-123` re-expressed on the JDK's built-in server.
  */
object MetricsEndpoint {

  /** Start serving `/metrics` on `port` (0 = ephemeral). Returns the
    * server (call `.stop(0)` to shut down) and the bound port.
    */
  def start(listener: GraftMetricsListener, port: Int = 0): (com.sun.net.httpserver.HttpServer, Int) = {
    val server = com.sun.net.httpserver.HttpServer.create(new java.net.InetSocketAddress(port), 0)
    server.createContext("/metrics", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val body = listener.expose().getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    server.start()
    (server, server.getAddress.getPort)
  }
}
