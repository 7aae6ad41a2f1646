package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the LIVE wire tier's throughput against a loopback stub: N
  * synthetic status docs across K subjects served by the in-process
  * `_search` stub, read through the full client stack (`graft-status-live`
  * → EsHttpClient paged loops → NDJSON decode) with the subject census
  * pushed (≤64 task groups). Reported: docs/s end-to-end and the HTTP
  * page-count shape. Loopback-only — no socket leaves the machine; the
  * number bounds protocol + decode overhead, not network.
  *
  * Usage: runMain graft.tools.LiveProbe [docs] [subjects] [batchSize]
  */
object LiveProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(500000)
    val nSubjects = args.lift(1).map(_.toInt).getOrElse(2000)
    val batch = args.lift(2).map(_.toInt).getOrElse(1000)

    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"[liveprobe] corpus: $nDocs docs x $nSubjects subjects, page=$batch")
    val docs: IndexedSeq[graft.queries.LiveQueries.StubDoc] =
      (0 until nDocs).map { i =>
        val subj = (i % nSubjects).toString
        val tsu = 1704000000000000L + i.toLong * 1000
        val iso = java.time.Instant.ofEpochSecond(tsu / 1000000L, (tsu % 1000000L) * 1000L)
        val json =
          s"""{"id":"e$i","subject":"$subj","source":"dimo/integration/live",""" +
            s""""specversion":"1.0","time":"$iso","dataschema":"dimo.zone.status/v2.0",""" +
            s""""type":"com.dimo.device.status","data":{"vehicle":{"cents":$i}}}"""
        graft.queries.LiveQueries.StubDoc(s"e$i", subj, tsu, json)
      }
    val server = graft.queries.LiveQueries.startStub(docs)
    try {
      val subjects = (0 until nSubjects).map(_.toString)
      def read() = spark.read.format("graft-status-live")
        .option("url", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("batchSize", batch.toString)
        .load()
        .where(col("subject").isin(subjects: _*))
        .select("id", "subject", "time")
      read().count() // warm (JIT, codegen, connection pool)
      val t0 = System.nanoTime()
      val n = read().count()
      val wall = (System.nanoTime() - t0) / 1e9
      require(n == nDocs, s"live read lost rows: $n of $nDocs")
      println(f"[liveprobe] full census read: $n docs in $wall%.2f s " +
        f"(${n / wall}%.0f docs/s through the wire stack, 64-task fan-out)")
    } finally server.stop(0)
    spark.stop()
  }
}
