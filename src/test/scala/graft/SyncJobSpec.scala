package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.jobs.{SyncJob, SyncOptions}
import graft.model.Signal
import graft.sources.{DeviceDim, StatusSource}
import org.apache.spark.sql.functions._

/** End-to-end sync parity with the reference e2e suite
  * (`internal/sync/test/sync_test.go:63-230`): same corpus construction
  * (8 fixture docs × 1000 replicas, time = firstTime+(i+1)ms, subjects
  * "1".."8", `sync_test.go:269-298`), same count oracles.
  */
class SyncJobSpec extends SparkTestBase {

  private val firstTime = Instant.parse("2020-01-01T00:00:00Z")
  private def tAt(ms: Long) = new Timestamp(firstTime.toEpochMilli + ms)

  /** 8000-doc corpus + 1 malformed doc, as NDJSON (reference loader,
    * `sync_test.go:269-298`; malformed doc `:44-51,283-287`).
    */
  private lazy val corpusPath: String = {
    val mapper = new ObjectMapper()
    val arr = mapper.readTree(
      new java.io.File(getClass.getResource("/static_vehicle_data_test.json").getPath)
    )
    val sb = new StringBuilder
    for (i <- 0 until 1000; j <- 0 until 8) {
      val d = arr.get(j).deepCopy[ObjectNode]()
      d.put("subject", (j + 1).toString)
      d.put("time", Instant.ofEpochMilli(firstTime.toEpochMilli + i + 1).toString)
      sb.append(mapper.writeValueAsString(d)).append('\n')
    }
    sb.append("""{"time":"2020-01-01T00:00:00.700Z","data":{"bad":"format"},"source":"bad","subject":"1"}""")
      .append('\n')
    val p = Files.createTempFile("graft-corpus", ".ndjson")
    Files.writeString(p, sb.toString)
    p.toString
  }

  private def docs = StatusSource.readJson(spark, corpusPath, multiLine = false)
  private def dim = DeviceDim.identityDim(spark, 1L to 8L)

  test("TestSync parity: explicit whitespace-tolerant tokens, start=+500ms -> 72,144 rows") {
    val out = SyncJob.run(
      docs,
      dim,
      existingSink = None,
      SyncOptions(
        tokens = Seq("1", "2 ", "3", "4\t", " 5 ", "\t6", "7", "8"),
        start = Some(tAt(500))
      )
    )
    assert(out.count() === 72144L)
    assert(out.where(col("name") === "").count() === 0L)
    assert(out.where(col("source") === "bad").count() === 0L)
  }

  test("TestSyncWithTokenIDFromCH parity: token discovery from sink -> 63,126 rows") {
    import spark.implicits._
    val sink = (1L to 7L)
      .map(t => Signal(t, tAt(2000), "Vehicle.Speed", 1.0, "", "test"))
      .toDF()
    val out = SyncJob.run(
      docs,
      dim,
      existingSink = Some(sink),
      SyncOptions(start = Some(tAt(500)))
    )
    assert(out.count() === 63126L)
    assert(out.select("tokenId").distinct().count() === 7L)
  }

  test("TestSyncWithFieldFilter parity: 2-signal filter -> 8,016 rows") {
    val out = SyncJob.run(
      docs,
      dim,
      existingSink = None,
      SyncOptions(
        tokens = (1 to 8).map(_.toString),
        signalNames = Seq("Vehicle.Speed ", "Vehicle.VehicleIdentification.Brand"),
        start = Some(tAt(500))
      )
    )
    assert(out.count() === 8016L)
  }

  test("incremental resume: per-token watermark bounds the scan") {
    import spark.implicits._
    // Token 1 already synced back to +701ms; others fresh.
    val sink = Seq(Signal(1L, tAt(701), "Vehicle.Speed", 1.0, "", "test")).toDF()
    val out = SyncJob.run(
      docs,
      dim,
      existingSink = Some(sink),
      SyncOptions(tokens = (1 to 8).map(_.toString), start = Some(tAt(500)))
    )
    // Token 1: timestamps [500, 701) -> 201 × 18; tokens 2..8: [500, 1001) -> 501 × 18.
    assert(out.count() === 201L * 18 + 7L * 501 * 18)
  }

  test("options from env-style config: CSV tokens, RFC3339 bounds, bad values dropped") {
    val opts = SyncOptions.fromConfig(Map(
      "TOKEN_IDS" -> "1, 2 ,\t3,,zzz",
      "SIGNAL_NAMES" -> "Vehicle.Speed , Vehicle.VehicleIdentification.Brand",
      "START_TIME" -> "2020-01-01T00:00:00.500Z",
      "STOP_TIME" -> "not-a-time"
    ))
    assert(opts.tokens === Seq("1", "2", "3", "zzz"))
    assert(opts.signalNames.map(_.trim) === Seq("Vehicle.Speed", "Vehicle.VehicleIdentification.Brand"))
    assert(opts.start.contains(tAt(500)))
    assert(opts.stop.isEmpty)
    // And the full pipeline accepts it (bad token "zzz" skipped downstream).
    val out = SyncJob.run(docs, dim, existingSink = None, opts.copy(stop = Some(tAt(2000))))
    assert(out.count() === 3L * 501 * 2)
  }

  test("dim snapshot loader: NDJSON -> canonical dim, bad rows dropped, dups resolved") {
    val p = Files.createTempFile("graft-dim-snapshot", ".ndjson")
    Files.writeString(p, Seq(
      """{"tokenId": 1, "subject": "1"}""",
      """{"tokenId": 2, "subject": "2"}""",
      """{"tokenId": 9, "subject": "2"}""", // duplicate subject: min tokenId wins
      """{"subject": "orphan"}""", // missing tokenId: NotFound analog, dropped
      """{"tokenId": 3}""" // missing subject: dropped
    ).mkString("\n"))
    val dimSnap = sources.DeviceDim.fromSnapshot(spark, p.toString)
    assert(dimSnap.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      === Seq((1L, "1"), (2L, "2")))
    // and it drives the full pipeline like any other dim
    val out = SyncJob.run(docs, dimSnap, existingSink = None,
      SyncOptions(tokens = Seq("1", "2"), start = Some(tAt(500))))
    assert(out.count() === 2L * 501 * 18)
  }

  test("observed run carries the batch stats on the same job") {
    val (out, obs) = SyncJob.runObserved(
      docs, dim, existingSink = None,
      SyncOptions(tokens = (1 to 8).map(_.toString), start = Some(tAt(500))))
    assert(out.count() === 72144L)
    val m = obs.get
    assert(m("signal_rows") === 72144L)
    val approxTokens = m("distinct_tokens").asInstanceOf[Long]
    assert(approxTokens >= 7L && approxTokens <= 9L) // 8 tokens, approx agg
    assert(m("min_ts").asInstanceOf[Timestamp] === tAt(500)) // inclusive start bound
    assert(m("max_ts").asInstanceOf[Timestamp] === tAt(1000))
  }

  test("bad token entries are skipped, not fatal") {
    val out = SyncJob.run(
      docs,
      dim,
      existingSink = None,
      SyncOptions(tokens = Seq("1", "zzz", ""), start = Some(tAt(500)))
    )
    assert(out.count() === 501L * 18)
  }
}
