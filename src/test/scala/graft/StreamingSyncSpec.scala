package graft

import java.sql.Timestamp

import graft.sources.DeviceDim
import graft.streaming.StreamingSync
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured-Streaming sync spec using MemoryStream + memory sink:
  * explode + dim join + watermark dedup behave under incremental batches.
  */
class StreamingSyncSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(subject: String, timeIso: String, speed: Double): String =
    s"""{"id":"d","subject":"$subject","source":"test","specversion":"1.0","time":"$timeIso","data":{"speed":$speed}}"""

  private def parseDocs(raw: org.apache.spark.sql.Dataset[String]) =
    raw.toDF("json")
      .select(from_json(col("json"),
        graft.sources.StatusSource.docSchema(graft.schema.SignalDefinitions.all)).as("doc"))
      .select("doc.*")

  test("streaming explode + dedup: duplicate (token,ts,name) rows collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val docs = parseDocs(input.toDS())
    val dim = DeviceDim.identityDim(spark, 1L to 4L)
    val out = StreamingSync.signalStream(docs, dim, watermarkDelay = "1 hour")

    val query = out.writeStream
      .format("memory")
      .queryName("sigstream")
      .outputMode("append")
      .start()
    try {
      input.addData(
        doc("1", "2024-01-01T00:00:00.000Z", 10.0),
        doc("1", "2024-01-01T00:00:00.000Z", 10.0), // exact duplicate event
        doc("2", "2024-01-01T00:00:01.000Z", 20.0)
      )
      query.processAllAvailable()
      input.addData(doc("1", "2024-01-01T00:00:02.000Z", 30.0))
      query.processAllAvailable()

      val rows = spark.table("sigstream")
        .where(col("name") === "Vehicle.Speed")
        .select("tokenId", "timestamp", "valueNumber")
        .as[(Long, Timestamp, Double)]
        .collect()
        .toSet
      assert(rows.size === 3) // duplicate collapsed, late batch appended
      assert(rows.map(_._1) === Set(1L, 2L))
    } finally query.stop()
  }

  test("versioned dispatch composes with streaming: mixed v1/v2 micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // keep `data` as the raw JSON string — the versioned explode parses
    // per-row on the version the dataschema sniff selects
    val docs = input.toDS().toDF("json")
      .select(
        get_json_object(col("json"), "$.subject").as("subject"),
        get_json_object(col("json"), "$.source").as("source"),
        to_timestamp(get_json_object(col("json"), "$.time")).as("time"),
        get_json_object(col("json"), "$.dataschema").as("dataschema"),
        get_json_object(col("json"), "$.data").as("data")
      )
    val out = graft.ops.SignalExplode.explodeSignalsVersioned(docs)
    val query = out.writeStream.format("memory").queryName("versionedstream")
      .outputMode("append").start()
    try {
      input.addData(
        """{"subject":"1","source":"t","time":"2024-01-01T00:00:00Z","data":{"speed":10.0}}""",
        """{"subject":"2","source":"t","time":"2024-01-01T00:00:01Z","dataschema":"s/v2.0","data":{"telemetry":{"speed":20.0}}}""",
        """{"subject":"3","source":"t","time":"2024-01-01T00:00:02Z","dataschema":"s/v9","data":{"speed":30.0}}"""
      )
      query.processAllAvailable()
      val rows = spark.table("versionedstream")
        .where(col("name") === "Vehicle.Speed")
        .select("subject", "valueNumber").as[(String, Double)].collect().toSet
      assert(rows === Set(("1", 10.0), ("2", 20.0))) // v9 doc skipped
    } finally query.stop()
  }

  test("foreachBatch parquet sink: stream appends land in the partitioned layout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val docs = parseDocs(input.toDS())
    val dim = DeviceDim.identityDim(spark, 1L to 4L)
    val out = StreamingSync.signalStream(docs, dim, watermarkDelay = "1 hour")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    val query = StreamingSync.startParquetSink(
      out, dir.resolve("data").toString, dir.resolve("ckpt").toString, buckets = 2)
    try {
      input.addData(doc("1", "2024-01-01T00:00:00.000Z", 10.0))
      query.processAllAvailable()
      input.addData(doc("2", "2024-01-01T00:00:01.000Z", 20.0))
      query.processAllAvailable()
      val sunk = graft.sources.SignalSink.readParquet(spark, dir.resolve("data").toString)
      assert(sunk.where(col("name") === "Vehicle.Speed").count() === 2)
      assert(sunk.select("tokenId").distinct().count() === 2)
    } finally query.stop()
  }

  test("change detection keeps per-key state across micro-batches") {
    import graft.model.Signal
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Signal]
    val out = StreamingSync.changeDetection(input.toDS())
    val query = out.writeStream.format("memory").queryName("cdc").outputMode("append").start()
    try {
      input.addData(
        Signal(1L, Timestamp.valueOf("2024-01-01 00:00:00"), "Vehicle.Speed", 10.0, "", "t"),
        Signal(1L, Timestamp.valueOf("2024-01-01 00:00:01"), "Vehicle.Speed", 10.0, "", "t"), // no change
        Signal(1L, Timestamp.valueOf("2024-01-01 00:00:02"), "Vehicle.Speed", 20.0, "", "t")
      )
      query.processAllAvailable()
      // Second batch: state (20.0) must persist — same value emits nothing.
      input.addData(Signal(1L, Timestamp.valueOf("2024-01-01 00:00:03"), "Vehicle.Speed", 20.0, "", "t"))
      query.processAllAvailable()
      input.addData(Signal(1L, Timestamp.valueOf("2024-01-01 00:00:04"), "Vehicle.Speed", 30.0, "", "t"))
      query.processAllAvailable()

      val rows = spark.table("cdc").orderBy("nSeen").collect()
      assert(rows.map(_.getDouble(2)).toSeq === Seq(10.0, 20.0, 30.0))
      assert(rows.map(_.getLong(4)).toSeq === Seq(1L, 3L, 5L)) // state counted every row
      assert(rows(1).getDouble(3) === 10.0 && rows(2).getDouble(3) === 20.0)
    } finally query.stop()
  }

  test("native session_window groups a gappy signal stream per token") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val docs = parseDocs(input.toDS())
    val dim = DeviceDim.identityDim(spark, 1L to 4L)
    val signals = StreamingSync.signalStream(docs, dim, watermarkDelay = "1 hour")
    val sessions = signals
      .groupBy(session_window(col("timestamp"), "5 minutes"), col("tokenId"))
      .count()
      .select(col("session_window.start").as("s"), col("tokenId"), col("count"))
    val query = sessions.writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      input.addData(
        doc("1", "2024-01-01T00:00:00Z", 1.0), // session A
        doc("1", "2024-01-01T00:02:00Z", 2.0), // still session A (gap < 5m)
        doc("1", "2024-01-01T01:00:00Z", 3.0) // session B
      )
      query.processAllAvailable()
      val rows = spark.table("sessions").where(col("tokenId") === 1).collect()
      assert(rows.length === 2) // two sessions for token 1
      assert(rows.map(r => r.getLong(2)).sorted.toSeq === Seq(1L, 2L)) // speed-only docs: 1 signal each
    } finally query.stop()
  }

  test("stream-stream interval join matches pairs within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val lIn = MemoryStream[(Long, Timestamp, String)]
    val rIn = MemoryStream[(Long, Timestamp, String)]
    val l = lIn.toDS().toDF("uid", "lts", "lwhat")
    val r = rIn.toDS().toDF("uid", "rts", "rwhat")
    val joined = StreamingSync.intervalJoin(l, r, "uid", "lts", "rts", "10 minutes", intervalSeconds = 60)
    val query = joined.writeStream.format("memory").queryName("ssjoin").outputMode("append").start()
    try {
      lIn.addData((1L, Timestamp.valueOf("2024-01-01 00:10:00"), "purchase"))
      rIn.addData(
        (1L, Timestamp.valueOf("2024-01-01 00:09:30"), "click-in-window"),
        (1L, Timestamp.valueOf("2024-01-01 00:05:00"), "click-too-early"),
        (2L, Timestamp.valueOf("2024-01-01 00:09:45"), "wrong-user")
      )
      query.processAllAvailable()
      val got = spark.table("ssjoin").select("rwhat").collect().map(_.getString(0))
      assert(got.toSeq === Seq("click-in-window"))
    } finally query.stop()
  }

  test("pipeline gauntlet runs incrementally: rules + redaction + normalized dedup") {
    // The corpus-hygiene passes (q74 rules, q77 redaction, q75 canonical
    // dedup) are stateless Column programs plus one keyed dedup — so the
    // SAME expressions run under Structured Streaming unchanged, custom
    // CanonAlnum expression included. State dedups across micro-batches.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = input.toDS().toDF("doc_id", "text")
      .where(size(split(col("text"), " ")) >= 3) // min-words rule
      .select(col("doc_id"),
        regexp_replace(col("text"), "[0-9]{7,}", "<NUM>").as("redacted"),
        md5(graft.functions.CanonicalizeExpressions.canonAlnum(col("text"))).as("canon_hash"))
      .dropDuplicates("canon_hash")
    val query = out.writeStream.format("memory").queryName("gauntlet")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "Hello,  World! Call 12345678"),
        (2L, "hello world call 12345678"), // same canonical form as doc 1
        (3L, "too short"), // fails the min-words rule
        (4L, "a genuinely different document")
      )
      query.processAllAvailable()
      input.addData((5L, "HELLO world call 12345678")) // dup across batches
      query.processAllAvailable()
      val got = spark.table("gauntlet").collect()
      assert(got.map(_.getLong(0)).toSet === Set(1L, 4L))
      val redacted = got.find(_.getLong(0) == 1L).get.getString(1)
      assert(redacted === "Hello,  World! Call <NUM>")
    } finally query.stop()
  }

  test("windowed rollup compiles to a valid streaming plan") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val docs = parseDocs(input.toDS())
    val dim = DeviceDim.identityDim(spark, 1L to 4L)
    val rollup = StreamingSync.windowedRollup(
      StreamingSync.signalStream(docs, dim, watermarkDelay = "1 hour"))
    val query = rollup.writeStream
      .format("memory")
      .queryName("rollupstream")
      .outputMode("append")
      .start()
    try {
      input.addData(doc("1", "2024-01-01T00:00:00.000Z", 10.0))
      query.processAllAvailable()
      assert(spark.table("rollupstream").schema.fieldNames.toSeq ===
        Seq("window_start", "window_end", "tokenId", "name", "n", "avg_value"))
    } finally query.stop()
  }
}
