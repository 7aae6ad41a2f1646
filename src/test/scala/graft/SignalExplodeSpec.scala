package graft

import graft.ops.SignalExplode
import graft.schema.SignalDefinitions
import graft.sources.StatusSource
import org.apache.spark.sql.functions._

/** Conversion-operator spec against the reference fixture docs
  * (`/root/reference/internal/sync/test/static_vehicle_data_test.json`,
  * copied verbatim). The count oracles 18/doc and 2/doc are the de-facto
  * conversion spec (reference `sync_test.go:64,133`).
  */
class SignalExplodeSpec extends SparkTestBase {

  private def fixturePath =
    getClass.getResource("/static_vehicle_data_test.json").getPath

  private lazy val docs =
    StatusSource.readJson(spark, fixturePath).cache()

  test("each fixture doc explodes into exactly 18 signals") {
    val out = SignalExplode.explodeSignals(docs)
    assert(out.count() === 8L * 18)
    // Fixture docs are not unique by (subject, time) — 3 distinct pairs —
    // so assert each group is a whole multiple of 18 signals.
    val perDoc = out.groupBy("subject", "timestamp").count().collect()
    assert(perDoc.map(_.getLong(2)).sum === 144L)
    assert(perDoc.forall(_.getLong(2) % 18 == 0))
  }

  test("signal-name filter yields 2 signals per doc, names trimmed") {
    val defs = SignalDefinitions.resolve(
      Seq("Vehicle.Speed ", "Vehicle.VehicleIdentification.Brand")
    )
    val out = SignalExplode.explodeSignals(
      StatusSource.readJson(spark, fixturePath, defs),
      defs
    )
    assert(out.count() === 8L * 2)
    assert(
      out.select("name").distinct().collect().map(_.getString(0)).sorted
        === Array("Vehicle.Speed", "Vehicle.VehicleIdentification.Brand")
    )
  }

  test("dual-typed values: numeric fills valueNumber with valueString ''") {
    val out = SignalExplode.explodeSignals(docs)
    val speed = out
      .where(col("name") === "Vehicle.Speed")
      .select("valueNumber", "valueString")
      .collect()
    assert(speed.length === 8)
    assert(speed.forall(r => r.getString(1) == "" && !r.isNullAt(0)))
    val brand = out
      .where(col("name") === "Vehicle.VehicleIdentification.Brand")
      .select("valueNumber", "valueString")
      .collect()
    assert(brand.forall(r => r.getDouble(0) == 0.0 && r.getString(1).nonEmpty))
  }

  test("ratio signals scale to percent") {
    import spark.implicits._
    val raw = docs
      .select(get_json_object(to_json(col("data")), "$.engineLoad").cast("double"))
      .as[Double].collect()
    val conv = SignalExplode
      .explodeSignals(docs)
      .where(col("name") === "Vehicle.OBD.EngineLoad")
      .select("valueNumber")
      .as[Double].collect()
    assert(conv.sorted.zip(raw.map(_ * 100.0).sorted).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("envelope geo_point location reads as lat/lon doubles from the fixture") {
    val loc = docs.where(col("location").isNotNull)
      .select("location.lat", "location.lon").collect()
    assert(loc.length === 8) // every fixture doc carries a location
    assert(loc.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
    assert(loc.exists(r => math.abs(r.getDouble(0) - 41.90639) < 1e-9))
  }

  test("versioned dispatch: v1 and v2 docs in one batch each use their own table") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val v1data = """{"speed":10.0,"make":"m1"}"""
    val v2data = """{"telemetry":{"speed":20.0,"make":"m2","engineLoad":0.5}}"""
    val docs = Seq(
      ("1", "it", t, null.asInstanceOf[String], v1data), // absent dataschema → v1 fallback
      ("2", "it", t, "", v1data), // empty dataschema → v1 fallback
      ("3", "it", t, "https://schemas.example/status/v2.0", v2data),
      ("4", "it", t, "status/v2", v2data),
      ("5", "it", t, "status/v9", v2data) // unknown version → doc skipped
    ).toDF("subject", "source", "time", "dataschema", "data")
    val out = SignalExplode.explodeSignalsVersioned(docs).cache()
    // per-doc dispatch count oracle: 2 v1 docs × 2 present fields +
    // 2 v2 docs × 3 present fields; the unknown-version doc contributes 0.
    assert(out.count() === 2L * 2 + 2L * 3)
    assert(out.where(col("subject") === "5").count() === 0)
    // v1 doc through the v1 paths
    assert(out.where(col("subject") === "1" && col("name") === "Vehicle.Speed")
      .head().getAs[Double]("valueNumber") === 10.0)
    // v2 doc through the telemetry.* paths, scale applied
    assert(out.where(col("subject") === "3" && col("name") === "Vehicle.OBD.EngineLoad")
      .head().getAs[Double]("valueNumber") === 50.0)
    assert(out.where(col("subject") === "4" && col("name") === "Vehicle.VehicleIdentification.Brand")
      .head().getAs[String]("valueString") === "m2")
    // Dispatch is what makes v2 convert: the plain v1 explode on the same
    // v2 docs finds no v1-path fields and emits nothing.
    val v2only = docs.where(col("subject").isin("3", "4")).drop("dataschema")
    assert(SignalExplode.explodeSignals(
      v2only.withColumn("data", from_json(col("data"),
        SignalExplode.payloadSchema(SignalDefinitions.all)))).count() === 0)
    out.unpersist()
  }

  test("malformed doc converts to zero signals without failing the batch") {
    import spark.implicits._
    val bad = Seq(
      """{"time":"2020-01-01T00:00:00.001Z","data":{"bad":"format"},"source":"bad","subject":"1"}""",
      """this is not json at all"""
    ).toDS()
    val badDocs = spark.read.schema(StatusSource.docSchema(SignalDefinitions.all)).json(bad)
    assert(SignalExplode.explodeSignals(badDocs).count() === 0)
  }
}
