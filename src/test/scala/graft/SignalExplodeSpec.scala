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
