package graft.schema

/** The definition registry mapping raw telemetry fields to canonical VSS
  * signal names — the single source of truth driving both source-side column
  * pruning and the document→signal conversion.
  *
  * Reimplements the role of model-garage's `schema.DefinitionsYAML()` as used
  * by the reference at `internal/sync/sync.go:236-256` (field list =
  * `"data." + conv.OriginalName`) and `sync.go:187-208` (conversion). The
  * concrete 18-signal table is pinned by the reference's count oracles
  * (`internal/sync/test/sync_test.go:64` — 18 signals/doc; `:133,149` — 2/doc
  * when filtered to Vehicle.Speed + Vehicle.VehicleIdentification.Brand).
  */
object ValueKind extends Enumeration {
  val Number, Str = Value
}

/** One signal definition.
  *
  * @param vssName      canonical VSS path, e.g. "Vehicle.Speed"
  * @param originalName field name under `data.` in the source document
  * @param kind         which value column the signal fills
  * @param scale        unit-conversion multiplier applied to numeric values
  *                     (1.0 for most; 100.0 for OBD ratio→percent). Kept as
  *                     a constant factor (not a function) so conversion
  *                     compiles to a codegen-able Column expression.
  */
final case class SignalDefinition(
    vssName: String,
    originalName: String,
    kind: ValueKind.Value,
    scale: Double = 1.0
)

object SignalDefinitions {
  import ValueKind._

  private val RatioToPercent = 100.0

  /** The v1 conversion table (18 signals — reference `sync_test.go:64`).
    * VSS names follow the COVESA VSS spec paths; the two names that are
    * certain from the reference tests are Vehicle.Speed and
    * Vehicle.VehicleIdentification.Brand (`sync_test.go:149`).
    */
  val all: Seq[SignalDefinition] = Seq(
    SignalDefinition("Vehicle.Speed", "speed", Number),
    SignalDefinition("Vehicle.VehicleIdentification.Brand", "make", Str),
    SignalDefinition("Vehicle.VehicleIdentification.Model", "model", Str),
    SignalDefinition("Vehicle.VehicleIdentification.Year", "year", Number),
    SignalDefinition("Vehicle.Powertrain.CombustionEngine.ECT", "coolantTemp", Number),
    SignalDefinition("Vehicle.Powertrain.CombustionEngine.Speed", "engineSpeed", Number),
    SignalDefinition("Vehicle.Powertrain.FuelSystem.RelativeLevel", "fuelPercentRemaining", Number, RatioToPercent),
    SignalDefinition("Vehicle.OBD.EngineLoad", "engineLoad", Number, RatioToPercent),
    SignalDefinition("Vehicle.OBD.ThrottlePosition", "throttlePosition", Number, RatioToPercent),
    SignalDefinition("Vehicle.OBD.IntakeTemp", "intakeTemp", Number),
    SignalDefinition("Vehicle.OBD.RunTime", "runTime", Number),
    SignalDefinition("Vehicle.LowVoltageBattery.CurrentVoltage", "batteryVoltage", Number),
    SignalDefinition("Vehicle.CurrentLocation.Altitude", "altitude", Number),
    SignalDefinition("Vehicle.CurrentLocation.Latitude", "latitude", Number),
    SignalDefinition("Vehicle.CurrentLocation.Longitude", "longitude", Number),
    SignalDefinition("Vehicle.DIMO.Aftermarket.HDOP", "hdop", Number),
    SignalDefinition("Vehicle.DIMO.Aftermarket.NSAT", "nsat", Number),
    SignalDefinition("Vehicle.DIMO.Aftermarket.WPAState", "wifi.status", Str)
  )

  val byVssName: Map[String, SignalDefinition] =
    all.map(d => d.vssName -> d).toMap

  /** Resolve a requested signal-name list (whitespace-tolerant, unknown
    * names dropped — reference `sync.go:236-256` trims at `sync.go:246`) to
    * definitions; empty input means "all signals".
    */
  def resolve(requested: Seq[String]): Seq[SignalDefinition] = {
    val cleaned = requested.map(_.trim).filter(_.nonEmpty)
    if (cleaned.isEmpty) all
    else cleaned.flatMap(byVssName.get)
  }

  /** Source fields needed for a signal set — drives pushdown/pruning
    * (reference `sync.go:251-253`: `"data." + conv.OriginalName`).
    */
  def requiredSourceFields(defs: Seq[SignalDefinition]): Seq[String] =
    defs.map(d => s"data.${d.originalName}").distinct
}
