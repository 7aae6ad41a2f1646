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

  /** The v2 conversion table: the payload evolution where raw telemetry
    * moved under a `telemetry.*` envelope. Same canonical VSS names and
    * scales — only the source paths differ — so a mixed v1/v2 batch
    * converges to one signal schema. Which table applies is decided PER
    * DOCUMENT by [[versionOf]], mirroring the reference's try-v2-then-
    * fall-back-to-v1 dispatch (`internal/sync/sync.go:187-208`:
    * `SignalsFromPayload` → `VersionError` → `SignalsFromV1Payload`).
    */
  val v2: Seq[SignalDefinition] =
    all.map(d => d.copy(originalName = s"telemetry.${d.originalName}"))

  /** Registry keyed by payload version — the dispatch table. */
  val byVersion: Map[String, Seq[SignalDefinition]] = Map("1" -> all, "2" -> v2)

  /** Payload-version sniff ("1", "2", or "?" = unknown) from the
    * CloudEvents `dataschema` attribute: the WHOLE version number of the
    * URI's `v<digits>` marker selects the table (a substring test would
    * misroute future versions — "v12" contains "v1"); an absent/empty
    * dataschema falls back to v1 (the reference's empty-`VersionError`
    * fallback, `sync.go:190-204`); any other — or unparseable — version
    * is unknown and the document is skipped, as the reference
    * logs-and-continues on a non-empty version error.
    */
  def versionOf(dataschema: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val ver = regexp_extract(dataschema, "v(\\d+)(?:\\.|/|$)", 1)
    when(dataschema.isNull || dataschema === "", lit("1"))
      .when(ver === "1", lit("1"))
      .when(ver === "2", lit("2"))
      .otherwise(lit("?"))
  }

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
