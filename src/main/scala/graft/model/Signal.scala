package graft.model

import java.sql.Timestamp

/** The flat, narrow EAV signal row — the engine's output record.
  *
  * Mirrors the reference's `vss.Signal` (model-garage) as pinned down by its
  * call sites: reference `internal/service/clickhouse/clickhouse.go:113-130`
  * (insert), `internal/sync/sync.go:187-208` (produce), and the test oracle
  * `internal/sync/test/sync_test.go:84` (`WHERE name != ''` — so the string
  * value column uses `""`, not NULL, when the signal is numeric; likewise
  * `valueNumber` is `0.0` when the signal is string-typed).
  *
  * `tokenId` is UInt32 in ClickHouse / uint32 in Go
  * (`clickhouse.go:103-105`); modeled as Long so the full unsigned range is
  * representable.
  */
final case class Signal(
    tokenId: Long,
    timestamp: Timestamp,
    name: String,
    valueNumber: Double,
    valueString: String,
    source: String
)

/** A parsed status-document envelope after JSON decode, before conversion.
  * Shapes the reference's ES `_source` documents
  * (`internal/sync/test/status_mapping.json`). The `data` payload stays as a
  * raw JSON string at this layer so schema drift in the open-ended telemetry
  * payload can never fail the scan; typed extraction happens in the
  * conversion operator against [[graft.schema.SignalDefinitions]].
  */
final case class StatusEnvelope(
    id: Option[String],
    subject: String,
    source: String,
    specversion: Option[String],
    time: Timestamp,
    data: String
)
