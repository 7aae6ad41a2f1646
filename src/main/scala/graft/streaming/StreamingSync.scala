package graft.streaming

import graft.ops.SignalExplode
import graft.schema.{SignalDefinition, SignalDefinitions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous-sync mode: the reference's batch catch-up loop re-expressed
  * as Structured Streaming (SURVEY.md §2.9 — the reference persists a
  * low-watermark in the sink and re-derives it per run; a streaming engine
  * replaces that with event-time watermarks + checkpointed state).
  *
  * The pipeline is the same narrow scan→explode→sink shape as the batch
  * [[graft.jobs.SyncJob]]; streaming adds:
  *   - event-time watermarking for bounded state,
  *   - exactly-once-ish dedup on (tokenId, timestamp, name) inside the
  *     watermark horizon (`dropDuplicates` keyed state) — the page-boundary
  *     double-read class of bugs disappears structurally,
  *   - windowed per-token aggregation as a streaming materialized view.
  */
object StreamingSync {

  /** Core streaming transform: status docs (any streaming DataFrame with
    * `subject/time/source/data`) → deduplicated signal rows joined to the
    * (static, broadcast) identity dimension.
    */
  def signalStream(
      docs: DataFrame,
      dim: DataFrame,
      defs: Seq[SignalDefinition] = SignalDefinitions.all,
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    SignalExplode
      .explodeSignals(docs, defs)
      .join(broadcast(dim.select("tokenId", "subject")), Seq("subject"), "inner")
      .withWatermark("timestamp", watermarkDelay)
      .dropDuplicates("tokenId", "timestamp", "name")
      .select("tokenId", "timestamp", "name", "valueNumber", "valueString", "source")

  /** Streaming aggregation: per-token, per-tumbling-window signal counts
    * and numeric means — the shape of a live telemetry rollup. Watermark
    * bounds state; late rows beyond the delay are dropped by contract.
    */
  def windowedRollup(
      signals: DataFrame,
      windowLength: String = "1 minute"
  ): DataFrame =
    signals
      .groupBy(window(col("timestamp"), windowLength), col("tokenId"), col("name"))
      .agg(
        count(lit(1)).as("n"),
        avg(col("valueNumber")).as("avg_value")
      )
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("tokenId"),
        col("name"),
        col("n"),
        col("avg_value")
      )
}
