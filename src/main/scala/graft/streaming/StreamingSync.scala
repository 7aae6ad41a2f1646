package graft.streaming

import graft.model.Signal
import graft.ops.SignalExplode
import graft.schema.{SignalDefinition, SignalDefinitions}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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

  /** Stream-stream interval join: two live streams joined on a key within
    * a bounded event-time window. Both sides carry watermarks, so state
    * for rows older than the interval is evicted — the join is exact AND
    * bounded-memory, the combination the reference's batch loop can't
    * express at all.
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTime: String,
      rightTime: String,
      watermarkDelay: String,
      intervalSeconds: Long
  ): DataFrame = {
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
    l.join(
      r,
      l(keyCol) === r(keyCol) &&
        r(rightTime) >= l(leftTime) - expr(s"INTERVAL $intervalSeconds SECONDS") &&
        r(rightTime) <= l(leftTime) + expr(s"INTERVAL $intervalSeconds SECONDS")
    ).drop(r(keyCol))
  }

  /** Run a signal stream into the batch sink: each micro-batch appends
    * through [[graft.sources.SignalSink.appendParquet]] — the streaming
    * `foreachBatch` + idempotent-append pattern that replaces the
    * reference's per-page ClickHouse inserts. Checkpointing makes restarts
    * resume from the last committed batch.
    */
  def startParquetSink(
      signals: DataFrame,
      path: String,
      checkpoint: String,
      buckets: Int = 64
  ): org.apache.spark.sql.streaming.StreamingQuery =
    signals.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.SignalSink.appendParquet(batch.toDF(), path, buckets)
      }
      .start()

  /** Per-(token, signal) change-detection state: emitted per key, per
    * micro-batch. */
  final case class SignalChange(
      tokenId: Long,
      name: String,
      valueNumber: Double,
      prevValue: Double,
      nSeen: Long
  )

  /** State record for [[changeDetection]] (top-level visibility required
    * by the state encoder's codegen). */
  final case class LatestState(value: Double, nSeen: Long)

  /** Custom keyed state via `flatMapGroupsWithState` — the catch-up-state
    * shape SURVEY §2.9 flags (the reference re-derives per-token state from
    * the sink each run; a streaming engine holds it in the state store):
    * tracks the latest numeric value per (tokenId, name) and emits a row
    * only when the value CHANGES — streaming change-data-capture over the
    * signal stream. State is per-key and bounded; processing-time timeout
    * would expire idle vehicles in production.
    */
  def changeDetection(signals: Dataset[Signal]): Dataset[SignalChange] = {
    import signals.sparkSession.implicits._
    signals
      .filter(_.valueString.isEmpty) // numeric signals only
      .groupByKey(s => (s.tokenId, s.name))
      .flatMapGroupsWithState[LatestState, SignalChange](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { case ((tokenId, name), rows, state: GroupState[LatestState]) =>
        // Deterministic within-batch order: by timestamp.
        val sorted = rows.toSeq.sortBy(_.timestamp.getTime)
        var st = state.getOption.getOrElse(LatestState(Double.NaN, 0L))
        val out = Seq.newBuilder[SignalChange]
        sorted.foreach { s =>
          val prev = st
          val changed = prev.nSeen == 0L || s.valueNumber != prev.value
          st = LatestState(s.valueNumber, prev.nSeen + 1)
          if (changed)
            out += SignalChange(tokenId, name, s.valueNumber,
              if (prev.nSeen == 0L) Double.NaN else prev.value, st.nSeen)
        }
        state.update(st)
        out.result().iterator
      }
  }
}
