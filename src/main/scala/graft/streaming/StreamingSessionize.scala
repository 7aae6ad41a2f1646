package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the live analog of the batch q22 sessionizer
  * (`Analytics2.scala`): gap-based user sessions over an unbounded event
  * stream, built on Spark's NATIVE `session_window` aggregation rather
  * than hand-rolled keyed state. The engine merges overlapping windows in
  * the state store, watermarking bounds state, and a session is emitted
  * exactly once, when the watermark passes its close — the declarative
  * formulation scales to any key cardinality because session state is
  * per-key-partition, never a per-user funnel.
  *
  * Output contract vs batch q22: `session_start` = min event ts (equal),
  * `session_end` here is the session-window end = last event ts + gap
  * (q22 reports last event ts) — the spec pins the exact mapping.
  */
object StreamingSessionize {

  /** events: streaming DataFrame with at least (user_id, ts). */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "10 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events")
      )
}
