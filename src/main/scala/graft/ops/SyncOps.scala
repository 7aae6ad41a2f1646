package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental-sync building blocks: token-set resolution, low-watermark
  * computation, and the bounded scan predicate.
  *
  * The reference runs one pagination loop per vehicle, each resuming from
  * the oldest already-synced timestamp and walking **backwards in time**
  * (`internal/sync/sync.go:109-160`, watermark `:128-137`). In Spark the
  * loop disappears: one watermark aggregate over the sink + one bounded
  * predicate on the source reads everything still missing, in a single
  * shuffle-light pass, with no page-boundary skip bug (SURVEY §2.7).
  */
object SyncOps {

  /** Parse an explicit token list — CSV semantics of the reference
    * (`sync.go:211-234`, `main.go:90-97`): whitespace-tolerant, unparsable
    * entries skipped.
    */
  def parseTokenList(raw: Seq[String]): Seq[Long] =
    raw.map(_.trim).filter(_.nonEmpty).flatMap(s => s.toLongOption)

  /** Token discovery from the sink when no explicit list is given:
    * `SELECT DISTINCT token_id FROM signal` (`clickhouse.go:89-110`).
    */
  def tokensFromSink(sink: DataFrame): DataFrame =
    sink.select(col("tokenId")).distinct()

  /** Per-token low watermark = oldest already-synced timestamp, optionally
    * restricted to a signal-name set — the reference's `QueryOldestSignal`
    * (`clickhouse.go:65-87`) done for ALL tokens in one aggregate instead of
    * N point queries.
    */
  def watermarks(sink: DataFrame, names: Seq[String] = Nil): DataFrame = {
    val base =
      if (names.isEmpty) sink
      else sink.where(col("name").isin(names: _*))
    base.groupBy(col("tokenId")).agg(min(col("timestamp")).as("watermark"))
  }

  /** The bounded-scan predicate: half-open `[start, stop)` interval
    * (inclusive start, exclusive stop — reference Gte/Lt,
    * `elastic.go:47-48,54`; the tests' +500ms arithmetic depends on it,
    * `sync_test.go:68,75`).
    */
  def timeBound(timeCol: Column, start: java.sql.Timestamp, stop: java.sql.Timestamp): Column =
    timeCol >= lit(start) && timeCol < lit(stop)

  /** Restrict a per-token bounded scan by each token's watermark: rows at or
    * after the watermark are already synced (sync walks backwards from the
    * watermark toward start). Docs are keyed by `subject`; `dim` maps
    * subject→tokenId; `wm` is the [[watermarks]] output. Tokens absent from
    * the sink have no watermark row and keep their full `[start, stop)`
    * range (reference `sync.go:96-100`: fresh token ⇒ opts.StopTime).
    */
  def applyWatermarks(docs: DataFrame, dim: DataFrame, wm: DataFrame): DataFrame =
    docs
      .join(broadcast(dim.select("tokenId", "subject")), Seq("subject"), "inner")
      .join(broadcast(wm), Seq("tokenId"), "left_outer")
      .where(col("watermark").isNull || col("time") < col("watermark"))
      .drop("watermark")

  /** Known-whale discovery for [[graft.jobs.SyncJob.runLiveRanged]]'s
    * `hotSubjects` — "one prior `groupBy(subject).count()` run" as a
    * one-liner: subjects whose already-synced row count exceeds
    * `minRows`, deepest first. The count runs ON the cluster; only the
    * whale rows broadcast into the dim join and only they reach the
    * driver (a fleet has FEW whales by definition — `maxSubjects` caps a
    * mis-tuned threshold so a low cutoff cannot collect the fleet).
    * History depth in the SINK is the proxy for depth in the source —
    * exact for steady-state incremental syncs (everything but the
    * unsynced suffix is in the sink), and merely suboptimal when wrong
    * (a missed whale straggles its tile as before; a false whale costs
    * one needless slice fan-out — never a wrong row either way).
    */
  def hotSubjectsFromSink(sink: DataFrame, dim: DataFrame, minRows: Long,
      maxSubjects: Int = 1000): Seq[String] =
    hotSubjectsFromCounts(
      sink.groupBy(col("tokenId")).agg(count(lit(1)).as("n")), dim, minRows, maxSubjects)

  /** [[hotSubjectsFromSink]] over an ALREADY-AGGREGATED per-token count
    * table (`tokenId`, `n`) — callers that computed the counts for another
    * purpose (e.g. [[graft.jobs.SyncJob.runLiveRanged]]'s weight staging)
    * reuse them here instead of re-scanning the sink (r18, guide §2.4).
    */
  def hotSubjectsFromCounts(counts: DataFrame, dim: DataFrame, minRows: Long,
      maxSubjects: Int = 1000): Seq[String] = {
    // the cap applies BEFORE the broadcast build: a mis-tuned low
    // threshold makes `n > minRows` match most of the fleet, and
    // broadcasting THAT would collect millions of rows to the driver —
    // the exact wall this helper's caller exists to avoid. Capped first,
    // the build side is ≤ maxSubjects rows whatever the threshold.
    val whales = counts
      .where(col("n") > minRows)
      .orderBy(col("n").desc, col("tokenId"))
      .limit(maxSubjects)
    dim.select("tokenId", "subject")
      .join(broadcast(whales), Seq("tokenId"))
      .orderBy(col("n").desc, col("subject"))
      .select("subject").collect().map(_.getString(0)).toSeq
  }
}
