package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor: the incremental form of q130's
  * two-sample KS statistic. Events stream in; per 1000-cent bucket, a
  * keyed state holds the two populations' per-cent counters
  * (`flatMapGroupsWithState`), and every trigger emits that bucket's
  * refreshed histogram slice. The per-bucket output table is
  * DIMENSION-sized (≤ #buckets × distinct cents within), so the final
  * D = max |F_a − F_b| is computed from the emitted table by the exact
  * integer cumsum q130 uses — the corpus never re-sorts, and state is
  * per-bucket (parallel, bounded by the value domain, never by rows).
  *
  * This is the 100 TB shape: histogram state shards by bucket across
  * executors exactly like a shuffle would place it, each micro-batch
  * touches only the buckets it saw, and the downstream KS reduction runs
  * over the compact histogram — the same two-phase discipline as the
  * batch query, just maintained incrementally.
  */
object StreamingDrift {

  /** One population's observation: which sample it belongs to and the
    * integer-cents value (the q130 collapse applied upstream).
    */
  case class Obs(bucket: Long, cents: Long, isA: Boolean)

  /** One per-cent histogram cell emitted after a state update. */
  case class Cell(bucket: Long, cents: Long, an: Long, bn: Long)

  private type HState = Map[Long, (Long, Long)]

  /** Fold a micro-batch's observations for one bucket into the histogram
    * state and emit the bucket's full refreshed slice (update semantics:
    * downstream keeps the latest row per (bucket, cents)).
    */
  def updateBucket(
      bucket: Long,
      rows: Iterator[Obs],
      state: GroupState[HState]
  ): Iterator[Cell] = {
    val cur = state.getOption.getOrElse(Map.empty)
    val next = rows.foldLeft(cur) { (m, o) =>
      val (a, b) = m.getOrElse(o.cents, (0L, 0L))
      m.updated(o.cents, if (o.isA) (a + 1, b) else (a, b + 1))
    }
    state.update(next)
    next.iterator.map { case (c, (a, b)) => Cell(bucket, c, a, b) }
  }

  /** Wire the stream: values → cents → per-bucket stateful histograms. */
  def histogram(events: DataFrame): Dataset[Cell] = {
    import events.sparkSession.implicits._
    events
      .select(round(col("value") * 100).cast("long").as("cents"),
        (col("event_type") === "click").as("isA"))
      .select(expr("cents div 1000").as("bucket"), col("cents"), col("isA"))
      .as[(Long, Long, Boolean)]
      .map { case (bkt, c, ia) => Obs(bkt, c, ia) }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(updateBucket)
  }

  /** Restartable sink: append each trigger's emitted cells to parquet,
    * stamped with the batch id, under a checkpoint — the durable form
    * (the memory sink cannot recover from a checkpoint). The latest
    * emission per (bucket, cents) is selected by max batch id downstream.
    */
  def startParquetSink(cells: Dataset[Cell], outDir: String, checkpoint: String)
    : org.apache.spark.sql.streaming.StreamingQuery =
    cells.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Cell], batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outDir)
      }
      .outputMode(OutputMode.Update)
      .start()

  /** Latest histogram state from the parquet emission log. */
  def latestCells(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("bucket"), col("cents"))
      .agg(max(struct(col("batch_id"), col("an"), col("bn"))).as("s"))
      .select(col("bucket"), col("cents"), col("s.an").as("an"), col("s.bn").as("bn"))

  /** Exact KS D in ppm from a (bucket, cents, an, bn) histogram table —
    * shared by the streaming sink readout and the batch cross-check.
    * Integer arithmetic identical to q130's.
    */
  def ksFromHistogram(cells: DataFrame): Long = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("cents")).rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells
      .select(col("cents"), col("an"), col("bn"))
      .withColumn("ca", sum(col("an")).over(w))
      .withColumn("cb", sum(col("bn")).over(w))
    val tot = cells.agg(sum(col("an")).as("na"), sum(col("bn")).as("nb"))
    cum.crossJoin(broadcast(tot))
      .select(expr("(abs(ca * nb - cb * na) * 1000000) div (na * nb)").as("d"))
      .agg(max(col("d"))).collect()(0).getLong(0)
  }
}
