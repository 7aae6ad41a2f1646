package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incrementally-maintained materialized view: the per-(event_type, day)
  * count/sum view of q143, kept up to date by a micro-batch stream instead
  * of full recomputes — the streaming form of the reference's incremental
  * sync loop (resume from persisted state, apply only the delta,
  * `internal/sync/sync.go:128-137`).
  *
  * Each micro-batch aggregates its own rows (delta view), merges into the
  * persisted snapshot by ONE full-outer sum (view-sized work, q143's
  * algebra), writes a fresh immutable snapshot dir, and flips a LATEST
  * pointer atomically — a reader always sees a complete view.
  *
  * Exactly-once across crash-replay: the applied batch id is recorded IN
  * the snapshot pointer; foreachBatch redelivers a batch after a crash,
  * and [[processBatch]] skips ids ≤ the recorded one — the merge is
  * therefore idempotent under Structured Streaming's at-least-once
  * foreachBatch contract (same id ⇒ same data ⇒ safe skip).
  */
object StreamingIvm {

  private def latestPath(root: String): Option[(String, Long)] = {
    val p = Paths.get(root, "LATEST")
    if (!Files.exists(p)) None
    else {
      val Array(dir, bid) =
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.split('\t')
      Some((dir, bid.toLong))
    }
  }

  private def publish(root: String, snapshot: String, batchId: Long): Unit = {
    val tmp = Paths.get(root, "LATEST.tmp")
    Files.createDirectories(Paths.get(root))
    Files.write(tmp, s"$snapshot\t$batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(root, "LATEST"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** The view definition shared by delta and full recompute. */
  def view(events: DataFrame): DataFrame =
    events.select(col("event_type"),
        to_date(col("ts")).cast("string").as("day_str"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy(col("event_type"), col("day_str"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))

  /** Read the current view (empty if no snapshot yet). */
  def readView(spark: SparkSession, root: String): DataFrame =
    latestPath(root) match {
      case Some((dir, _)) => spark.read.parquet(dir)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("day_str",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_cents",
            org.apache.spark.sql.types.LongType))))
    }

  /** Merge one batch into the persisted view. Skips replayed batch ids. */
  def processBatch(batch: DataFrame, root: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val applied = latestPath(root).map(_._2).getOrElse(-1L)
    if (batchId <= applied) return // crash-replay of an already-merged batch
    if (batch.isEmpty) return // empty merge is a no-op; replay-safe without tracking
    val delta = view(batch)
      .withColumnRenamed("n", "dn").withColumnRenamed("sum_cents", "ds")
    val merged = readView(spark, root)
      .withColumnRenamed("n", "bn").withColumnRenamed("sum_cents", "bs")
      .join(delta, Seq("event_type", "day_str"), "full_outer")
      .select(col("event_type"), col("day_str"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L))).as("sum_cents"))
    val snapshot = s"$root/view-$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(snapshot)
    publish(root, snapshot, batchId)
  }

  /** Start the maintenance stream over an events source. */
  def start(events: DataFrame, root: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, root, batchId)
      }
      .start()
}
