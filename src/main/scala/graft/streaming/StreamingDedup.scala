package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.jobs.DedupIndexJob
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental dedup: a document stream is deduplicated
  * micro-batch by micro-batch against the PERSISTED MinHash index
  * ([[DedupIndexJob]]'s parquet snapshots), and each batch is folded into
  * a fresh immutable snapshot — the composition of this round's two new
  * surfaces, and the streaming shape of the reference's resume loop
  * (state persisted outside the process, every run starts from it,
  * `internal/sync/sync.go:128-137`).
  *
  * Semantics: the pairs emitted over the life of the stream are exactly
  * the pairs a from-scratch batch dedup of the full corpus would emit —
  * wave-by-wave candidate generation loses nothing because every pair is
  * new×(old ∪ new) for whichever side arrived later (`DedupSpec` pins the
  * invariant end-to-end over a file-source stream).
  *
  * Snapshots rotate per batch under `indexRoot/idx-<batchId>` with a
  * LATEST pointer file updated by atomic move AFTER the snapshot is fully
  * written — a concurrent reader always sees a complete index. Pair
  * output is append-only parquet; on crash-replay of an uncommitted batch
  * the pairs append is at-least-once (same caveat as any foreachBatch
  * file sink — dedupe downstream on (id_a, id_b) if exactly-once matters).
  */
object StreamingDedup {

  private def latestPath(indexRoot: String): Option[String] = {
    val p = Paths.get(indexRoot, "LATEST")
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim)
    else None
  }

  private def publishLatest(indexRoot: String, snapshot: String): Unit = {
    val tmp = Paths.get(indexRoot, "LATEST.tmp")
    Files.createDirectories(Paths.get(indexRoot))
    Files.write(tmp, snapshot.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(indexRoot, "LATEST"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Dedup one arrived batch against the current snapshot (empty index ⇒
    * intra-batch pairs only), append verified pairs, merge, publish.
    * Exposed for batch-mode reuse and direct testing.
    */
  def processBatch(
      batch: DataFrame,
      indexRoot: String,
      pairsPath: String,
      batchId: Long,
      idCol: String,
      textCol: String,
      k: Int,
      threshold: Double
  ): Unit = {
    if (batch.isEmpty) return
    val snapshot = s"$indexRoot/idx-$batchId"
    val pairs = latestPath(indexRoot) match {
      case Some(cur) =>
        val out = DedupIndexJob.dedupBatch(batch, cur, idCol, textCol, k, threshold)
        DedupIndexJob.mergeIndex(batch, cur, snapshot, idCol, textCol, k)
        out
      case None =>
        DedupIndexJob.writeIndex(batch, idCol, textCol, k, snapshot)
        Dedup.minhashDedup(batch, idCol, textCol, k, threshold)
    }
    pairs.write.mode(SaveMode.Append).parquet(pairsPath)
    publishLatest(indexRoot, snapshot)
  }

  /** Start the stream: one [[processBatch]] per micro-batch. */
  def start(
      docs: DataFrame,
      indexRoot: String,
      pairsPath: String,
      checkpoint: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
      threshold: Double = 0.5
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        processBatch(batch.toDF(), indexRoot, pairsPath, batchId, idCol, textCol, k, threshold)
      }
      .start()
}
