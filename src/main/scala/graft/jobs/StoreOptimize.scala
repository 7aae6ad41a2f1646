package graft.jobs

import java.io.File
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow

import graft.sources.{LatestCollapseReader, PartStats, ShardRowPredicate, ShardedMergeReader, ShardedSignalSource}

/** `OPTIMIZE TABLE` for the sharded signal store — the maintenance half of
  * a MergeTree lifecycle (ClickHouse runs the same operation as background
  * merges; the reference's table accumulates one part per insert batch,
  * clickhouse.go:113-130 [ext], and relies on the server to merge them).
  * Streaming ingest leaves one part per (epoch × shard): thousands of tiny
  * sorted parts per shard after a week. Each read then pays a part-count
  * K-way heap and per-file open/seek cost. This job K-way-MERGES every
  * shard's sorted parts into ONE sorted part — no shuffle, no sort, no
  * Spark exchange: the merge is the per-shard imperative unit MergeTree
  * itself uses, parallelized one task per shard.
  *
  * Publish protocol (MVCC-lite, atomic under concurrent readers):
  *
  *   1. if the shard has no `_parts` manifest yet, write one listing the
  *      parts visible NOW (atomic temp+rename) — readers flip from
  *      listing-semantics to manifest-semantics with the SAME view;
  *   2. write the merged part + its minmax sidecar as dot-files
  *      (invisible), then rename to canonical names (visible to a plain
  *      listing but NOT in the manifest — still invisible to readers);
  *   3. FLIP: read-modify-rename the manifest to
  *      `merged part + (current entries − merged INPUT parts)` — a write
  *      that committed while the merge ran keeps its registered parts
  *      (ADVICE r8: a flip to exactly [merged] dropped them). The merged
  *      part is PREPENDED: manifest order is ingest order (the
  *      `dedup=latest` tie-break), and its content predates everything
  *      registered mid-merge;
  *   4. GC: delete exactly the merged input parts + their sidecars, plus
  *      residue only a crashed optimize can have produced (`part-opt-*`
  *      parts absent from the manifest, staged dot-tmp files). Foreign
  *      unlisted parts are left alone — a batch/streaming commit publishes
  *      files BEFORE registering them, so an unlisted part may be a commit
  *      in flight.
  *
  * A crash between any two steps leaves readers on a consistent view (old
  * parts before the flip, merged part after); re-running the job completes
  * the GC. Batch and streaming writes committed at ANY point register
  * their new parts in the manifest (`WriterFiles.registerInManifests`)
  * and survive a concurrent optimize, so ingest and maintenance
  * interleave. The remaining single-writer assumptions are (a) one
  * OPTIMIZE at a time per store, and (b) the manifest read-modify-rename
  * itself is not fenced against a register landing in the same instant —
  * the store's documented single-concurrent-publisher discipline (the
  * LATEST-pointer contract) covers both.
  *
  * `finalDedup = true` is `OPTIMIZE … FINAL` under the store's replacing
  * semantics: the merge collapses each (token_id, name) to its newest
  * `ts_us` row ([[LatestCollapseReader]] — winners re-emitted in ts order,
  * so the merged part keeps the sort contract). After a FINAL optimize, a
  * plain read of the store IS the `dedup=latest` snapshot.
  *
  * Flat `shard=K.csv` fixture files are left untouched (they are already
  * one part and carry no manifest).
  */
object StoreOptimize {

  /** One shard's outcome (rows = rows in the merged part). */
  case class ShardResult(shard: Int, partsBefore: Int, rows: Long, mergedPart: String)

  private case class OptTask(shard: Int, dir: String, parts: Seq[String],
      codec: String, finalDedup: Boolean, gcOnly: Boolean)

  /** Optimize every shard directory under `path`. Shards already at one
    * part are skipped (unless `finalDedup` or `force`); shards with
    * crashed-optimize residue get a GC pass either way. Returns one
    * [[ShardResult]] per rewritten shard.
    */
  def optimize(spark: SparkSession, path: String, codec: String = "zstd",
      finalDedup: Boolean = false, force: Boolean = false): Seq[ShardResult] = {
    val root = new File(path)
    val shardDirs = Option(root.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
      f.getName match {
        case ShardedSignalSource.ShardDir(k) if f.isDirectory => Some(k.toInt -> f)
        case _ => None
      }
    }.sortBy(_._1)

    val tasks = shardDirs.flatMap { case (k, dir) =>
      val parts = ShardedSignalSource.activeParts(dir)
      if (parts.isEmpty) None
      else if (parts.size > 1 || finalDedup || force)
        Some(OptTask(k, dir.getAbsolutePath, parts.map(_.getName),
          codec, finalDedup, gcOnly = false))
      else if (unlistedResidue(dir, parts).nonEmpty)
        Some(OptTask(k, dir.getAbsolutePath, parts.map(_.getName),
          codec, finalDedup, gcOnly = true))
      else None
    }
    if (tasks.isEmpty) return Seq.empty

    // one task per shard: the same parallel unit the scan reads by — an
    // executor merges its shard locally, nothing crosses the network
    val results = spark.sparkContext
      .parallelize(tasks, tasks.size)
      .map(runTask)
      .collect().toSeq
    results.filter(_.rows >= 0).sortBy(_.shard)
  }

  /** Residue only a crashed OPTIMIZE can have produced: canonical
    * `part-opt-*` files a manifest-following reader would not see (merged
    * part renamed but never flipped in), their sidecars, and staged
    * dot-tmp files. Foreign unlisted parts are NOT residue — they may be a
    * concurrent commit between its publish and its manifest registration.
    */
  private def unlistedResidue(dir: File, active: Seq[File]): Seq[File] = {
    if (!new File(dir, "_parts").isFile) return Seq.empty
    val keep = active.map(_.getName).toSet
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.filter { p =>
      p.isFile && {
        val n = p.getName
        (maintenancePart(n) && !keep.contains(n)) ||
          (n.startsWith(".") && n.endsWith(".minmax") &&
            maintenancePart(n.substring(1, n.length - ".minmax".length)) &&
            !keep.contains(n.substring(1, n.length - ".minmax".length))) ||
          (n.startsWith(".") && (n.endsWith(".tmp") || n.contains(".tmp-")))
      }
    }
  }

  /** Part names only the maintenance jobs produce (crashed-run residue is
    * identifiable by prefix; writer parts never collide with these).
    */
  private[graft] def maintenancePart(n: String): Boolean =
    n.startsWith("part-opt-") || n.startsWith("part-ret-")

  private[graft] def atomicWrite(target: File, lines: Seq[String]): Unit = {
    val tmp = new File(target.getParentFile,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
    val w = new java.io.FileOutputStream(tmp)
    try w.write(lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally w.close()
    graft.sources.WriterFiles.moveReplace(tmp, target)
  }

  private[graft] def ext(codec: String): String = codec match {
    case "gzip" => ".csv.gz"
    case "zstd" => ".csv.zst"
    case "none" => ".csv"
    case other => throw new IllegalArgumentException(
      s"store-optimize: unknown codec '$other' (none|gzip|zstd)")
  }

  private def runTask(t: OptTask): ShardResult = {
    val dir = new File(t.dir)
    val manifest = new File(dir, "_parts")

    // step 1: flip to manifest semantics FIRST (same view), so every later
    // step is invisible until the final atomic manifest rewrite. The
    // initial manifest lists the parts visible NOW (not the planning-time
    // snapshot): a write committed between planning and this task must not
    // be hidden by the flip to manifest semantics.
    if (!manifest.isFile) atomicWrite(manifest,
      graft.sources.ShardedSignalSource.activeParts(dir).map(_.getName))

    if (t.gcOnly) {
      gcResidue(dir, retired = Set.empty)
      return ShardResult(t.shard, t.parts.size, -1L, "")
    }

    val mergedName = s"part-opt-${java.util.UUID.randomUUID().toString.take(12)}${ext(t.codec)}"

    // step 2: merge-read the sorted parts (the MergeTree read) and stream
    // the merged — still sorted — rows straight back out as one part,
    // collecting its minmax/bloom/name-set sidecar on the way through
    val schema = ShardedSignalSource.Schema
    val merge = new ShardedMergeReader(
      t.parts.map(n => new File(dir, n).getAbsolutePath),
      t.shard, schema, ShardRowPredicate.Trivial)
    val reader: org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
      if (t.finalDedup) new LatestCollapseReader(merge, schema, schema) else merge

    val pw = new graft.sources.PartStreamWriter(dir, mergedName, t.codec)
    try {
      while (reader.next()) pw.write(reader.get())
    } finally {
      pw.finishStaged()
      reader.close()
    }
    // staged → canonical (visible to a listing, absent from the manifest —
    // manifest readers still see the old parts)
    pw.publish()

    publishMerged(dir, t.parts, mergedName)

    ShardResult(t.shard, t.parts.size, pw.rows, mergedName)
  }

  /** Steps 3–4 of the publish protocol (package-visible: the race with a
    * concurrent commit is pinned by spec).
    *
    * FLIP — read-modify-rename: drop exactly the merged INPUT parts, keep
    * anything a concurrent commit registered while the merge ran, prepend
    * the merged part (ingest order — its content predates every mid-merge
    * registration). Then GC the retired inputs + optimize-owned residue.
    */
  private[graft] def publishMerged(dir: File, inputParts: Seq[String], mergedName: String): Unit = {
    val inputSet = inputParts.toSet
    val current = graft.sources.WriterFiles.readManifest(dir).getOrElse(Seq.empty)
    atomicWrite(new File(dir, "_parts"), mergedName +: current.filterNot(inputSet))
    gcResidue(dir, retired = inputSet)
  }

  /** Delete exactly `retired` (the merged input parts) and their sidecars,
    * plus residue only THIS job can have produced: `part-opt-*` parts
    * absent from the manifest (a crashed optimize renamed its merged part
    * to canonical but never flipped), their sidecars, and staged dot-tmps.
    * Never touches foreign unlisted parts — they may be a concurrent
    * batch/streaming commit between its file publish and its manifest
    * registration (ADVICE r8: the old keep-set sweep deleted them).
    */
  private[graft] def gcResidue(dir: File, retired: Set[String]): Unit = {
    val listed: Set[String] =
      graft.sources.WriterFiles.readManifest(dir).map(_.toSet).getOrElse(Set.empty)
    def dead(part: String): Boolean =
      retired.contains(part) || (maintenancePart(part) && !listed.contains(part))
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { p =>
      val n = p.getName
      if (p.isFile) {
        if (!n.startsWith(".") && !n.startsWith("_")) {
          if (dead(n)) p.delete()
        } else if (n.startsWith(".") && n.endsWith(".minmax")) {
          // `.X.minmax` belongs to part X
          if (dead(n.substring(1, n.length - ".minmax".length))) p.delete()
        } else if (n.startsWith(".") && (n.endsWith(".tmp") || n.contains(".tmp-"))) {
          p.delete() // staged residue of a crashed optimize/manifest write
        }
      }
    }
  }
}
