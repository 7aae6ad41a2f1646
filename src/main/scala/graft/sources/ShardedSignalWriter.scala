package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

/** DSv2 WRITE path for the sharded signal store — the Spark-side twin of
  * the reference's ClickHouse batch insert (clickhouse.go:113-130 [ext])
  * at the STORAGE-LAYOUT level: the reference's table is MergeTree
  * `ORDER BY (token_id, timestamp)` (sync_test.go:352 [ext]), i.e. data
  * lands clustered by device and time-ordered within it. This writer
  * declares that contract to Catalyst instead of hand-building it:
  *
  *   - `RequiresDistributionAndOrdering.requiredDistribution` =
  *     clustered(shard): Spark plans the shuffle that co-locates each
  *     shard's rows in one task — the caller does NOT pre-repartition,
  *     and AQE is free to size/coalesce the exchange.
  *   - `requiredOrdering` = (shard, token_id, ts_us) ASC: Spark plans the
  *     within-task sort, so every part file comes out in MergeTree key
  *     order — the layout the key-grouped READ side and future ordered
  *     scans rely on.
  *
  * Commit protocol: tasks stream to `_tmp-write-<queryId>/shard=K/…`,
  * each task's commit message lists exactly the files IT wrote (so a
  * lost speculative attempt leaves nothing behind — its files are never
  * named in a message and the staging sweep removes them), and the
  * driver-side commit moves only message-named files into place, then
  * stamps `_SUCCESS`. Overwrite (`SupportsTruncate`) clears previous
  * `shard=*` entries inside commit, after the new files are fully
  * staged — readers of the old layout are never exposed to a half
  * layout. `codec` option (`none`/`gzip`/`zstd`) picks the part-file
  * compression; the read side decodes all three transparently.
  *
  * Line format is the store's 4-field CSV (`token_id,ts_us,name,v`).
  * Numerics print via `Long.toString`/`Double.toString` — the shortest
  * form that round-trips, and the reader's parse (fast path or String
  * fallback) is bit-identical to `parseDouble` by contract, so a
  * write→read round trip is exact. Nulls print as empty fields (the
  * reader's null encoding); a null `name` therefore reads back as the
  * empty string — the minimal format has no null/empty distinction for
  * strings, and `name` may not contain `,`/newlines (rejected at write).
  */
class ShardedWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = {
    val schema = info.schema()
    val base = ShardedSignalSource.Schema
    base.fields.foreach { f =>
      val got = schema.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"graft-sharded write needs column '${f.name}'; got ${schema.fieldNames.mkString(", ")}"))
      require(got.dataType == f.dataType,
        s"graft-sharded write: column '${f.name}' must be ${f.dataType.simpleString}, got ${got.dataType.simpleString}")
    }
    val codec = info.options().getOrDefault("codec", "none").toLowerCase match {
      case c @ ("none" | "gzip" | "zstd") => c
      case other => throw new IllegalArgumentException(
        s"graft-sharded write: unknown codec '$other' (none|gzip|zstd)")
    }
    val maxPartBytes = info.options().getLong("maxPartBytes", Long.MaxValue)
    require(maxPartBytes > 0, s"graft-sharded write: maxPartBytes must be positive")
    val granuleRows = info.options().getInt("granuleRows", PartStreamWriter.DefaultGranuleRows)
    require(granuleRows > 0, s"graft-sharded write: granuleRows must be positive")
    new ShardedWrite(path, schema, doTruncate, codec, info.queryId(), maxPartBytes, granuleRows)
  }
}

class ShardedWrite(path: String, schema: StructType, truncate: Boolean,
    codec: String, queryId: String, maxPartBytes: Long = Long.MaxValue,
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows)
    extends Write with RequiresDistributionAndOrdering {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(Expressions.column("shard")))

  override def requiredOrdering(): Array[SortOrder] =
    Array("shard", "token_id", "ts_us").map(c =>
      Expressions.sort(Expressions.column(c), SortDirection.ASCENDING))

  override def toBatch: BatchWrite =
    new ShardedBatchWrite(path, schema, truncate, codec, queryId, maxPartBytes, granuleRows)

  override def toStreaming: StreamingWrite = {
    require(!truncate, "graft-sharded streaming write supports append output mode only")
    new ShardedStreamingWrite(path, schema, codec, queryId, maxPartBytes, granuleRows)
  }

  override def description(): String = s"graft-sharded write $path (codec=$codec)"
}

private[graft] object WriterFiles {
  def deleteRec(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  /** Publish rename: an atomic move that OVERWRITES an existing
    * destination. POSIX rename() already does, but `File.renameTo` returns
    * false on rename-to-existing on some filesystems (ADVICE r8), which
    * would turn an idempotent streaming republish into a spurious failure —
    * `Files.move(REPLACE_EXISTING)` makes the overwrite contract explicit
    * and portable. Throws on genuine failure (missing source, permissions).
    */
  def moveReplace(src: File, dst: File): Unit = {
    import java.nio.file.{Files => NioFiles, StandardCopyOption}
    try NioFiles.move(src.toPath, dst.toPath,
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        NioFiles.move(src.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** When a target shard dir keeps an active-parts manifest (`_parts`,
    * created by StoreOptimize's MVCC-lite publish), a committing write must
    * REGISTER its new parts there or they stay invisible to manifest-aware
    * readers. Atomic rewrite (temp + rename); commits run single-threaded
    * on the driver and the store's write contract is a single concurrent
    * publisher (the LATEST-pointer discipline), so read-modify-rename is
    * race-free. Idempotent for streaming epoch replays: already-listed
    * names are not re-added. Sidecar (`.`-prefixed) entries never enter
    * the manifest — they ride along with their part by name.
    */
  def registerInManifests(root: File, published: Seq[String]): Unit = {
    val parts = published.filter { rel =>
      val cut = rel.lastIndexOf('/')
      cut >= 0 && {
        val base = rel.substring(cut + 1)
        !base.startsWith(".") && !base.startsWith("_")
      }
    }
    parts.groupBy(rel => rel.substring(0, rel.lastIndexOf('/'))).foreach { case (dirRel, rels) =>
      val dir = new File(root, dirRel)
      val manifest = new File(dir, "_parts")
      if (manifest.isFile) {
        val src = scala.io.Source.fromFile(manifest, "UTF-8")
        val existing = try src.getLines().map(_.trim).filter(_.nonEmpty).toVector finally src.close()
        val add = rels.map(r => r.substring(r.lastIndexOf('/') + 1)).distinct
          .filterNot(existing.contains)
        if (add.nonEmpty) writeManifest(dir, existing ++ add)
      }
    }
  }

  /** Atomic (temp + rename) rewrite of a shard dir's `_parts` manifest. */
  def writeManifest(dir: File, names: Seq[String]): Unit = {
    val tmp = new File(dir, s"._parts.tmp-${java.util.UUID.randomUUID()}")
    val w = new java.io.FileOutputStream(tmp)
    try w.write(names.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally w.close()
    moveReplace(tmp, new File(dir, "_parts"))
  }

  def readManifest(dir: File): Option[Seq[String]] = {
    val manifest = new File(dir, "_parts")
    if (!manifest.isFile) None
    else {
      val src = scala.io.Source.fromFile(manifest, "UTF-8")
      Some(try src.getLines().map(_.trim).filter(_.nonEmpty).toVector finally src.close())
    }
  }

  /** Drop `names` from a shard dir's manifest, if one exists (replay
    * reconciliation: a swept orphan may have been registered by the
    * crashed first attempt of its epoch).
    */
  def unregisterFromManifest(dir: File, names: Set[String]): Unit =
    readManifest(dir).foreach { existing =>
      val kept = existing.filterNot(names)
      if (kept.length != existing.length) writeManifest(dir, kept)
    }
}

/** STREAMING ingest into the store — the reference's continuous sync loop
  * as a Structured Streaming sink, exactly-once:
  *
  *   - tasks stage each epoch under `_tmp-stream-<queryId>/epoch-<N>`
  *     with DETERMINISTIC published names (`part-e<N>-<partition>-<seq>`):
  *     a replayed epoch (micro-batch re-run after a crash) re-produces the
  *     same names, so re-publishing OVERWRITES instead of duplicating —
  *     even when the crash hit between file publish and the epoch marker;
  *   - concurrent task attempts (speculation/retry) write to
  *     attempt-suffixed temp names and atomically rename to the canonical
  *     name at task commit (last winner's rename is the file);
  *   - the driver-side epoch commit is idempotent: an existing
  *     `_stream_commits/<queryId>/epoch-<N>` marker short-circuits the
  *     replay (Spark replays the last unacknowledged batch on restart —
  *     this is the at-least-once → exactly-once bridge, same discipline
  *     as `StreamingIvm`'s applied-batch-id dedup).
  *
  * The declared distribution + ordering apply per micro-batch, so every
  * epoch's files land clustered and MergeTree-key sorted like batch parts.
  */
class ShardedStreamingWrite(path: String, schema: StructType, codec: String,
    queryId: String, maxPartBytes: Long = Long.MaxValue,
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows) extends StreamingWrite {

  private def stagingRoot = new File(path, s"_tmp-stream-$queryId")
  private def epochStaging(epochId: Long) = new File(stagingRoot, s"epoch-$epochId")
  private def marker(epochId: Long) =
    new File(path, s"_stream_commits/$queryId/epoch-$epochId")

  /** Epoch part names carry the QUERY's id (`part-e<qid8>-<N>-…`), not just
    * the epoch number (ADVICE r9): epoch numbers restart at 0 for every
    * fresh checkpoint, so an un-namespaced replay sweep
    * ([[sweepEpochOrphans]]) pointed at a store holding a PREVIOUS query's
    * epoch parts would progressively delete that run's durably-committed
    * data as its own epochs advanced. The id is Spark's streaming query id
    * — persisted in the checkpoint's metadata file, hence STABLE across
    * restarts of the same checkpoint (a replayed epoch still republishes
    * the same names and overwrites; exactly-once is preserved) and fresh
    * per new checkpoint (two lineages can never claim each other's files).
    * 8 sanitized chars keep names short; a collision costs nothing beyond
    * falling back to the pre-namespace same-name-overwrite semantics.
    */
  private val qid8: String = ShardedStreamingWrite.lineageTag(queryId)

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    ShardedStreamingWriterFactory(stagingRoot.getAbsolutePath, schema, codec, maxPartBytes, qid8,
      granuleRows)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    val m = marker(epochId)
    if (m.exists()) { WriterFiles.deleteRec(epochStaging(epochId)); return }
    val named = messages.toSeq.flatMap { case ShardedTaskCommit(files) => files }
    // replay reconciliation FIRST (ADVICE r8): a crash between file publish
    // and the marker, replayed under a DIFFERENT partitioning (AQE sizing /
    // cluster resize changes partition ids), republishes this epoch under
    // names the first attempt never used — sweep the first attempt's
    // already-published epoch files that this commit does not name, and
    // unregister them from any `_parts` manifests the crashed attempt
    // reached. Same-name files are simply overwritten below.
    sweepEpochOrphans(root, epochId, named.toSet)
    messages.foreach { case ShardedTaskCommit(files) =>
      files.foreach { rel =>
        val src = new File(epochStaging(epochId), rel)
        val dst = new File(root, rel)
        dst.getParentFile.mkdirs()
        // deterministic names make republish an overwrite; a src already
        // consumed by a pre-crash publish of this same epoch is fine
        if (src.exists()) WriterFiles.moveReplace(src, dst)
        else if (!dst.exists())
          throw new IllegalStateException(
            s"graft-sharded stream commit: cannot publish $src -> $dst")
      }
    }
    WriterFiles.registerInManifests(root, named)
    m.getParentFile.mkdirs()
    new java.io.FileOutputStream(m).close()
    WriterFiles.deleteRec(epochStaging(epochId))
    new java.io.FileOutputStream(new File(root, "_SUCCESS")).close()
  }

  /** Delete every published part/sidecar of THIS query's `epochId` (name
    * prefix `part-e<qid8>-<N>-` — never another lineage's files, ADVICE r9)
    * that `keep` does not name, per shard directory. The legacy
    * UN-NAMESPACED prefix `part-e<N>-` is swept too (ADVICE r10): a
    * checkpointed stream resumed across the qid8-namespacing change
    * replays its uncommitted epoch under the new names, and the pre-change
    * attempt's published-but-uncommitted orphans would otherwise stay
    * visible as duplicate rows forever. Two guards keep this from
    * re-opening the r9 cross-lineage deletion bug:
    *
    *   - legacy names are swept only when NO query's commit marker
    *     (`_stream_commits/<anyQueryId>/epoch-<N>`, never deleted) exists
    *     for this epoch number — a marker means some pre-change query
    *     durably committed an epoch N here, and its legacy-named data
    *     must not be claimed as our orphan;
    *   - a namespaced name has exactly 8 alphanumerics between `part-e`
    *     and its first dash, so a <8-digit epoch id can never collide
    *     with another query's qid8; an 8+-digit epoch (10M micro-batches)
    *     skips the legacy sweep rather than risk matching an all-digit
    *     qid8;
    *   - legacy names are claimed only when OLDER than
    *     [[ShardedStreamingWrite.LegacyOrphanGraceMs]] (ADVICE r11): the
    *     marker check is point-in-time, so a STILL-RUNNING pre-change
    *     query that has published its epoch-N parts but not yet written
    *     its marker must not lose them to a post-change query committing
    *     the same epoch number — our own pre-crash attempt's orphans are
    *     at least a restart-gap old, a live writer's files are fresh.
    *     Residual corner (documented, accepted): a restart FASTER than
    *     the grace leaves the legacy orphans visible as duplicate rows;
    *     they are not lost state — the next `OPTIMIZE FINAL` collapse
    *     removes them with the rest of the superseded generations.
    */
  private def sweepEpochOrphans(root: File, epochId: Long, keep: Set[String]): Unit = {
    val now = System.currentTimeMillis()
    val prefix = s"part-e$qid8-$epochId-"
    val epochCommittedByAnyQuery =
      Option(new File(root, "_stream_commits").listFiles()).getOrElse(Array.empty)
        .exists(q => q.isDirectory && new File(q, s"epoch-$epochId").exists())
    val legacyPrefix =
      if (epochId.toString.length < 8 && !epochCommittedByAnyQuery)
        Some(s"part-e$epochId-")
      else None
    Option(root.listFiles()).getOrElse(Array.empty).foreach { d =>
      d.getName match {
        case ShardedSignalSource.ShardDir(_) if d.isDirectory =>
          val keepHere: Set[String] = keep.collect {
            case rel if rel.startsWith(d.getName + "/") =>
              rel.substring(d.getName.length + 1)
          }
          val dropped = Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
            val n = f.getName
            // `.X.minmax`-style sidecars follow their owner part X
            val owner = PartStats.sidecarOwner(n).getOrElse(n)
            val ours = owner.startsWith(prefix) ||
              (legacyPrefix.exists(owner.startsWith) &&
                now - f.lastModified() > ShardedStreamingWrite.LegacyOrphanGraceMs)
            if (f.isFile && ours && !keepHere.contains(owner)) {
              f.delete(); Some(owner)
            } else None
          }.toSet
          if (dropped.nonEmpty) WriterFiles.unregisterFromManifest(d, dropped)
        case _ => ()
      }
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    WriterFiles.deleteRec(epochStaging(epochId))
}

object ShardedStreamingWrite {
  /** 8 sanitized chars of a streaming query id — the lineage namespace in
    * epoch part names.
    */
  private[graft] def lineageTag(queryId: String): String =
    queryId.filter(_.isLetterOrDigit).take(8)

  /** Minimum age before a pre-namespacing (`part-e<N>-`) file may be
    * claimed as this query's orphan — see `sweepEpochOrphans`. A live
    * mixed-version writer's publish-to-marker window is milliseconds;
    * a crash-to-restart gap is (much) longer. One minute separates them
    * by orders of magnitude on both sides.
    */
  private[graft] val LegacyOrphanGraceMs: Long = 60000L
}

case class ShardedStreamingWriterFactory(stagingRoot: String, schema: StructType,
    codec: String, maxPartBytes: Long = Long.MaxValue,
    qid8: String = "",
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new ShardedDataWriter(s"$stagingRoot/epoch-$epochId", schema, codec, partitionId, taskId,
      namePrefix = s"part-e$qid8-$epochId", deterministicNames = true, maxPartBytes = maxPartBytes,
      granuleRows = granuleRows)
}

/** Files one task committed, relative to the staging dir. */
case class ShardedTaskCommit(files: Seq[String]) extends WriterCommitMessage

class ShardedBatchWrite(path: String, schema: StructType, truncate: Boolean,
    codec: String, queryId: String, maxPartBytes: Long = Long.MaxValue,
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows) extends BatchWrite {

  private def staging = new File(path, s"_tmp-write-$queryId")

  /** Monotonic job component, FIRST in every published batch part name
    * (`part-<millis>-<partition>-<task>-<seq>`), so natural name order on a
    * manifest-less multi-append store sorts whole JOBS in ingest order
    * (ADVICE r9: `part-<partition>-…` interleaved jobs by partition id,
    * resolving exact-key ties to the wrong append). Wall-clock millis at
    * job build — ties within one millisecond and clock skew across drivers
    * are the documented residual; the `_parts` manifest (commit order) is
    * the authoritative mechanism where exactness matters.
    */
  private val jobTag: Long = System.currentTimeMillis()

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    staging.mkdirs()
    ShardedDataWriterFactory(staging.getAbsolutePath, schema, codec, maxPartBytes,
      namePrefix = s"part-$jobTag", granuleRows = granuleRows)
  }

  private def deleteRec(f: File): Unit = WriterFiles.deleteRec(f)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new File(path)
    if (truncate) {
      Option(root.listFiles()).getOrElse(Array.empty[File]).foreach { f =>
        val isShard = f.getName match {
          case ShardedSignalSource.ShardFile(_) => f.isFile
          case ShardedSignalSource.ShardDir(_) => f.isDirectory
          case _ => false
        }
        if (isShard) deleteRec(f)
      }
    }
    // move exactly the message-named files (a dead speculative attempt's
    // residue stays in staging and is swept below, never published)
    messages.foreach { case ShardedTaskCommit(files) =>
      files.foreach { rel =>
        val src = new File(staging, rel)
        val dst = new File(root, rel)
        dst.getParentFile.mkdirs()
        WriterFiles.moveReplace(src, dst)
      }
    }
    WriterFiles.registerInManifests(root,
      messages.toSeq.flatMap { case ShardedTaskCommit(files) => files })
    deleteRec(staging)
    new java.io.FileOutputStream(new File(root, "_SUCCESS")).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = deleteRec(staging)
}

case class ShardedDataWriterFactory(stagingDir: String, schema: StructType,
    codec: String, maxPartBytes: Long = Long.MaxValue,
    namePrefix: String = "part",
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ShardedDataWriter(stagingDir, schema, codec, partitionId, taskId,
      namePrefix = namePrefix, maxPartBytes = maxPartBytes, granuleRows = granuleRows)
}

/** One task's part writer: routes rows into per-(shard, roll) parts via the
  * shared [[PartStreamWriter]] core — every part therefore carries the SAME
  * sidecar set the maintenance jobs produce: `.minmax` stats (minmax/bloom/
  * name-set/null-count skip indexes) and, past one granule, the
  * `.granules` mark index that makes pushed point reads parse only
  * matching granules and compressed parts byte-range splittable.
  * `maxPartBytes` (uncompressed line bytes) rolls parts inside the sorted
  * stream, so a big shard lands as a SET of key-range parts, not a
  * monolith.
  */
class ShardedDataWriter(stagingDir: String, schema: StructType, codec: String,
    partitionId: Int, taskId: Long,
    namePrefix: String = "part", deterministicNames: Boolean = false,
    maxPartBytes: Long = Long.MaxValue,
    granuleRows: Int = PartStreamWriter.DefaultGranuleRows)
    extends DataWriter[InternalRow] {

  private val shardIdx = schema.fieldIndex("shard")
  private val tokIdx = schema.fieldIndex("token_id")
  private val tsIdx = schema.fieldIndex("ts_us")
  private val nameIdx = schema.fieldIndex("name")
  private val vIdx = schema.fieldIndex("v")

  private var curShard = -1
  private var pw: PartStreamWriter = _
  private var partSeq = 0
  private val files = mutable.ArrayBuffer.empty[String]
  private var curSidecarRel: String = _
  private var curGranuleRel: String = _

  private def ext: String = codec match {
    case "gzip" => ".csv.gz"
    case "zstd" => ".csv.zst"
    case _ => ".csv"
  }

  /** Close the open part: the core writes its sidecars; register them so
    * the commit protocol moves/renames/aborts them exactly like the part.
    */
  private def finishPart(): Unit = if (pw != null) {
    pw.finishStaged()
    files += curSidecarRel
    if (pw.granuleWritten) files += curGranuleRel
    pw = null
  }

  private def open(shard: Int): Unit = {
    finishPart()
    // required ordering makes shards contiguous, so this rolls over once
    // per shard; a (misplanned) revisit still lands in a fresh part file.
    // Deterministic mode (streaming epochs) keys the published name by
    // (prefix, partition, seq) only — a replayed epoch overwrites rather
    // than duplicates — and concurrent attempts write attempt-suffixed
    // temps that the task commit atomically renames (last winner's file).
    val rel =
      if (deterministicNames) s"shard=$shard/$namePrefix-$partitionId-$partSeq$ext"
      else s"shard=$shard/$namePrefix-$partitionId-$taskId-$partSeq$ext"
    partSeq += 1
    val cut = rel.lastIndexOf('/')
    val dirRel = rel.substring(0, cut + 1)
    val base = rel.substring(cut + 1)
    curSidecarRel = dirRel + PartStats.sidecarName(base)
    curGranuleRel = dirRel + GranuleIndex.granuleName(base)
    val f = new File(stagingDir, rel + attemptSuffix)
    f.getParentFile.mkdirs()
    pw = PartStreamWriter.direct(f,
      new File(stagingDir, curSidecarRel + attemptSuffix),
      new File(stagingDir, curGranuleRel + attemptSuffix),
      codec, granuleRows)
    files += rel
    curShard = shard
  }

  private def attemptSuffix: String = if (deterministicNames) s".t$taskId" else ""

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(shardIdx))
      throw new IllegalArgumentException("graft-sharded write: shard must not be null")
    val shard = row.getInt(shardIdx)
    if (shard < 0)
      throw new IllegalArgumentException(s"graft-sharded write: negative shard $shard")
    if (pw == null || shard != curShard) open(shard)
    val name: String =
      if (row.isNullAt(nameIdx)) null
      else {
        val n = row.getUTF8String(nameIdx).toString
        if (n.indexOf(',') >= 0 || n.indexOf('\n') >= 0 || n.indexOf('\r') >= 0)
          throw new IllegalArgumentException(
            s"graft-sharded write: name may not contain ','/newline: '$n'")
        n
      }
    pw.writeFields(
      if (row.isNullAt(tokIdx)) null else java.lang.Long.valueOf(row.getLong(tokIdx)),
      if (row.isNullAt(tsIdx)) null else java.lang.Long.valueOf(row.getLong(tsIdx)),
      name,
      if (row.isNullAt(vIdx)) null else java.lang.Double.valueOf(row.getDouble(vIdx)))
    if (pw.uncompressedBytes >= maxPartBytes) finishPart() // next row opens a new part
  }

  override def commit(): WriterCommitMessage = {
    finishPart()
    if (deterministicNames) files.foreach { rel =>
      val tmp = new File(stagingDir, rel + attemptSuffix)
      val dst = new File(stagingDir, rel)
      // concurrent attempts: last finalizer's file wins (overwrite); a tmp
      // already consumed means another attempt of this task finalized.
      // Granule sidecars are conditional (only multi-granule parts have
      // one), so an absent tmp+dst pair is an error only for parts/minmax.
      if (tmp.exists()) WriterFiles.moveReplace(tmp, dst)
      else if (!dst.exists())
        throw new IllegalStateException(s"graft-sharded task commit: cannot finalize $tmp")
    }
    ShardedTaskCommit(files.toSeq)
  }
  override def abort(): Unit = {
    if (pw != null) pw.closeQuietly()
    files.foreach(rel => new File(stagingDir, rel + attemptSuffix).delete())
  }
  override def close(): Unit = if (pw != null) pw.closeQuietly()
}
