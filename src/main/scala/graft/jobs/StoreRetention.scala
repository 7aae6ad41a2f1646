package graft.jobs

import java.io.File

import org.apache.spark.sql.SparkSession

import graft.sources.{PartStats, PartStreamWriter, PartTrash, ShardRowPredicate, ShardedPartitionReader, ShardedSignalSource, WriterFiles}

/** `TTL … DELETE` for the sharded signal store — the third MergeTree
  * lifecycle piece after ingest (the V2 writer) and merges
  * ([[StoreOptimize]]): ClickHouse tables like the reference's carry a
  * retention TTL and the server drops expired rows part-by-part. This job
  * expires every row with `ts_us < cutoff`, at PART granularity wherever
  * the sidecars prove it:
  *
  *   - a part whose `tsMax < cutoff` AND with zero null-ts rows (the 10th
  *     sidecar field) drops WHOLE — no bytes read, exactly how a TTL
  *     merge drops an expired part;
  *   - a part whose `tsMin >= cutoff` survives WHOLE — untouched bytes,
  *     untouched name (its position in the manifest, and therefore the
  *     `dedup=latest` ingest-order tie-break, is preserved);
  *   - only STRADDLING parts (and parts without a provable sidecar) are
  *     rewritten, streaming their surviving rows into a `part-ret-*`
  *     part that takes the original's manifest position.
  *
  * NULL `ts_us` rows never expire (ClickHouse's TTL-on-NULL rule): a
  * whole-part drop therefore requires the null-count proof; sidecars
  * written before the count existed force a (lossless) rewrite instead.
  *
  * Publish protocol = StoreOptimize's MVCC-lite: adopt manifest → stage
  * rewrites as dot-files → publish canonical (invisible to manifest
  * readers) → one read-modify-rename FLIP per shard (drop expired names,
  * substitute rewritten names IN PLACE) → GC exactly the retired parts +
  * maintenance residue. Readers see the old snapshot or the new one,
  * never a mix; concurrent commits' registrations survive the flip; a
  * crashed run's `part-ret-*` residue is collected by the next
  * maintenance pass. Same single-maintenance-job-per-store discipline.
  */
object StoreRetention {

  /** One shard's outcome. `rowsExpired` counts rows removed by rewrites
    * only (whole-dropped parts are never read — their row counts come
    * from sidecars into `rowsDroppedWhole`).
    */
  case class ShardResult(shard: Int, droppedParts: Int, rewrittenParts: Int,
      keptParts: Int, rowsDroppedWhole: Long, rowsExpired: Long, rowsKept: Long)

  private case class RetTask(shard: Int, dir: String, parts: Seq[String],
      cutoff: Long, codec: String, granuleRows: Int,
      oldPartsLifetimeMs: Long = PartTrash.DefaultLifetimeMs)

  def expire(spark: SparkSession, path: String, cutoffTsUs: Long,
      codec: String = "zstd",
      granuleRows: Int = PartStreamWriter.DefaultGranuleRows,
      oldPartsLifetimeMs: Long = PartTrash.DefaultLifetimeMs): Seq[ShardResult] = {
    val root = new File(path)
    MaintenanceLock.withLock(root, "retention") {
      val shardDirs = Option(root.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        f.getName match {
          case ShardedSignalSource.ShardDir(k) if f.isDirectory => Some(k.toInt -> f)
          case _ => None
        }
      }.sortBy(_._1)

      val tasks = shardDirs.flatMap { case (k, dir) =>
        val parts = ShardedSignalSource.activeParts(dir)
        // skip shards that provably keep every part whole (a rows==0 part is
        // NOT a keep — the task runs so the empty part drops)
        val allKeep = parts.nonEmpty && parts.forall(p =>
          PartStats.read(p).exists(s => s.rows > 0 && s.tsMin.forall(_ >= cutoffTsUs)))
        if (parts.isEmpty || allKeep) None
        else Some(RetTask(k, dir.getAbsolutePath, parts.map(_.getName), cutoffTsUs, codec,
          granuleRows, oldPartsLifetimeMs))
      }
      if (tasks.isEmpty) return Seq.empty

      val results = spark.sparkContext
        .parallelize(tasks, tasks.size)
        .map(runTask)
        .collect().toSeq
      results.sortBy(_.shard)
    }
  }

  private sealed trait Disposition
  private case object KeepWhole extends Disposition
  private case object DropWhole extends Disposition
  private case object Rewrite extends Disposition

  private def classify(stats: Option[PartStats], cutoff: Long): Disposition = stats match {
    // rows == 0 FIRST (ADVICE r9): an empty part has tsMin = None, which the
    // KeepWhole guard's `forall` would vacuously accept — empty parts drop
    case Some(s) if s.rows == 0 => DropWhole
    case Some(s) if s.tsMin.forall(_ >= cutoff) => KeepWhole // all-null ts: never expires
    case Some(s) if s.tsMax.exists(_ < cutoff) && s.nullTsRows.contains(0L) => DropWhole
    case _ => Rewrite // straddling, or no (provable) sidecar
  }

  private def runTask(t: RetTask): ShardResult = {
    val dir = new File(t.dir)
    val manifest = new File(dir, "_parts")
    if (!manifest.isFile) StoreOptimize.atomicWrite(manifest,
      ShardedSignalSource.activeParts(dir).map(_.getName))

    var rowsDroppedWhole = 0L
    var rowsExpired = 0L
    var rowsKept = 0L
    var dropped = 0
    var rewritten = 0
    var kept = 0
    // old name -> None (drop) | Some(newName) (substitute in place)
    val replace = scala.collection.mutable.Map.empty[String, Option[String]]

    t.parts.foreach { name =>
      val part = new File(dir, name)
      classify(PartStats.read(part), t.cutoff) match {
        case KeepWhole => kept += 1
        case DropWhole =>
          rowsDroppedWhole += PartStats.read(part).map(_.rows).getOrElse(0L)
          replace(name) = None
          dropped += 1
        case Rewrite =>
          val newName = s"part-ret-${java.util.UUID.randomUUID().toString.take(12)}${StoreOptimize.ext(t.codec)}"
          val pw = PartStreamWriter.staged(dir, newName, t.codec, t.granuleRows)
          val reader = new ShardedPartitionReader(part.getAbsolutePath, t.shard,
            ShardedSignalSource.Schema, ShardRowPredicate.Trivial)
          try {
            while (reader.next()) {
              val r = reader.get()
              // survive = null ts (never expires) or ts >= cutoff
              if (r.isNullAt(2) || r.getLong(2) >= t.cutoff) pw.write(r)
              else rowsExpired += 1
            }
          } finally {
            pw.finishStaged()
            reader.close()
          }
          if (pw.rows == 0L) {
            pw.abandon() // nothing survived: the part just drops
            replace(name) = None
            dropped += 1
          } else {
            pw.publish() // canonical but unlisted — invisible until the flip
            // lineage: the rewrite's rows are a SUBSET of the original's, so
            // a stream that consumed the original may skip the rewrite
            StoreOptimize.writeLineage(dir, Seq(name), Seq(newName))
            rowsKept += pw.rows
            replace(name) = Some(newName)
            rewritten += 1
          }
      }
    }

    if (replace.nonEmpty) {
      // TOMBSTONES for whole-drops (r10 verdict "What's missing" #3): a
      // part retired WITHOUT a covering live part has no lineage proof a
      // tailing stream could compact against — record its name in the
      // shard's `_dropped` set so offsets shed it anyway. Written BEFORE
      // the flip: a stream must never observe the name gone from the
      // listing without the tombstone being visible.
      val wholeDrops = replace.collect { case (n, None) => n }.toSeq
      if (wholeDrops.nonEmpty) appendDropped(dir, wholeDrops)
      // FLIP: substitute in place / drop, preserving manifest (ingest)
      // order and any entries a concurrent commit registered meanwhile
      val current = WriterFiles.readManifest(dir).getOrElse(Seq.empty)
      val next = current.flatMap(n => replace.getOrElse(n, Some(n)))
      StoreOptimize.atomicWrite(manifest, next)
      // GC exactly the retired originals (+ maintenance residue)
      StoreOptimize.gcResidue(dir, retired = replace.keySet.toSet, t.oldPartsLifetimeMs)
    }

    ShardResult(t.shard, dropped, rewritten, kept, rowsDroppedWhole, rowsExpired, rowsKept)
  }

  /** Per-shard tombstone set (`_dropped`): names of parts TTL removed
    * whole, one `name\tdropMillis` line each, newest appended last (a
    * bare-name line is the pre-r12 format and reads as timestamp 0 — it
    * ages out on the next append). Eviction is by AGE, not count: a
    * tombstone is kept for [[DroppedTtlMs]] (far beyond any sane tail
    * lag), then shed. The [[MaxDropped]] cap no longer evicts — a
    * TTL-churn burst that overruns it keeps every still-young name and
    * LOGS the overrun instead, so a slow tail can never lose a tombstone
    * it still needs silently (an aged-out tombstone only means a
    * pathologically slow tail keeps that one name in its offset — the
    * pre-tombstone behavior, never corruption).
    */
  private[graft] val DroppedName = "_dropped"
  private[graft] val MaxDropped = 100000
  /** 7 days — an upper bound on how long a live tail may lag a TTL drop
    * before its offsets stop compacting that name.
    */
  private[graft] val DroppedTtlMs: Long = 7L * 24 * 3600 * 1000

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private[graft] def appendDropped(dir: File, names: Seq[String],
      now: Long = System.currentTimeMillis()): Unit = {
    val f = new File(dir, DroppedName)
    // newest stamp wins per name; then age out, oldest first
    val merged = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    readDroppedEntries(dir).foreach { case (n, ts) => merged.update(n, ts) }
    names.foreach(n => merged.update(n, now))
    val kept = merged.toSeq.filter { case (_, ts) => now - ts <= DroppedTtlMs }
    if (kept.size > MaxDropped)
      log.warn(s"$f holds ${kept.size} tombstones (> $MaxDropped): a TTL-churn " +
        "burst outran the cap; keeping every still-young name (age-based eviction only)")
    StoreOptimize.atomicWrite(f, kept.map { case (n, ts) => s"$n\t$ts" })
  }

  /** Tombstoned names (age already applied at write time). */
  private[graft] def readDropped(dir: File): Seq[String] =
    readDroppedEntries(dir).map(_._1)

  private[graft] def readDroppedEntries(dir: File): Seq[(String, Long)] = {
    val f = new File(dir, DroppedName)
    if (!f.isFile) return Seq.empty
    try {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().map(_.trim).filter(_.nonEmpty).map { line =>
        line.split('\t') match {
          case Array(n, ts) => (n, try ts.toLong catch { case _: NumberFormatException => 0L })
          case _ => (line, 0L) // pre-r12 bare-name line
        }
      }.toVector finally src.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}
