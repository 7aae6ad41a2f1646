package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow

/** Streams full-schema store rows into ONE staged part file + its
  * minmax/bloom/name-set/null-count sidecar — the per-part imperative
  * unit the maintenance jobs share (StoreOptimize's merge output,
  * StoreRetention's rewrite output). The caller owns the ordering
  * contract (rows must arrive in the part's intended (token_id, ts_us)
  * order) and the publish protocol: the staged dot-files become plainly
  * visible only via `publish()`, and making them ACTIVE (the manifest
  * flip) stays the caller's step.
  */
private[graft] final class PartStreamWriter(dir: File, val partName: String, codec: String) {

  private val sidecarName = PartStats.sidecarName(partName)
  private val stagedPart = new File(dir, s".$partName.tmp")
  private val stagedSidecar = new File(dir, s".$sidecarName.tmp")

  private val raw =
    new java.io.BufferedOutputStream(new java.io.FileOutputStream(stagedPart), 1 << 16)
  private val out: java.io.OutputStream = codec match {
    case "gzip" => new java.util.zip.GZIPOutputStream(raw, 1 << 16)
    case "zstd" => new com.github.luben.zstd.ZstdOutputStream(raw)
    case "none" => raw
    case other => throw new IllegalArgumentException(
      s"graft-sharded part writer: unknown codec '$other' (none|gzip|zstd)")
  }

  private var nRows = 0L
  private var nullTs = 0L
  private var tokSeen = false; private var tokMin = 0L; private var tokMax = 0L
  private var tsSeen = false; private var tsMin = 0L; private var tsMax = 0L
  private var vSeen = false; private var vMin = 0.0; private var vMax = 0.0
  private val bloom = TokenBloom.empty()
  private var names = scala.collection.mutable.HashSet.empty[String]
  private var namesOverflow = false
  private val sb = new java.lang.StringBuilder(64)

  def rows: Long = nRows

  /** Append one row at the store's full 5-column schema
    * (shard, token_id, ts_us, name, v) — the schema both maintenance
    * readers produce.
    */
  def write(r: InternalRow): Unit = {
    sb.setLength(0)
    if (!r.isNullAt(1)) { // token_id
      val v = r.getLong(1); sb.append(v)
      if (!tokSeen) { tokSeen = true; tokMin = v; tokMax = v }
      else { if (v < tokMin) tokMin = v; if (v > tokMax) tokMax = v }
      TokenBloom.add(bloom, v)
    }
    sb.append(',')
    if (!r.isNullAt(2)) { // ts_us
      val v = r.getLong(2); sb.append(v)
      if (!tsSeen) { tsSeen = true; tsMin = v; tsMax = v }
      else { if (v < tsMin) tsMin = v; if (v > tsMax) tsMax = v }
    } else nullTs += 1
    sb.append(',')
    if (!r.isNullAt(3)) { // name: came from a part, already separator-free
      val n = r.getUTF8String(3).toString
      sb.append(n)
      if (!namesOverflow && names.add(n) && names.size > PartStats.MaxNameSet) {
        namesOverflow = true; names.clear()
      }
    }
    sb.append(',')
    if (!r.isNullAt(4)) { // v
      val v = r.getDouble(4); sb.append(java.lang.Double.toString(v))
      if (!vSeen) { vSeen = true; vMin = v; vMax = v }
      else {
        if (ShardRowPredicate.cmpD(v, vMin) < 0) vMin = v
        if (ShardRowPredicate.cmpD(v, vMax) > 0) vMax = v
      }
    }
    sb.append('\n')
    out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    nRows += 1
  }

  /** Close the stream and write the staged sidecar. Call exactly once,
    * before `publish()` or `abandon()`.
    */
  def finishStaged(): PartStats = {
    out.close()
    val stats = PartStats(nRows,
      if (tokSeen) Some(tokMin) else None, if (tokSeen) Some(tokMax) else None,
      if (tsSeen) Some(tsMin) else None, if (tsSeen) Some(tsMax) else None,
      if (vSeen) Some(vMin) else None, if (vSeen) Some(vMax) else None,
      if (tokSeen) Some(bloom) else None,
      if (namesOverflow) None else Some(names.toSet),
      Some(nullTs))
    PartStats.write(stagedSidecar, stats)
    stats
  }

  /** Staged → canonical names (plainly visible, still NOT in the manifest
    * — manifest readers can't see them until the caller's flip).
    */
  def publish(): Unit = {
    WriterFiles.moveReplace(stagedPart, new File(dir, partName))
    WriterFiles.moveReplace(stagedSidecar, new File(dir, sidecarName))
  }

  /** Discard the staged files (e.g. a rewrite that kept zero rows). */
  def abandon(): Unit = {
    stagedPart.delete()
    stagedSidecar.delete()
  }
}
