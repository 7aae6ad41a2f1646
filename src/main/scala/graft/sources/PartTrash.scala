package graft.sources

import java.io.File

/** Deferred deletion for retired parts — ClickHouse's `old_parts_lifetime`
  * (the server keeps a merged-away part on disk a grace period before the
  * physical unlink), applied to the store's maintenance GC (r10 verdict
  * "What's missing" #1).
  *
  * Why: a streaming tail checkpoints PART NAMES. A micro-batch that was
  * planned but not committed when the query died is REPLAYED from its
  * checkpointed offsets on restart — it re-plans the same part names. If
  * maintenance retired those parts in between and GC unlinked them, the
  * replay hits file-not-found and the tail is wedged (its WAL entry can
  * never complete). With deferral, retirement is a RENAME to a dot-hidden
  * trash name (`.trash-<retiredAtMillis>-<part>`): invisible to listings,
  * manifests and batch planning, but resolvable by name for exactly the
  * replay case; the bytes are unlinked only once the grace period — an
  * upper bound on any crash-to-replay gap — has passed.
  *
  * Trash files deliberately keep NO sidecars: a replay reads the part
  * whole (no granule selection, no stats pruning) — conservative and
  * correct, and the window is seconds.
  */
private[graft] object PartTrash {
  val Prefix = ".trash-"

  /** ClickHouse's old_parts_lifetime default is 480 s — the same bound. */
  val DefaultLifetimeMs: Long = 480L * 1000

  private val TrashName = raw"\.trash-(\d+)-(.+)".r

  def trashName(part: String, retiredAt: Long): String = s"$Prefix$retiredAt-$part"

  /** Retire `part` into the trash (rename only — NEVER a delete: a
    * streaming checkpoint may name this part, and an outright unlink
    * inside the grace period is exactly the wedge the trash exists to
    * prevent). A same-millisecond name collision (the same part name
    * retired twice, e.g. a replayed epoch re-published then re-retired)
    * bumps the timestamp: `resolve` picks the NEWEST generation, so the
    * stale one must never be the only survivor. If no rename lands after
    * generous retries the failure RAISES — the maintenance flip has
    * already hidden the part from the manifest, so the next GC pass will
    * retire it; losing the bytes silently is the one unacceptable
    * outcome.
    */
  def retire(part: File, now: Long = System.currentTimeMillis()): Unit = {
    var i = 0L
    while (i < 64) {
      val t = new File(part.getParentFile, trashName(part.getName, now + i))
      if (!t.exists() && part.renameTo(t)) return
      if (!part.exists()) return // a concurrent pass already retired it
      i += 1
    }
    throw new java.io.IOException(
      s"cannot retire $part into the trash after 64 rename attempts " +
        "(refusing to delete: a replaying tail may still need these bytes)")
  }

  /** Trash entries whose grace period has passed (the sweep's candidates,
    * without deleting) — lets maintenance planning trigger a GC pass on an
    * otherwise fully-compacted shard that would never sweep.
    */
  def expired(dir: File, lifetimeMs: Long,
      now: Long = System.currentTimeMillis()): Seq[File] =
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq.filter { f =>
      f.getName match {
        case TrashName(ts, _) => f.isFile && now - ts.toLong > lifetimeMs
        case _ => false
      }
    }

  /** Resolve a (possibly retired) part name: the canonical file when live,
    * else the newest trash generation, else None.
    */
  def resolve(dir: File, name: String): Option[File] = {
    val live = new File(dir, name)
    if (live.isFile) return Some(live)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .flatMap { f =>
        f.getName match {
          case TrashName(ts, n) if n == name && f.isFile => Some((ts.toLong, f))
          case _ => None
        }
      }
      .sortBy(-_._1).headOption.map(_._2)
  }

  /** Unlink trash entries whose grace period has passed. Returns the
    * number deleted.
    */
  def sweep(dir: File, lifetimeMs: Long, now: Long = System.currentTimeMillis()): Int = {
    var n = 0
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      f.getName match {
        case TrashName(ts, _) if f.isFile && now - ts.toLong > lifetimeMs =>
          if (f.delete()) n += 1
        case _ => ()
      }
    }
    n
  }
}
