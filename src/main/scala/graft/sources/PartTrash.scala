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

  /** Retire `part` into the trash (rename; falls back to delete if no
    * rename lands — the canonical name must never survive retirement).
    * A same-millisecond name collision (the same part name retired twice,
    * e.g. a replayed epoch re-published then re-retired) bumps the
    * timestamp instead of falling through to delete: `resolve` picks the
    * NEWEST generation, so the stale one must never be the only survivor.
    */
  def retire(part: File, now: Long = System.currentTimeMillis()): Unit = {
    var i = 0L
    while (i < 4) {
      val t = new File(part.getParentFile, trashName(part.getName, now + i))
      if (!t.exists() && part.renameTo(t)) return
      i += 1
    }
    part.delete()
    ()
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
