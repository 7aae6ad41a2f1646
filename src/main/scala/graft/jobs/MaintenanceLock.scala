package graft.jobs

import java.io.File

/** Store-level mutual exclusion for the maintenance jobs (`StoreOptimize`,
  * `StoreRetention`): both stage `part-opt-*`/`part-ret-*` dot-tmps and
  * sweep each other's class of residue, so "one maintenance job per store
  * at a time" was a documented discipline (r9 verdict "What's wrong" #3) —
  * this makes it ENFORCED: `_maintenance.lock` at the store root, taken
  * with an atomic create-exclusive, released on completion. A second job
  * fails fast with a clear message instead of corrupting via the residue
  * sweep. Ingest (batch/streaming commits) stays lock-free — writers and
  * maintenance interleave by design.
  *
  * Crash-safety: a crashed job leaves the lock behind; a lock older than
  * `staleMs` (default 1 h — maintenance holds it for minutes) is broken
  * and re-taken, so the store never wedges permanently.
  */
private[graft] object MaintenanceLock {
  val LockName = "_maintenance.lock"
  val DefaultStaleMs: Long = 60L * 60 * 1000

  def withLock[A](root: File, job: String, staleMs: Long = DefaultStaleMs)(body: => A): A = {
    val lock = new File(root, LockName)
    root.mkdirs()
    acquire(lock, job, staleMs, retried = false)
    try body
    finally lock.delete()
  }

  private def acquire(lock: File, job: String, staleMs: Long, retried: Boolean): Unit = {
    try {
      java.nio.file.Files.createFile(lock.toPath) // atomic create-exclusive
      val w = new java.io.FileOutputStream(lock)
      try w.write(s"$job ${System.currentTimeMillis()}\n".getBytes("UTF-8"))
      finally w.close()
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val age = System.currentTimeMillis() - lock.lastModified()
        if (!retried && age > staleMs) {
          lock.delete() // stale: the holder crashed; break it once and retry
          acquire(lock, job, staleMs, retried = true)
        } else throw new IllegalStateException(
          s"another maintenance job holds ${lock.getAbsolutePath} " +
            s"(age ${age / 1000}s): one OPTIMIZE/TTL job per store at a time")
    }
  }
}
