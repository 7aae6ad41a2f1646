package graft

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.MaintenanceLock

/** The maintenance lock's liveness/ownership contract (r10 verdict
  * What's-wrong #3 + ADVICE): a LIVE long-running job heartbeats its lock
  * past any stale TTL; an evicted holder never deletes the new holder's
  * lock; stale-break is atomic under a race.
  */
class MaintenanceLockSpec extends AnyFunSuite {

  private def tmp(): File = Files.createTempDirectory("graft-lock").toFile
  private def lockOf(root: File) = new File(root, MaintenanceLock.LockName)

  test("a live job's heartbeat keeps its lock past the stale TTL") {
    val root = tmp()
    val t = new Thread(() =>
      MaintenanceLock.withLock(root, "slow", staleMs = 400, heartbeatMs = 50) {
        Thread.sleep(1500) // runs 3.75x the TTL
      })
    t.start()
    Thread.sleep(900) // well past staleMs: without heartbeats this is stale
    // a second job must NOT break the live holder's lock
    val ex = intercept[IllegalStateException] {
      MaintenanceLock.withLock(root, "intruder", staleMs = 400) { fail("must not run") }
    }
    assert(ex.getMessage.contains("another maintenance job"))
    assert(lockOf(root).isFile, "live lock must survive the refused intruder")
    t.join()
    assert(!lockOf(root).isFile, "released after the slow job completes")
  }

  test("an evicted holder does not delete the new holder's lock and reports the overlap") {
    val root = tmp()
    @volatile var evictedEx: Throwable = null
    val slow = new Thread(() =>
      try MaintenanceLock.withLock(root, "evictee", staleMs = 200, heartbeatMs = 60_000) {
        Thread.sleep(1200) // no heartbeat (60s period): goes stale mid-run
      } catch { case e: Throwable => evictedEx = e })
    slow.start()
    Thread.sleep(500) // evictee's lock is now stale (no heartbeat for >200ms)
    // the usurper breaks the stale lock and holds it while evictee finishes
    MaintenanceLock.withLock(root, "usurper", staleMs = 200, heartbeatMs = 50) {
      slow.join() // evictee completes (and releases) INSIDE the usurper's hold
      assert(lockOf(root).isFile, "evictee must not delete the usurper's lock")
      val content = Files.readString(lockOf(root).toPath)
      assert(content.contains("usurper"), s"lock must still be the usurper's: $content")
    }
    assert(evictedEx != null && evictedEx.isInstanceOf[IllegalStateException],
      s"the evicted holder must surface the overlap, got $evictedEx")
    assert(evictedEx.getMessage.contains("broken and re-taken"))
    assert(!lockOf(root).isFile, "usurper's ownership-checked release succeeds")
  }

  test("stale-break is atomic: N racing breakers admit exactly one holder at a time") {
    // STRESSED over rounds: the 2-holder hole this caught (a breaker
    // whose staleness was measured against the OLD file winning its
    // claim inside a fresh holder's create-then-write window) is a
    // microsecond-wide interleaving — one race seldom lands in it, many
    // races under thread churn do.
    val maxInside = new AtomicInteger(0)
    for (round <- 0 until 20) {
      val root = tmp()
      root.mkdirs()
      // a crashed job's stale lock
      Files.writeString(lockOf(root).toPath, "dead-nonce crashed 0\n")
      assert(lockOf(root).setLastModified(System.currentTimeMillis() - 10_000))
      val inside = new AtomicInteger(0)
      val won = new AtomicInteger(0)
      val threads = (0 until 8).map { i =>
        new Thread(() =>
          try MaintenanceLock.withLock(root, s"racer$i", staleMs = 1000, heartbeatMs = 100) {
            val n = inside.incrementAndGet()
            maxInside.updateAndGet(m => math.max(m, n))
            Thread.sleep(5)
            inside.decrementAndGet()
            won.incrementAndGet()
          } catch { case _: IllegalStateException => () }) // lost the race: refused
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(won.get() >= 1, s"round $round: the stale lock must be broken, not wedge the store")
    }
    assert(maxInside.get() === 1,
      s"mutual exclusion violated: ${maxInside.get()} jobs held the lock at once")
  }
}
