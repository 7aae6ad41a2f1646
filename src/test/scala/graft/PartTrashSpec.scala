package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartTrash

/** Deferred part deletion (`old_parts_lifetime`): retire = rename into the
  * dot-hidden trash, resolvable by original name, unlinked only after the
  * grace period.
  */
class PartTrashSpec extends AnyFunSuite {

  private def tmp(): File = Files.createTempDirectory("graft-trash").toFile

  test("retire renames into the trash; resolve finds live first, then newest trash") {
    val d = tmp()
    val p = new File(d, "part-x.csv")
    Files.writeString(p.toPath, "1,1,a,1\n")
    PartTrash.retire(p, now = 1000L)
    assert(!p.isFile, "the canonical name must not survive retirement")
    val t = new File(d, ".trash-1000-part-x.csv")
    assert(t.isFile && Files.readString(t.toPath) == "1,1,a,1\n")
    assert(PartTrash.resolve(d, "part-x.csv").contains(t))

    // a re-published live part wins over the trash generation
    Files.writeString(p.toPath, "2,2,b,2\n")
    assert(PartTrash.resolve(d, "part-x.csv").contains(p))
    // two trash generations: newest wins
    PartTrash.retire(p, now = 2000L)
    assert(PartTrash.resolve(d, "part-x.csv")
      .exists(_.getName == ".trash-2000-part-x.csv"))
    assert(PartTrash.resolve(d, "part-y.csv").isEmpty)
  }

  test("retire NEVER deletes: exhausted rename attempts raise with the part intact") {
    val d = tmp()
    val p = new File(d, "part-x.csv")
    Files.writeString(p.toPath, "1,1,a,1\n")
    // occupy every candidate trash name the retry loop may try
    (0L until 64L).foreach { i =>
      Files.writeString(new File(d, s".trash-${1000 + i}-part-x.csv").toPath, "old")
    }
    val e = intercept[java.io.IOException](PartTrash.retire(p, now = 1000L))
    assert(e.getMessage.contains("refusing to delete"))
    assert(p.isFile && Files.readString(p.toPath) == "1,1,a,1\n",
      "the bytes a replaying tail may need must survive the failure")
  }

  test("expired lists sweep candidates without deleting") {
    val d = tmp()
    Files.writeString(new File(d, ".trash-1000-a.csv").toPath, "x")
    Files.writeString(new File(d, ".trash-5000-b.csv").toPath, "y")
    val got = PartTrash.expired(d, lifetimeMs = 2000, now = 6000L)
    assert(got.map(_.getName) === Seq(".trash-1000-a.csv"))
    assert(new File(d, ".trash-1000-a.csv").isFile, "expired() must not delete")
  }

  test("sweep unlinks only entries past the grace period") {
    val d = tmp()
    Files.writeString(new File(d, ".trash-1000-a.csv").toPath, "x")
    Files.writeString(new File(d, ".trash-5000-b.csv").toPath, "y")
    Files.writeString(new File(d, "part-live.csv").toPath, "z")
    assert(PartTrash.sweep(d, lifetimeMs = 2000, now = 6000L) === 1)
    assert(!new File(d, ".trash-1000-a.csv").isFile, "expired entry unlinked")
    assert(new File(d, ".trash-5000-b.csv").isFile, "entry inside the grace period kept")
    assert(new File(d, "part-live.csv").isFile, "live parts are never the sweep's business")
  }
}
