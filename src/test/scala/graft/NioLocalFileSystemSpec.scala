package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The fork-free local FS (r18 optimization): permission semantics must be
  * byte-identical to the stock shell-based path — only the MECHANISM
  * (in-process NIO syscall vs fork+exec `chmod`/`readlink`) changes.
  */
class NioLocalFileSystemSpec extends AnyFunSuite {

  private def conf(): Configuration = {
    val c = new Configuration()
    c.set("fs.file.impl", classOf[graft.sources.NioLocalFileSystem].getName)
    c.set("fs.AbstractFileSystem.file.impl", classOf[graft.sources.NioLocalFs].getName)
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  test("fs.file.impl resolves to the NIO local filesystem") {
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf())
    assert(fs.getClass === classOf[graft.sources.NioLocalFileSystem])
  }

  test("setPermission applies exactly the chmod bits, in-process") {
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf())
    val dir = Files.createTempDirectory("graft-niofs")
    val f = dir.resolve("x.txt")
    Files.writeString(f, "x")
    for (octal <- Seq("644", "600", "755", "750", "444")) {
      fs.setPermission(new Path(f.toString), new FsPermission(Integer.parseInt(octal, 8).toShort))
      val got = PosixFilePermissions.toString(Files.getPosixFilePermissions(f))
      val expect = octal.map(_.asDigit).map {
        d => s"${if ((d & 4) != 0) "r" else "-"}${if ((d & 2) != 0) "w" else "-"}${if ((d & 1) != 0) "x" else "-"}"
      }.mkString
      assert(got === expect, s"mode $octal")
    }
    fs.setPermission(new Path(f.toString), new FsPermission(Integer.parseInt("644", 8).toShort))
    Files.deleteIfExists(f); Files.deleteIfExists(dir)
  }

  test("setPermission on a missing path raises FileNotFoundException like the stock FS") {
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf())
    intercept[java.io.FileNotFoundException] {
      fs.setPermission(new Path("/tmp/graft-niofs-definitely-missing-7741"),
        new FsPermission(Integer.parseInt("644", 8).toShort))
    }
  }

  test("getFileLinkStatus: regular file == getFileStatus; symlink still detected") {
    val fs = FileSystem.get(java.net.URI.create("file:///"), conf())
    val dir = Files.createTempDirectory("graft-niofs-link")
    val tgt = dir.resolve("target.txt")
    Files.writeString(tgt, "t")
    val regular = fs.getFileLinkStatus(new Path(tgt.toString))
    assert(!regular.isSymlink)
    assert(regular.getLen === fs.getFileStatus(new Path(tgt.toString)).getLen)
    val link = dir.resolve("ln.txt")
    Files.createSymbolicLink(link, tgt)
    val ls = fs.getFileLinkStatus(new Path(link.toString))
    assert(ls.isSymlink, "a real symlink must still be reported as one")
    Files.deleteIfExists(link); Files.deleteIfExists(tgt); Files.deleteIfExists(dir)
  }

  test("FileContext route (streaming checkpoints) resolves the fork-free FS and renames atomically") {
    val fc = FileContext.getFileContext(java.net.URI.create("file:///"), conf())
    val dir = Files.createTempDirectory("graft-niofs-fc")
    val src = new Path(dir.resolve("a").toString)
    val out = fc.create(src, java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write("checkpoint".getBytes("UTF-8")); out.close()
    val dst = new Path(dir.resolve("b").toString)
    fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    assert(fc.util().exists(dst) && !fc.util().exists(src))
    assert(Files.readString(Paths.get(dir.resolve("b").toString)) === "checkpoint")
    fc.delete(new Path(dir.toString), true)
  }
}
