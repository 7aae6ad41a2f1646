package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` filesystem whose permission calls stay IN-PROCESS.
  *
  * Without libhadoop (this environment ships none — hadoop-client-api only),
  * `RawLocalFileSystem.setPermission` falls back to
  * `Shell.execCommand("chmod", ...)`: one fork+exec PER created file or
  * directory. A single partitioned parquet append (8 token buckets × 30
  * days = 240 dynamic partitions) forks ~750 processes; JFR on
  * q215_live_sync_e2e counted 1,557 `chmod` launches in two runs — pure
  * latency that a real deployment (HDFS/S3, or any host with the native
  * lib) never pays. This subclass routes the same permission change through
  * `java.nio.file.Files.setPosixFilePermissions` — one syscall, no fork —
  * with semantics identical to `chmod <octal>` for the 9 rwx bits (the only
  * bits Hadoop's local committer ever sets; sticky/setuid never appear on
  * these paths and would fall back to the parent implementation).
  *
  * Wired as `spark.hadoop.fs.file.impl` in the session builders. It changes
  * HOW a permission is applied, never WHICH permission, so no behavior, no
  * written byte, and no query result changes.
  */
final class NioRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    if ((bits & ~0x1ff) != 0) {
      // sticky/setuid/setgid: NIO posix permissions cannot express them —
      // delegate to the stock (shell-based) path for exactness
      super.setPermission(p, permission)
      return
    }
    val set = EnumSet.noneOf(classOf[PosixFilePermission])
    val order = Array(
      PosixFilePermission.OTHERS_EXECUTE, PosixFilePermission.OTHERS_WRITE,
      PosixFilePermission.OTHERS_READ,
      PosixFilePermission.GROUP_EXECUTE, PosixFilePermission.GROUP_WRITE,
      PosixFilePermission.GROUP_READ,
      PosixFilePermission.OWNER_EXECUTE, PosixFilePermission.OWNER_WRITE,
      PosixFilePermission.OWNER_READ)
    var i = 0
    while (i < 9) {
      if ((bits & (1 << i)) != 0) set.add(order(i))
      i += 1
    }
    try java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    catch {
      case _: UnsupportedOperationException => super.setPermission(p, permission)
      case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(e.getFile)
    }
    ()
  }

  /** The stock implementation forks `readlink` PER CALL to decide whether
    * the path is a symlink (Structured Streaming's FileContext rename path
    * calls this once per checkpoint commit). `Files.isSymbolicLink` answers
    * the same question in-process; non-links — the only thing Spark's
    * committers and checkpoint managers ever hand this method — then take
    * the ordinary `getFileStatus` path, which is what the parent returns
    * for them anyway. Real symlinks still go through the parent for exact
    * target semantics.
    */
  override def getFileLinkStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    if (java.nio.file.Files.isSymbolicLink(pathToFile(f).toPath)) super.getFileLinkStatus(f)
    else getFileStatus(f)
}

/** The checksummed `file://` filesystem over [[NioRawLocalFileSystem]] —
  * drop-in for `org.apache.hadoop.fs.LocalFileSystem` via
  * `spark.hadoop.fs.file.impl`.
  */
final class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** The `FileContext` (AbstractFileSystem) twin, for
  * `spark.hadoop.fs.AbstractFileSystem.file.impl` — this is the route
  * Structured Streaming's checkpoint manager takes. The stock `LocalFs`
  * additionally forks `readlink` per `getFileLinkStatus` (112 forks in two
  * q217 runs); checkpoint paths hold no symlinks, so the
  * `DelegateToFileSystem` default (link status = file status) is both
  * correct here and fork-free.
  */
final class NioLocalFs(uri: java.net.URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new NioRawLocalFileSystem, conf, "file", false)
