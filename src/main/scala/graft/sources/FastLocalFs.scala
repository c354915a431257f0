package graft.sources

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}

/** `file://` filesystem tuned for the driver/executor hot path (r19,
  * guide §5/§6 "the cheapest job is no job" applied to the I/O plane).
  *
  * Without libhadoop, Hadoop's RawLocalFileSystem enforces the default
  * 644/755 creation permissions by FORKING a `chmod` process per file
  * and per directory (Shell.execCommand fallback) — ~8 ms of process
  * spawn for a permission the file already has from the process umask.
  * A snapshot commit creates a dozen small control files (manifest,
  * journal, witness, lock, marker) and every staged parquet write adds
  * a data file + a `.crc` sidecar per task, so the bench's write gates
  * spent whole seconds fork-waiting (JobProbe's gap sampler: the top
  * driver-gap frame was java.lang.ProcessImpl.start).
  *
  *   - [[NoForkRawLocalFs]] routes creates/mkdirs through the
  *     permissionless variants and no-ops setPermission: same bytes,
  *     same umask-derived modes, zero forks. Explicit permission
  *     changes are silently skipped — acceptable for an engine that
  *     never calls setPermission itself (single-user local data).
  *   - write checksums are disabled: the `.crc` sidecar doubles the
  *     file count (and fork count) of every local write, and local
  *     disks already CRC at the device layer; read-side verification
  *     still applies to files that carry checksums.
  *
  * Wired per session via `spark.hadoop.fs.file.impl` — inert on any
  * cluster whose data plane is hdfs:// or s3a:// (those schemes keep
  * their own filesystems), so there is no scale-dependent constant
  * here; a deployment that wants strict posix permission enforcement
  * simply omits the conf.
  */
class FastLocalFs extends LocalFileSystem(new NoForkRawLocalFs) {
  override def initialize(uri: java.net.URI,
                          conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
  }
}

class NoForkRawLocalFs extends RawLocalFileSystem {
  // the three fork sites: explicit chmod, permissioned file create,
  // permissioned mkdir — a null permission takes the fork-free branch
  // (plain FileOutputStream / File.mkdir) inside the super impl
  override def setPermission(p: Path, permission: FsPermission): Unit = ()
  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean,
      permission: FsPermission): java.io.OutputStream =
    super.createOutputStreamWithMode(f, append, null)
  override protected def mkOneDirWithMode(p: Path, p2f: java.io.File,
                                          permission: FsPermission): Boolean =
    super.mkOneDirWithMode(p, p2f, null)
}
