package graft

import java.net.URI
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Fault-injecting local filesystem for crash-protocol tests: a
  * `faultfs:/…` path behaves exactly like the local FS until a test
  * arms `FaultFs.failRenameDst`, after which any rename whose
  * DESTINATION resolves to that path throws — the moment a process
  * dies between temp-swap's delete-old and rename-temp, injected at
  * the exact syscall instead of simulated by hand-built directory
  * states. Registered per test via
  * `hadoopConfiguration.set("fs.faultfs.impl", classOf[FaultFs].getName)`;
  * `RawLocalFileSystem` (not `LocalFileSystem`) so no `.crc` sidecars
  * muddy part-file assertions. */
class FaultFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("faultfs:///")

  override def rename(src: Path, dst: Path): Boolean = {
    FaultFs.onRenameTo match {
      case Some((sub, cb)) if dst.toUri.getPath.contains(sub) =>
        FaultFs.onRenameTo = None // one-shot BEFORE the callback: a
        cb()                      // callback that renames must not refire
      case _ => ()
    }
    if (FaultFs.failRenameDst.contains(dst.toUri.getPath))
      throw new java.io.IOException(
        s"[faultfs] injected rename failure: $src -> $dst")
    if (FaultFs.falseRenameDst.contains(dst.toUri.getPath))
      return false
    super.rename(src, dst)
  }
}

object FaultFs {
  /** Absolute path (no scheme) whose rename-to should fail; None = off. */
  @volatile var failRenameDst: Option[String] = None
  /** Absolute path whose rename-to returns FALSE without renaming —
    * the OTHER Hadoop failure mode (HDFS convention), distinct from
    * throwing: an unchecked caller would sail on believing the rename
    * happened. None = off. */
  @volatile var falseRenameDst: Option[String] = None
  /** One-shot callback fired before the first rename whose destination
    * path CONTAINS the substring — lets a test mutate the world at an
    * exact protocol point (e.g. append to a sink while its compaction
    * is mid-rewrite). Cleared on fire. */
  @volatile var onRenameTo: Option[(String, () => Unit)] = None
}
