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
    if (FaultFs.failRenameDst.contains(dst.toUri.getPath))
      throw new java.io.IOException(
        s"[faultfs] injected rename failure: $src -> $dst")
    super.rename(src, dst)
  }
}

object FaultFs {
  /** Absolute path (no scheme) whose rename-to should fail; None = off. */
  @volatile var failRenameDst: Option[String] = None
}
