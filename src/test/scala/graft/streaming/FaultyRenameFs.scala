package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Local filesystem with a fault-injection seam on `rename`: when armed,
  * the next rename whose SOURCE is a `.staging` directory reports failure
  * (returning false, exactly how Hadoop surfaces rename failures) and
  * disarms. That is the promote step of EventStreamPipeline.mergeSnapshot's
  * two-rename swap, so arming the fault crashes a real streaming batch in
  * the exact window the recovery path exists for: target already retired
  * to `.old`, fully-written `.staging` (with `_SUCCESS`) not yet promoted.
  *
  * Registered under the `faulty:` scheme via
  * `conf.setClass("fs.faulty.impl", ...)`; Hadoop instantiates it
  * reflectively, so the fault switch is a static flag.
  */
class FaultyRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: java.net.URI = java.net.URI.create("faulty:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (FaultyRenameFs.failNextPromote.get() &&
        src.toString.endsWith(".staging")) {
      FaultyRenameFs.failNextPromote.set(false)
      return false
    }
    val suffix = FaultyRenameFs.failNextRenameSuffix.get()
    if (suffix != null && src.toString.endsWith(suffix)) {
      FaultyRenameFs.failNextRenameSuffix.set(null)
      return false
    }
    val frag = FaultyRenameFs.failNextRenameSrcContains.get()
    if (frag != null && src.toString.contains(frag)) {
      FaultyRenameFs.failNextRenameSrcContains.set(null)
      return false
    }
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val suffix = FaultyRenameFs.failNextDeleteSuffix.get()
    if (suffix != null && p.toString.endsWith(suffix)) {
      FaultyRenameFs.failNextDeleteSuffix.set(null)
      throw new java.io.IOException(s"injected delete failure: $p")
    }
    super.delete(p, recursive)
  }
}

object FaultyRenameFs {
  val failNextPromote = new AtomicBoolean(false)
  /** When set, the next delete of a path ending with this suffix throws
    * and disarms — crashes CorpusPipeline.compact inside its post-swap
    * cleanup (e.g. suffix "delta_manifest" fails the FIRST cleanup
    * delete, leaving new base + .old markers + full delta remnants).
    */
  val failNextDeleteSuffix =
    new java.util.concurrent.atomic.AtomicReference[String](null)
  /** When set, the next rename whose SOURCE ends with this suffix
    * reports failure (false) and disarms.
    */
  val failNextRenameSuffix =
    new java.util.concurrent.atomic.AtomicReference[String](null)

  /** When set, the next rename whose SOURCE CONTAINS this fragment
    * reports failure (false) and disarms — crashes
    * VersionedTable.tryPublish at its commit point (the nonce-suffixed
    * `.tmp-v<k>-<nonce>` → `v<k>` publish rename; the nonce is why a
    * suffix match cannot target it).
    */
  val failNextRenameSrcContains =
    new java.util.concurrent.atomic.AtomicReference[String](null)
}
