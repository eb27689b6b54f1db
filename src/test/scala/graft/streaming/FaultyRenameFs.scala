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
    super.rename(src, dst)
  }
}

object FaultyRenameFs {
  val failNextPromote = new AtomicBoolean(false)
}
