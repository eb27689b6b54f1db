package graft.streaming

import graft.pipeline.{Layout, SnapshotDir, WriterLease}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest into a [[Layout]] guarded z-order table —
  * the real-sink form of the composition `LayoutLiveWriterSpec` proves
  * with thread appenders: micro-batches land as small files, periodic
  * guarded compaction folds them into the clustered layout, serving
  * readers poll throughout.
  *
  * The one problem a streaming sink adds over a thread appender is
  * REPLAY: a crash between the batch's append and the checkpoint commit
  * re-delivers the batch, and a plain mode-append would duplicate its
  * rows. Same discipline as [[StreamingVectorIngest]]: each batch writes
  * a DETERMINISTIC `b<batchId>` subdirectory with mode=overwrite, so a
  * replayed batch rewrites identical content instead of appending a
  * second copy — idempotence owned by the checkpoint's batch numbering.
  * Batch dirs are deliberately NOT `key=value` named: partition
  * discovery would splice a `batch` column into the schema and then
  * refuse the mixed flat-files-plus-dirs layout compaction creates;
  * instead every reader of the table ([[Layout.servingRead]],
  * [[Layout.compactZorder]]) lists the data dir EXPLICITLY via
  * [[Layout.completeDataPaths]]: top-level part files plus the batch
  * subdirectories that carry their `_SUCCESS` marker. A blind
  * `recursiveFileLookup` would be the hazard here — it cannot tell a
  * complete batch dir from a TORN one (a mid-job-commit crash leaves
  * part files without the marker), and serving or folding the torn
  * subset makes it permanent when the checkpoint replays the full
  * batch next to it.
  *
  * Compaction contract: fold through [[compactCommitted]], which gates
  * on the CHECKPOINT'S COMMIT FRONTIER — compaction flattens batch dirs
  * away, so folding a batch the checkpoint has not committed would let
  * a later replay re-create its dir next to the already-folded copy
  * (every row served twice). The lease serializes the writes but cannot
  * know the frontier; "the stream looks quiesced" cannot either — a run
  * that CRASHED after an append but before its commit is quiesced with
  * an uncommitted batch on disk, which is precisely the replay case.
  * compactCommitted folds flat files plus committed complete `b<id>`
  * dirs only, and carries uncommitted/torn dirs through the snapshot
  * swap untouched, so it is safe to run at ANY time the lease admits
  * it. ([[graft.pipeline.Layout.compactZorderGuarded]] folds every
  * complete dir regardless — correct for non-streaming tables and for
  * provably-committed quiescence, wrong under a restartable stream.)
  */
object StreamingZorderIngest {

  /** Drain `stream` into the guarded table at `root` with
    * `Trigger.AvailableNow` (process everything available, then stop).
    * `afterBatch` is a fault-injection seam: the spec throws from it
    * AFTER the append and BEFORE the checkpoint commit to force a
    * replay of a fully-written batch.
    */
  def ingestAvailable(stream: DataFrame, root: String, checkpointDir: String,
      afterBatch: Long => Unit = _ => ()): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        if (!batch.isEmpty) {
          appendBatch(batch, root, batchId)
          afterBatch(batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Compact the table's COMMITTED prefix behind the writer lease: fold
    * the flat part files and every `b<id>` dir that is both complete
    * (`_SUCCESS`) and committed (`id <=` the checkpoint's commit
    * frontier) into a fresh z-ordered snapshot; uncommitted or torn
    * batch dirs are carried through the swap by a CHECKED move into the
    * staged snapshot. A crash between those moves and the swap strands
    * the moved dirs in `.staging` — and because the checkpoint commit is
    * written outside this lease, such a dir may have become committed
    * (never-to-be-replayed) by the time anyone looks again, so the next
    * run's [[rescueStranded]] moves them back into the data dir BEFORE
    * the fold's overwrite of staging could delete them. No-op when
    * nothing committed exists to fold.
    */
  def compactCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String, checkpointDir: String, colA: String, colB: String,
      nFiles: Int): Unit = {
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    WriterLease.withLease(fs, root, "zorderCompactCommitted") {
      val snap = new SnapshotDir(spark, dataDir)
      snap.recover()
      if (snap.targetExists) {
        // rescue FIRST: a previous compaction that crashed between its
        // pending-dir moves and swapIn stranded those batch dirs inside
        // `.staging`, and the zorderWrite below (mode=overwrite) would
        // delete them. "The replay rewrites the batch" does NOT cover
        // them — the checkpoint commit is written outside this lease, so
        // a batch that committed between the frontier read and the crash
        // is never replayed; its only copy is the stranded one.
        rescueStranded(fs, dataDir, snap.stagingPath)
        val frontier = lastCommittedBatch(fs, checkpointDir)
        val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
          .toSeq.filterNot { st =>
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
        val (files, dirs) = entries.partition(_.isFile)
        // b<id> dirs are governed by the CHECKPOINT: fold only at or
        // below the commit frontier (above it they are replayable and
        // must ride through the swap, torn or complete). a<nonce> dirs
        // (Layout.appendGuarded's batches — 'a' + 32 hex chars, matched
        // EXACTLY so a foreign subdirectory is carried through the
        // swap, never deleted) are governed by the LEASE we hold:
        // complete ones are final — nothing can replay them, fold them
        // now; torn ones are crashed appends whose caller never got an
        // ack — drop them (they can never be in-progress here: appends
        // take this same lease, and the append writes its own marker
        // even under a marker-less committer config).
        def complete(st: org.apache.hadoop.fs.FileStatus): Boolean =
          fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
        def isAppendDir(name: String): Boolean =
          name.length == 33 && name.head == 'a' &&
            name.tail.forall(c => c.isDigit || (c >= 'a' && c <= 'f'))
        val (batchDirs, rest) =
          dirs.partition(st => batchId(st.getPath.getName).nonEmpty)
        val (appendDirs, foreign) =
          rest.partition(st => isAppendDir(st.getPath.getName))
        val (foldB, pendingB) = batchDirs.partition { st =>
          batchId(st.getPath.getName).exists(_ <= frontier) && complete(st)
        }
        val (foldA, deadAppends) = appendDirs.partition(complete)
        // foreign dirs: not ours to reason about — carry them, complete
        // or not, exactly as the pre-a<nonce> code carried everything
        val pending = pendingB ++ foreign
        deadAppends.foreach { st =>
          if (!fs.delete(st.getPath, true)) throw new java.io.IOException(
            s"compactCommitted: could not drop crashed append ${st.getPath}")
        }
        val foldPaths = (files ++ foldB ++ foldA).map(_.getPath.toString)
        if (foldPaths.nonEmpty) {
          Layout.zorderWrite(spark.read.parquet(foldPaths: _*), colA, colB,
            snap.stagingPath, nFiles)
          // footprint manifest rides the swap with the snapshot it
          // describes; later batch dirs are simply absent from it
          // (servingReadBox always keeps unmanifested paths)
          Layout.writeFootprintManifest(spark, snap.stagingPath, colA, colB)
          // carry non-foldable batches through the swap. Each move is
          // CHECKED: an unchecked rename returning false would leave the
          // dir in the old target, and swapIn's retire-then-delete would
          // destroy it — throwing here aborts before the swap, and the
          // rescue above recovers the already-moved dirs on the next run.
          pending.foreach { st =>
            renameOrThrow(fs, st.getPath, new org.apache.hadoop.fs.Path(
              snap.stagingPath, st.getPath.getName))
          }
          snap.swapIn()
          ()
        }
      }
    }
  }

  private def batchId(name: String): Option[Long] =
    if (name.startsWith("b") && name.drop(1).nonEmpty &&
      name.drop(1).forall(_.isDigit)) Some(name.drop(1).toLong)
    else None

  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(
        s"compactCommitted: rename $from -> $to failed")

  /** Move EVERY subdirectory stranded in a leftover `.staging` back into
    * the data dir, before the next fold's overwrite deletes them. Only
    * runs when the TARGET exists — a crash inside swapIn leaves no target
    * and [[SnapshotDir.recover]] promotes the whole staging dir (batch
    * dirs included), so the stranded-next-to-a-live-target window is the
    * one this covers. `b<id>` dirs get the replay-aware treatment: when
    * the data dir already holds a copy of the same batch (the
    * crash-then-replay case — deterministic overwrite makes the contents
    * identical), keep whichever copy is complete. FOREIGN dirs (anything
    * the fold moved as pending — the compaction carries them, complete or
    * not) have no replay and no `_SUCCESS` contract we may reason about:
    * the stranded copy may be the ONLY copy, so it is always moved back,
    * and a name collision with something that reappeared in the data dir
    * is an operator-visible error, never a silent delete — the
    * carried-through-the-swap contract means this code NEVER deletes a
    * dir it does not own.
    */
  private def rescueStranded(fs: org.apache.hadoop.fs.FileSystem,
      dataDir: String, stagingPath: String): Unit = {
    val staging = new org.apache.hadoop.fs.Path(stagingPath)
    if (fs.exists(staging)) {
      fs.listStatus(staging).toSeq
        // the same visibility filter as the fold's own listing: _/. names
        // are job internals (a crashed zorderWrite's `_temporary`) or
        // markers, never carried data — everything else the fold could
        // have moved as pending is rescued
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(dataDir, st.getPath.getName)
          def complete(p: org.apache.hadoop.fs.Path): Boolean =
            fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
          if (!fs.exists(dest)) renameOrThrow(fs, st.getPath, dest)
          else if (batchId(st.getPath.getName).isEmpty) {
            // foreign dir AND a same-named dir back in the data dir:
            // unreachable by this pipeline's own moves (the pending
            // rename removed it from the data dir), so something
            // external recreated it. Neither copy is ours to discard.
            throw new java.io.IOException(
              s"compactCommitted: foreign dir ${st.getPath.getName} is " +
                s"stranded in staging AND present in $dataDir — refusing " +
                "to guess which copy wins; resolve manually")
          } else if (complete(st.getPath) && !complete(dest)) {
            // a torn replay landed next to the complete stranded copy:
            // promote the complete one (correct even if no further
            // replay ever runs)
            if (!fs.delete(dest, true)) throw new java.io.IOException(
              s"compactCommitted: could not clear torn $dest")
            renameOrThrow(fs, st.getPath, dest)
          } else {
            // dest is complete (the replay already rewrote it) or both
            // copies are torn (replayable by definition) — the stranded
            // copy is redundant
            fs.delete(st.getPath, true)
            ()
          }
        }
    }
  }

  /** The checkpoint's commit frontier: the highest batch id with a file
    * in `commits/` — batches above it may be replayed after a restart.
    * -1 when no commit exists yet (fold nothing batch-shaped).
    */
  private def lastCommittedBatch(fs: org.apache.hadoop.fs.FileSystem,
      checkpointDir: String): Long = {
    val commits = new org.apache.hadoop.fs.Path(checkpointDir, "commits")
    try {
      val ids = fs.listStatus(commits).toSeq
        .map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit))
        .map(_.toLong)
      if (ids.isEmpty) -1L else ids.max
    } catch { case _: java.io.FileNotFoundException => -1L }
  }

  /** One idempotent guarded batch append: recover a possibly-stranded
    * compaction snapshot (the same load-bearing recover-before-write as
    * [[Layout.appendGuarded]]), then overwrite this batch's
    * deterministic subdirectory.
    */
  private def appendBatch(batch: DataFrame, root: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    WriterLease.withLease(fs, root, s"zorderIngest-b$batchId") {
      new SnapshotDir(spark, dataDir).recover()
      val dir = s"$dataDir/b$batchId"
      batch.write.mode("overwrite").parquet(dir)
      // the marker is the visibility/fold gate; a marker-less committer
      // config must not make acked batches invisible (see
      // Layout.ensureSuccessMarker)
      Layout.ensureSuccessMarker(spark, dir)
    }
  }
}
