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
  * [[Layout.compactZorder]]) lists with `recursiveFileLookup`, which
  * reads flat part files and batch subdirectories uniformly.
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
    * batch dirs ride through the swap untouched — they are replayable
    * by definition, and the deterministic-overwrite append rewrites
    * them identically on restart. No-op when nothing committed exists
    * to fold.
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
        val frontier = lastCommittedBatch(fs, checkpointDir)
        val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
          .toSeq.filterNot { st =>
            val n = st.getPath.getName
            n.startsWith("_") || n.startsWith(".")
          }
        val (files, dirs) = entries.partition(_.isFile)
        def batchId(name: String): Option[Long] =
          if (name.startsWith("b") && name.drop(1).nonEmpty &&
            name.drop(1).forall(_.isDigit)) Some(name.drop(1).toLong)
          else None
        val (fold, pending) = dirs.partition { st =>
          batchId(st.getPath.getName).exists(_ <= frontier) &&
            fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS"))
        }
        val foldPaths = (files ++ fold).map(_.getPath.toString)
        if (foldPaths.nonEmpty) {
          Layout.zorderWrite(spark.read.parquet(foldPaths: _*), colA, colB,
            snap.stagingPath, nFiles)
          // carry non-foldable batches through the swap: moving the
          // already-written bytes is an optimization — losing one here
          // (crash mid-move) is recovered by the checkpoint replay
          // rewriting the batch on restart
          pending.foreach { st =>
            fs.rename(st.getPath, new org.apache.hadoop.fs.Path(
              snap.stagingPath, st.getPath.getName))
          }
          snap.swapIn()
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
      batch.write.mode("overwrite").parquet(s"$dataDir/b$batchId")
    }
  }
}
