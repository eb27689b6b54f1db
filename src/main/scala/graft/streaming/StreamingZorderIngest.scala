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
  * Compaction contract: fold only while the ingest stream is quiesced
  * (between `Trigger.AvailableNow` runs, as here, or after `stop()`) —
  * compaction flattens batch dirs away, so folding a batch the
  * checkpoint has not yet committed would let a later replay of that
  * batch re-create its dir next to the already-folded copy. A quiesced
  * AvailableNow run has committed every batch it delivered, which makes
  * the fold safe; the lease alone serializes the WRITES but cannot know
  * the checkpoint's commit frontier.
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
