package graft.streaming

import graft.pipeline.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming ingest into a [[VersionedTable]] — the
  * versioned-table twin of [[StreamingZorderIngest]], with a simpler
  * exactly-once story: each micro-batch appends THROUGH
  * [[VersionedTable.appendBatch]], which records the batch id as an
  * ingest frontier inside the same atomically-published manifest as
  * the data. A batch crashed after its append but before the
  * checkpoint commit is re-delivered on restart, found at-or-below
  * the recorded frontier, and skipped — no deterministic-overwrite
  * directory discipline, no compaction-time frontier gate, because
  * data and idempotence marker commit in ONE rename. Readers stay
  * lock-free and snapshot-isolated throughout; compaction
  * ([[VersionedTable.compactZorder]]) is safe at ANY time — it only
  * publishes a new version over already-published files, so there is
  * no uncommitted-batch hazard at all.
  */
object StreamingVersionedIngest {

  /** Drain `stream` into the versioned table at `root` with
    * `Trigger.AvailableNow`. `afterBatch` is the fault-injection seam:
    * throwing from it after the append but before the checkpoint
    * commit forces a replay of a fully-published batch.
    */
  def ingestAvailable(stream: DataFrame, root: String,
      checkpointDir: String, statCols: Seq[String],
      afterBatch: Long => Unit = _ => ()): Unit = {
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        if (!batch.isEmpty) {
          VersionedTable.appendBatch(batch, root, statCols, batchId)
          afterBatch(batchId)
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
