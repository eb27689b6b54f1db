package graft.streaming

import graft.pipeline.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** DEDUP-AT-INGEST over a [[VersionedTable]] target — the composition
  * of the two pillars: [[StreamingDedupPipeline]]'s greedy admission
  * (a doc is kept iff it has no kept near-dup predecessor in arrival
  * order) and the versioned table's atomic exactly-once commits.
  * Per micro-batch:
  *
  *  1. SYNC the posting store from the TABLE's own change feed
  *     ([[VersionedTable.readChanges]], one store delta per table
  *     version) — the store is a downstream VIEW of the table, not a
  *     second source of truth, so whatever crashed between a landed
  *     append and its indexing is caught up here before any decision;
  *  2. ADMIT the batch against that store (+ the within-batch greedy —
  *     [[StreamingDedupPipeline.admitDocs]], the same code path the
  *     classic pipeline runs);
  *  3. LAND the admitted docs via [[VersionedTable.appendBatchDetailed]]
  *     with the batch id as ingest frontier — a replayed batch
  *     publishes NOTHING (the idempotence lives in the same atomic
  *     manifest publish as the data);
  *  4. sync the store again to index what just landed.
  *
  * Exactly-once end to end: the table is exact by the frontier
  * argument; the store is exact because each delta dir is a
  * deterministic function of one immutable table version, written
  * with overwrite, and its OWN frontier file (`_frontier`, atomically
  * renamed into place after the dirs land) only advances past a fully
  * written delta — a crash anywhere replays the delta verbatim.
  * Admission equivalence: at decision time the store reflects exactly
  * the table's admitted rows (step 1), so the kept set is the same
  * sequential greedy the classic pipeline computes — proven
  * end-to-end in StreamingDedupVersionedSpec, crash included.
  *
  * At 100 TB: admission cost is batch-driven (the store reads are
  * shingle-filtered and LSM-folded exactly as before); the table gives
  * the corpus snapshot isolation, time travel, CDC, compaction and
  * SQL serving that a bare kept-directory never had — compaction
  * versions carry no changes and cost the store one empty delta.
  */
object StreamingDedupVersionedIngest {

  /** The doc table's stat columns (the LONG columns of the document
    * schema) — doc_id first so key-shaped probes prune.
    */
  val Stats: Seq[String] = Seq("doc_id", "n_chars")

  /** The doc table's TYPED stat columns: the admitted corpus records
    * lang/source bounds per file, so the one-language probes every
    * corpus serves prune straight off the manifest
    * ([[graft.pipeline.VersionedTable]] typed statistics).
    */
  val TypedStats: Seq[String] = Seq("lang", "source")

  /** Drain `srcDir` (AvailableNow) through greedy dedup admission into
    * the versioned table at `tableRoot`; the posting store under
    * `storeDir` is maintained from the table's change feed.
    * `afterBatch` is the fault-injection seam (throw to simulate a
    * crash after the batch fully processed but before the checkpoint
    * commit).
    */
  def ingest(spark: SparkSession, srcDir: String, tableRoot: String,
      storeDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1,
      afterBatch: Long => Unit = _ => ()): Unit = {
    val stream = spark.readStream
      .schema(StreamingDedupPipeline.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        processBatch(batch, batchId, tableRoot, storeDir)
        afterBatch(batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      tableRoot: String, storeDir: String): Unit = {
    val spark = batch.sparkSession
    // 1. catch the store up to the table (indexes any version a crash
    //    left unindexed, including this batch's own on a replay)
    syncStore(spark, tableRoot, storeDir)
    // 2. admit against the store as of its frontier
    val docs = batch.localCheckpoint()
    val sh = graft.operators.Dedup.hashedShinglesOf(docs).localCheckpoint()
    val f = storeFrontier(spark, storeDir)
    val admitted = docs.join(
      StreamingDedupPipeline.admitDocs(docs, sh, storeDir, f + 1),
      Seq("doc_id"), "left_semi")
    // 3. land exactly-once (a replay publishes nothing)
    VersionedTable.appendBatchDetailed(admitted, tableRoot, Stats, batchId,
      TypedStats)
    // 4. index what landed
    syncStore(spark, tableRoot, storeDir)
  }

  /** The last TABLE version the store has indexed (0 when none). */
  private[streaming] def storeFrontier(spark: SparkSession,
      storeDir: String): Long = {
    val p = java.nio.file.Paths.get(storeDir, "_frontier")
    if (!java.nio.file.Files.exists(p)) 0L
    else new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .trim.toLong
  }

  private def writeFrontier(storeDir: String, v: Long): Unit = {
    val dir = java.nio.file.Paths.get(storeDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".frontier", ".tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, dir.resolve("_frontier"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** Index every table version past the store's frontier: one store
    * delta per version from [[VersionedTable.readChanges]] (append
    * rows exactly once; compactions contribute an empty delta), the
    * frontier advanced only AFTER the delta's dirs are fully written.
    */
  private[streaming] def syncStore(spark: SparkSession, tableRoot: String,
      storeDir: String): Unit = {
    val latest = VersionedTable.latestVersion(spark, tableRoot)
      .getOrElse(return)
    var f = storeFrontier(spark, storeDir)
    while (f < latest) {
      val v = f + 1
      val rows = VersionedTable.readChanges(spark, tableRoot, v - 1, v)
      val keptSh = graft.operators.Dedup.hashedShinglesOf(rows)
        .localCheckpoint()
      StreamingDedupPipeline.writeStoreDelta(spark, keptSh, storeDir, v)
      writeFrontier(storeDir, v)
      f = v
    }
  }
}
