package graft.pipeline

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted IVF-PQ vector index — the serving layout the in-memory
  * `ann_ivfpq_*` queries stand in for. A 100 TB vector store does not
  * re-train and re-code the corpus per query: the index is built once
  * (centroids + residual codebook + PQ codes) and point queries touch
  * only the probed cells — the vector analog of
  * [[CorpusPipeline.lookupTerm]]'s range-pruned shards.
  *
  * Layout under `indexDir/`:
  *   - `centroids/`  — 16 rows (centroid_id, centroid), the coarse
  *     quantizer; broadcast-sized by construction.
  *   - `codebook/`   — 16 rows (code_id, cw), the shared residual
  *     codebook.
  *   - `codes/batch=<id>/cell=<n>/` — (vec_id, m, code) PQ codes,
  *     PARTITIONED BY arrival batch then home cell: a probe-mode serve
  *     filters on the cell partition column and the parquet source
  *     prunes unprobed cells at file-listing time (no footer even
  *     opened) — at 100 TB this is reading nprobe/16ths of the index
  *     instead of all of it. New vectors append as their own batch
  *     ([[appendVectors]]), coded against the STORED quantizer.
  *   - `manifest/batch=<id>/` — per-(batch, cell) row counts
  *     (observability + the spec's pruning assertions). Partitioned by
  *     batch so an append maintains it in O(batch) — one partition write
  *     per arrival, never a full-index rescan; reports aggregate across
  *     partitions, filtered to batch dirs that still exist.
  *
  * Serving reconstructs query residuals from the stored centroids and
  * runs the SAME ADC tail as the in-memory path
  * ([[Similarity.adcTopK]] — one shared implementation, not a replica),
  * so served results are provably identical (VectorIndexSpec pins
  * equality for nprobe = 1 and 2, probe and serve-all modes).
  */
object VectorIndexPipeline {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  case class VectorIndexReport(nCells: Int, nVectors: Long, maxCellRows: Long)

  /** Uncompacted-batch fan-in bound: more `codes/batch=*` dirs than this
    * trips a [[rebuild]] from inside [[appendVectors]] — the LSM fold
    * discipline ([[CorpusPipeline.MaxDeltaBatches]] for vectors). Every
    * serve unions all batch dirs, so the bound caps the file-listing and
    * footer fan-in per probe at the amortized cost of one base rewrite
    * per fold period.
    */
  val MaxCodeBatches: Int = 16

  /** Pending tombstones past this row count stop being a cheap broadcast
    * in the serve anti-join; [[deleteVecs]] rebuilds to retire them
    * (same constant class as [[CorpusPipeline.TombstoneBroadcastLimit]]).
    */
  val TombstoneBroadcastLimit: Long = 5000000L

  /** True when the index has outgrown its maintenance bounds — more
    * uncompacted batch dirs than the fan-in bound, or a pending tombstone
    * set past the broadcast bound. [[appendVectors]] and [[deleteVecs]]
    * run the rebuild themselves when this trips; it stays public as the
    * idle-time scheduling cue.
    */
  def rebuildDue(spark: SparkSession, indexDir: String,
      maxCodeBatches: Int = MaxCodeBatches,
      tombstoneBroadcastLimit: Long = TombstoneBroadcastLimit): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val batchesOver = fs.exists(path(s"$indexDir/codes")) &&
      fs.listStatus(path(s"$indexDir/codes"))
        .count(_.getPath.getName.startsWith("batch=")) > maxCodeBatches
    // def, not val: the tombstone count is a parquet read — skip it when
    // the cheap dir listing has already answered
    def tombsOver = fs.exists(path(s"$indexDir/tombstones")) &&
      spark.read.parquet(s"$indexDir/tombstones")
        .count() > tombstoneBroadcastLimit
    batchesOver || tombsOver
  }

  /** Batch ids whose codes a [[rebuild]] has folded into the base (or
    * that were present when a fold was attempted — see the write-order
    * note in [[rebuild]]). A replayed [[appendVectors]] for such an id
    * must be a no-op: its content already lives in `codes/`, and
    * rewriting the batch dir after a fold would double-count it.
    */
  private def foldedBatchIds(spark: SparkSession, indexDir: String)
      : Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$indexDir/folded_batches")))
      Set.empty
    else spark.read.parquet(s"$indexDir/folded_batches")
      .collect().map(_.getString(0)).toSet
  }

  /** Every directory that constitutes one index LIFE — the unit the
    * staged [[writeIvfPq]] swap promotes together. `generation` is the
    * life's identity marker ([[readGeneration]]): re-training mints a new
    * one, and writers that span lives (a stream checkpoint) bind to it so
    * a recycled batch-id space fails loudly instead of silently no-opping
    * against `folded_batches` (see
    * [[graft.streaming.StreamingVectorIngest]]).
    */
  private val LifePieces = Seq("centroids", "codebook", "codes", "manifest",
    "generation")

  /** Train (deterministic 2-iteration Lloyd's, as the ann_* family),
    * code every vector's residual, and persist the index — as a STAGED
    * life swap: every piece (centroids, codebook, codes, manifest,
    * generation) is built under `life.staging/`, a `_COMPLETE` marker
    * seals it, and only then does [[promoteLife]] swap the pieces in.
    * Readers keep the old index until the new one is fully built; a
    * crash mid-build leaves the old life serving (recovery rolls the
    * unsealed staging back), a crash mid-promote rolls forward from the
    * sealed staging. The previous unstaged form deleted the live index
    * before writing — re-train downtime, and a mid-build crash left
    * nothing recoverable.
    */
  def writeIvfPq(spark: SparkSession, sfDir: String, indexDir: String)
      : VectorIndexReport =
    WriterLease.withLease(fsFor(spark, indexDir), indexDir, "writeIvfPq") {
      writeIvfPqImpl(spark, sfDir, indexDir)
    }

  private def fsFor(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeIvfPqImpl(spark: SparkSession, sfDir: String,
      indexDir: String): VectorIndexReport = {
    import spark.implicits._
    recoverImpl(spark, indexDir) // writer entry: repair any prior crash
    val emb = Similarity.embDouble(spark, sfDir)
    val centroids = Similarity.kmeansCodebook(spark, sfDir)
    val cells = Similarity.ivfCells(spark, emb, centroids).cache()
    val rcb = Similarity.residualCodebook(cells)

    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(hconf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val staging = s"$indexDir/life.staging"
    fs.delete(path(staging), true) // any earlier unsealed attempt

    centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/centroids")
    rcb.coalesce(1).write.mode("overwrite").parquet(s"$staging/codebook")
    Similarity.pqCodesFrame(cells, rcb)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$staging/codes/batch=0")
    cells.unpersist(blocking = false)
    // manifest computed from the STAGED codes (the live index is untouched)
    spark.read.parquet(s"$staging/codes/batch=0")
      .groupBy($"cell")
      .agg(count_distinct($"vec_id").as("n_vectors"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$staging/manifest/batch=0")
    // a fresh build starts a new id-space life: mint its generation
    writeTextFile(fs, path(s"$staging/generation"),
      java.util.UUID.randomUUID().toString)
    // seal, then promote
    fs.create(path(s"$staging/_COMPLETE"), true).close()
    promoteLife(fs, indexDir)
    manifestReport(spark, indexDir)
  }

  /** Swap a SEALED staged life in (idempotent — crash-rerunnable from
    * [[recoverVectorIndex]]). Phase order makes the swap window LOUD
    * rather than wrong: all live pieces retire first (a racing reader
    * fails on a missing dir), then all staged pieces promote — never a
    * mixed old-codes/new-centroids index, which would serve silently
    * wrong neighbours. Cleanup (previous life's tombstones /
    * folded_batches / remnants) runs last; the staging root — and with
    * it the `_COMPLETE` roll-forward marker — is deleted as the final
    * step.
    */
  private def promoteLife(fs: org.apache.hadoop.fs.FileSystem,
      indexDir: String): Unit = {
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    def renameOrThrow(a: String, b: String): Unit =
      if (!fs.rename(path(a), path(b)))
        throw new java.io.IOException(s"life promote: rename $a -> $b failed")
    val staging = s"$indexDir/life.staging"
    for (p <- LifePieces
        if fs.exists(path(s"$staging/$p")) && fs.exists(path(s"$indexDir/$p"))) {
      fs.delete(path(s"$indexDir/$p.old"), true)
      renameOrThrow(s"$indexDir/$p", s"$indexDir/$p.old")
    }
    for (p <- LifePieces if fs.exists(path(s"$staging/$p")))
      renameOrThrow(s"$staging/$p", s"$indexDir/$p")
    for (stale <- Seq("tombstones", "folded_batches", "codes.appending"))
      fs.delete(path(s"$indexDir/$stale"), true)
    for (p <- LifePieces) fs.delete(path(s"$indexDir/$p.old"), true)
    fs.delete(path(staging), true)
  }

  /** The index life's identity: minted by [[writeIvfPq]], unchanged by
    * appends/deletes/rebuilds (same id space), replaced only by a
    * re-train. None for an index predating the marker.
    */
  def readGeneration(spark: SparkSession, indexDir: String): Option[String] = {
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(s"$indexDir/generation")
    if (!fs.exists(p)) None else Some(readTextFile(fs, p))
  }

  private[graft] def writeTextFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): Unit = {
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[graft] def readTextFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** Code a NEW batch of vectors (vec_id, embedding — ids disjoint from
    * every earlier batch) against the STORED quantizer and append it as
    * its own batch partition — the [[CorpusPipeline.appendBatch]] shape
    * for vectors: arrivals never re-train or rewrite the base, and
    * serving unions batches transparently (cell pruning applies across
    * all of them — `cell` stays a partition column inside every batch
    * dir). Codebook drift from a shifting vector distribution is handled
    * by periodic re-train + rewrite, the compact() analog. Replay-safe:
    * the batch is a deterministic overwrite, as
    * [[graft.streaming.StreamingDedupPipeline]] — and it is WRITTEN
    * OUTSIDE `codes/` (in `codes.appending/`) then renamed into place, so
    * a crash mid-write never leaves a footer-less file where serving
    * reads: serving between crash and replay sees exactly the
    * pre-append index ([[recoverVectorIndex]] drops staging remnants).
    */
  def appendVectors(spark: SparkSession, indexDir: String,
      newVectors: DataFrame, batchId: String,
      maxCodeBatches: Int = MaxCodeBatches): VectorIndexReport =
    WriterLease.withLease(fsFor(spark, indexDir), indexDir, "appendVectors") {
      appendVectorsImpl(spark, indexDir, newVectors, batchId, maxCodeBatches)
    }

  private def appendVectorsImpl(spark: SparkSession, indexDir: String,
      newVectors: DataFrame, batchId: String,
      maxCodeBatches: Int): VectorIndexReport = {
    import spark.implicits._
    recoverImpl(spark, indexDir)
    // a replay of a batch an auto-rebuild already folded into the base
    // must not re-write its dir — the codes are in the base now, and the
    // persisted manifest already describes them (no full-codes rescan).
    // The warn matters: if this is NOT a crash replay — a writer with a
    // fresh checkpoint whose ids restarted, or a manual append recycling
    // a folded id — this branch is silently discarding new vectors.
    // Streaming writers bind their checkpoint to the index generation so
    // that case fails loudly before reaching here
    // ([[graft.streaming.StreamingVectorIngest]]).
    if (foldedBatchIds(spark, indexDir).contains(batchId)) {
      log.warn(s"appendVectors($indexDir, batch=$batchId): batch id is in " +
        "folded_batches; treating as a crash replay and writing nothing. " +
        "If this append is new data under a recycled id, it is being " +
        "DISCARDED — use a fresh batch id (or, for streams, a checkpoint " +
        "bound to this index generation).")
      return manifestReport(spark, indexDir)
    }
    val emb = newVectors.select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    val rcb = spark.read.parquet(s"$indexDir/codebook")
    val cells = Similarity.ivfCells(spark, emb, centroids)
    val staging = s"$indexDir/codes.appending/batch=$batchId"
    Similarity.pqCodesFrame(cells, rcb)
      .write.mode("overwrite").partitionBy("cell").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val target = path(s"$indexDir/codes/batch=$batchId")
    if (fs.exists(target)) fs.delete(target, true) // replayed batch
    if (!fs.rename(path(staging), target))
      throw new java.io.IOException(
        s"append promote: rename $staging -> $target failed")
    fs.delete(path(s"$indexDir/codes.appending"), true)
    // check the bound BEFORE the manifest write: a triggered rebuild
    // recomputes the whole manifest itself
    if (rebuildDue(spark, indexDir, maxCodeBatches = maxCodeBatches)) {
      log.info(s"$indexDir has more than $maxCodeBatches uncompacted " +
        "batch dirs (or tombstones over bound); rebuilding")
      rebuildImpl(spark, indexDir)
    } else {
      writeManifestBatch(spark, indexDir, batchId)
      manifestReport(spark, indexDir)
    }
  }

  /** Logical delete — the redaction path for the vector index, mirroring
    * [[CorpusPipeline.deleteDocs]]: vec_ids append to
    * `<indexDir>/tombstones` and every serve anti-joins its codes against
    * them, so the delete is visible immediately without touching any
    * partition; [[rebuild]] drops tombstoned codes physically and retires
    * the tombstones. Idempotent (re-deleting is a no-op through the
    * anti-join). Contract (single-writer): a deleted vec_id must not be
    * re-appended until a rebuild has retired its tombstone — and because
    * crash recovery may leave an already-applied tombstone set behind
    * (harmless: the anti-join of a dropped id is a no-op), "retired"
    * means observed absent, not merely one rebuild later.
    */
  def deleteVecs(spark: SparkSession, indexDir: String, vecIds: Seq[Long],
      tombstoneBroadcastLimit: Long = TombstoneBroadcastLimit): Unit =
    WriterLease.withLease(fsFor(spark, indexDir), indexDir, "deleteVecs") {
      import spark.implicits._
      recoverImpl(spark, indexDir)
      vecIds.toDF("vec_id").coalesce(1)
        .write.mode("append").parquet(s"$indexDir/tombstones")
      if (rebuildDue(spark, indexDir,
          tombstoneBroadcastLimit = tombstoneBroadcastLimit)) {
        log.info(s"tombstones at $indexDir exceed the broadcast limit " +
          s"($tombstoneBroadcastLimit); rebuilding")
        rebuildImpl(spark, indexDir)
      }
    }

  /** Codes minus the pending tombstone set — the serve-side visibility
    * filter. The tombstone set is deletes-since-rebuild (bounded by the
    * single-writer's rebuild cadence, the same budget class as
    * lookupTerm's); one read serves both frames via localCheckpoint.
    */
  private def liveCodes(spark: SparkSession, indexDir: String,
      codes: DataFrame): DataFrame = {
    import spark.implicits._
    val tombDir = s"$indexDir/tombstones"
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(tombDir))) codes
    else {
      val tomb = spark.read.parquet(tombDir).select($"vec_id").distinct()
        .localCheckpoint()
      codes.join(broadcast(tomb), Seq("vec_id"), "left_anti")
    }
  }

  /** Fold every batch into a fresh `batch=0` base with tombstoned codes
    * physically dropped — the [[CorpusPipeline.compact]] analog (without
    * re-training: quantizer drift is a separate re-train + writeIvfPq).
    * Runs automatically from [[appendVectors]]/[[deleteVecs]] when
    * [[rebuildDue]] trips; stays public for idle-time scheduling.
    * Staged write + checked renames; [[recoverVectorIndex]] repairs any
    * crash window on the next index operation. Tombstones are deleted
    * only AFTER the swapped base proves readable; a crash before that
    * leaves them pending, which is harmless — anti-joining an id the new
    * base already dropped is a no-op, and the next rebuild retires them.
    * The folded batch ids are recorded in `folded_batches/` (append-only,
    * bytes per batch) so a stream replay of a batch the fold absorbed is
    * a no-op instead of a double-count — the fold-horizon discipline of
    * [[graft.streaming.StreamingDedupPipeline]].
    */
  def rebuild(spark: SparkSession, indexDir: String): VectorIndexReport =
    WriterLease.withLease(fsFor(spark, indexDir), indexDir, "rebuild") {
      rebuildImpl(spark, indexDir)
    }

  private def rebuildImpl(spark: SparkSession, indexDir: String)
      : VectorIndexReport = {
    import spark.implicits._
    recoverImpl(spark, indexDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(hconf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    def renameOrThrow(a: String, b: String): Unit =
      if (!fs.rename(path(a), path(b)))
        throw new java.io.IOException(s"rebuild swap: rename $a -> $b failed")
    val codes = s"$indexDir/codes"
    liveCodes(spark, indexDir,
        spark.read.parquet(codes).select($"vec_id", $"cell", $"m", $"code"))
      .repartition($"cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$codes.staging/batch=0")
    // record the folded batch ids BEFORE the swap: "folded" means "this
    // id's codes already live somewhere under codes/", which is true in
    // every crash window from here on (rolled back → still its own dir;
    // rolled forward → in the new base). Recording after the swap would
    // leave a window where a replayed append re-writes a batch the base
    // already absorbed.
    fs.listStatus(path(codes)).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch="))
      .toSeq.toDF("batch_id").coalesce(1)
      .write.mode("append").parquet(s"$indexDir/folded_batches")
    renameOrThrow(codes, s"$codes.old")
    renameOrThrow(s"$codes.staging", codes)
    // verify the promoted base serves before discarding the survivors
    spark.read.parquet(codes).schema
    fs.delete(path(s"$codes.old"), true)
    fs.delete(path(s"$indexDir/tombstones"), true)
    recomputeManifest(spark, indexDir)
    manifestReport(spark, indexDir)
  }

  /** Crash recovery for an interrupted [[rebuild]] swap — called on every
    * WRITER operation's entry (append/delete/rebuild; single-writer
    * contract, as [[CorpusPipeline.recoverIndex]]). Serve paths are
    * read-only and never call this — a reader that repaired could race a
    * live writer's staging dirs and swap renames. The `.staging`/`.old` survivors
    * key the window: codes missing + complete staging → roll forward
    * (delete the retired `.old`); codes missing + only `.old` → roll
    * back; codes present → delete whichever remnants survive. Tombstones
    * are NEVER deleted here: recovery cannot know whether the live base
    * already dropped them, and a stale tombstone is a no-op anti-join
    * that the next rebuild retires.
    */
  def recoverVectorIndex(spark: SparkSession, indexDir: String): Unit =
    WriterLease.withLease(fsFor(spark, indexDir), indexDir, "recover") {
      recoverImpl(spark, indexDir)
    }

  private def recoverImpl(spark: SparkSession, indexDir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(hconf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    def exists(s: String) = fs.exists(path(s))
    // an interrupted writeIvfPq life swap first: sealed staging rolls
    // FORWARD (re-run the idempotent promote), unsealed rolls BACK (the
    // old life keeps serving; restore any piece the crash left in .old)
    val life = s"$indexDir/life.staging"
    if (exists(s"$life/_COMPLETE")) {
      log.info(s"$indexDir: sealed life.staging found; completing promote")
      promoteLife(fs, indexDir)
    } else if (exists(life)) {
      log.info(s"$indexDir: unsealed life.staging found; rolling back")
      fs.delete(path(life), true)
      for (p <- LifePieces
          if !exists(s"$indexDir/$p") && exists(s"$indexDir/$p.old"))
        if (!fs.rename(path(s"$indexDir/$p.old"), path(s"$indexDir/$p")))
          throw new java.io.IOException(
            s"life rollback: restore of $indexDir/$p.old failed")
    }
    val codes = s"$indexDir/codes"
    if (!exists(codes)) {
      if (exists(s"$codes.staging/batch=0/_SUCCESS")) {
        if (!fs.rename(path(s"$codes.staging"), path(codes)))
          throw new java.io.IOException(
            s"vector index recovery: promote of $codes.staging failed")
        fs.delete(path(s"$codes.old"), true)
        // the repaired base post-dates whatever manifest survived the
        // crash — recompute from the codes actually on disk (rare path;
        // the O(index) scan lives here, never on the append hot path)
        recomputeManifest(spark, indexDir)
      } else if (exists(s"$codes.old")) {
        if (!fs.rename(path(s"$codes.old"), path(codes)))
          throw new java.io.IOException(
            s"vector index recovery: rollback of $codes.old failed")
        fs.delete(path(s"$codes.staging"), true)
        recomputeManifest(spark, indexDir)
      }
    } else {
      if (exists(s"$codes.staging")) fs.delete(path(s"$codes.staging"), true)
      if (exists(s"$codes.old")) fs.delete(path(s"$codes.old"), true)
    }
    // a crashed [[appendVectors]] write: staging never made it into
    // codes/, so dropping it restores the exact pre-append index and the
    // stream checkpoint replays the batch
    if (exists(s"$codes.appending")) fs.delete(path(s"$codes.appending"), true)
  }

  /** Per-batch manifest partition for `batchId`, computed from that
    * batch's codes dir ALONE — O(batch), the hot-path replacement for
    * rescanning the whole index per append (at 100 TB a per-micro-batch
    * full-codes scan would dominate ingest). Deterministic overwrite ⇒
    * replay-safe, like the codes batch it describes.
    */
  private def writeManifestBatch(spark: SparkSession, indexDir: String,
      batchId: String): Unit = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/codes/batch=$batchId")
      .groupBy($"cell")
      .agg(count_distinct($"vec_id").as("n_vectors"),
        count(lit(1)).as("n_rows"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/manifest/batch=$batchId")
  }

  /** Full manifest recompute from the codes table — O(index), used only
    * where the index itself was just rewritten (rebuild) or repaired
    * (crash recovery), never on the per-batch append path.
    */
  private def recomputeManifest(spark: SparkSession, indexDir: String)
      : Unit = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/manifest"), true)
    spark.read.parquet(s"$indexDir/codes")
      .groupBy($"batch", $"cell")
      .agg(count_distinct($"vec_id").as("n_vectors"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").partitionBy("batch")
      .parquet(s"$indexDir/manifest")
  }

  /** Report aggregated from the persisted per-batch manifest. Rows are
    * filtered to batch dirs that still EXIST under `codes/`, so stale
    * entries from a crash window (a fold that died before its manifest
    * rewrite) are excluded rather than double-counted; per-batch
    * n_vectors are additive across batches because batch vec_ids are
    * disjoint by contract. The manifest is observability state — serving
    * and pruning never read it — so its crash-window guarantee is
    * "lags by at most the in-flight batch until the replay lands".
    */
  private def manifestReport(spark: SparkSession, indexDir: String)
      : VectorIndexReport = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(s"$indexDir/codes"))
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=")).toSeq
    val stats = spark.read.parquet(s"$indexDir/manifest")
      .filter($"batch".cast("string").isin(live: _*))
      .groupBy($"cell")
      .agg(sum($"n_vectors").as("nv"), sum($"n_rows").as("nr"))
      .agg(count(lit(1)).as("cells"), sum($"nv").as("vecs"),
        max($"nr").as("maxRows")).head()
    VectorIndexReport(
      nCells = stats.getAs[Long]("cells").toInt,
      nVectors = stats.getAs[Long]("vecs"),
      maxCellRows = stats.getAs[Long]("maxRows"))
  }

  /** The cell-pruned codes read: filtering on the partition column makes
    * the parquet source skip unprobed `cell=` directories at listing
    * time. Exposed separately so the spec can observe the pruning
    * (`inputFiles` of this frame names only probed cells).
    */
  def prunedCodes(spark: SparkSession, indexDir: String,
      probedCells: Seq[Long]): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/codes")
      .filter($"cell".isin(probedCells: _*))
      .select($"vec_id", $"cell", $"m", $"code")
  }

  /** Serve top-3 ADC neighbours for the embedding table's query set
    * through the PERSISTED index: stored centroids assign the probes,
    * only probed cells are read, and the shared ADC tail scores them.
    * `serveAll` reads every cell (batch-inference mode — pruning buys
    * nothing when every cell is probed, and the corpus-sized LUT join
    * stays un-broadcast exactly as in the in-memory path).
    */
  def serveIvfPq(spark: SparkSession, indexDir: String, sfDir: String,
      serveAll: Boolean = false, nprobe: Int = 1): DataFrame = {
    import spark.implicits._
    // READ-ONLY by design: recovery mutates the index (drops staging,
    // resolves the rebuild swap), so a serve that ran it could race a
    // live writer — deleting an in-flight append's staging dir out from
    // under it, or fighting the writer over the swap renames. Readers
    // never repair; the single writer repairs on its next operation. A
    // serve landing in the tiny mid-swap crash window (codes/ absent)
    // fails loudly instead of silently self-healing.
    val emb = Similarity.embDouble(spark, sfDir)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    val rcb = spark.read.parquet(s"$indexDir/codebook")
    // localCheckpoint, not cache(): the frame feeds both the probed-cell
    // collect and the ADC join, and its blocks are released with the plan
    // instead of pinning storage past the call
    val queries = Similarity
      .probeResiduals(spark, emb, centroids, serveAll, nprobe)
      .localCheckpoint()
    val codes =
      if (serveAll) spark.read.parquet(s"$indexDir/codes")
        .select($"vec_id", $"cell", $"m", $"code")
      else {
        // the probed-cell set is (queries × nprobe)-sized — a driver
        // collect of the same budget class as lookupTerm's manifest read
        val probed = queries.select($"qcell").distinct()
          .collect().map(_.getLong(0)).toSeq
        prunedCodes(spark, indexDir, probed)
      }
    // pending deletes ([[deleteVecs]]) are hidden until a rebuild drops
    // them physically
    Similarity.adcTopK(liveCodes(spark, indexDir, codes), rcb, queries, serveAll)
  }

  /** Exact-rerank serving through the persisted index — the on-disk form
    * of [[Similarity.ivfPqRerank]]: the stored index produces the ADC
    * top-`depth` shortlist (cell-pruned reads, tombstone-filtered), then
    * the shared refinement tail re-scores ONLY those candidates against
    * the raw vector store. Shares the in-memory implementation, so
    * disk==memory is structural, and the raw-store read is the broadcast
    * single pass the rerank plan pin enforces.
    */
  def serveIvfPqRerank(spark: SparkSession, indexDir: String, sfDir: String,
      depth: Int = Similarity.RerankDepth): DataFrame = {
    import spark.implicits._
    // read-only, as serveIvfPq: recovery belongs to the single writer
    val emb = Similarity.embDouble(spark, sfDir)
    val centroids = spark.read.parquet(s"$indexDir/centroids")
    val rcb = spark.read.parquet(s"$indexDir/codebook")
    val queries = Similarity
      .probeResiduals(spark, emb, centroids, serveAll = false, nprobe = 1)
      .localCheckpoint()
    val probed = queries.select($"qcell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val shortlist = Similarity.adcTopK(
        liveCodes(spark, indexDir, prunedCodes(spark, indexDir, probed)),
        rcb, queries, serveAll = false, k = depth)
      .select($"qid", $"cid")
    Similarity.exactRerank(shortlist,
      graft.queries.Tables.embeddings(spark, sfDir))
  }
}
