package graft.streaming

import graft.pipeline.VectorIndexPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

/** Streaming ingestion into the persisted IVF-PQ vector index — the
  * freshness path of a 100 TB vector store: new embeddings land as
  * parquet files, a file stream drains them in bounded micro-batches, and
  * each batch is coded against the STORED quantizer and appended as its
  * own `codes/batch=<id>/cell=<n>/` partition
  * ([[VectorIndexPipeline.appendVectors]]). Serving picks new batches up
  * transparently (cell pruning spans all batch dirs), so index freshness
  * is one micro-batch behind arrivals with no retrain, no base rewrite,
  * and no serve downtime.
  *
  * This is the vector analog of [[StreamingDedupPipeline]] over the
  * posting index: same foreachBatch + deterministic-overwrite replay
  * discipline. A replayed batch (crash between append and checkpoint
  * commit) rewrites `batch=<id>` with identical content, so recovery is
  * idempotent; the structured-streaming checkpoint owns batch numbering.
  *
  * Contract (single writer, as the pipeline it wraps): stream batches own
  * ids `1 + batchId` — the base build is `batch=0`, and manual
  * [[VectorIndexPipeline.appendVectors]] calls must not reuse the
  * stream's id space while the stream's checkpoint lives. Codebook drift
  * is handled outside the stream (periodic re-train + writeIvfPq, the
  * compact() analog).
  */
object StreamingVectorIngest {

  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** Drain `srcDir` (AvailableNow) into the index at `indexDir`.
    * `maxFilesPerTrigger` bounds micro-batch size so a backlog replays as
    * the same ordered batches; `maxCodeBatches` is the index's LSM
    * fan-in bound — when the stream's appends outgrow it, the append
    * itself folds the batch dirs into the base, and the `folded_batches`
    * record keeps a crash-replay of an absorbed batch a no-op.
    */
  def ingestVectors(spark: SparkSession, srcDir: String, indexDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 1,
      maxCodeBatches: Int = VectorIndexPipeline.MaxCodeBatches): Unit = {
    bindGeneration(spark, indexDir, checkpointDir)
    val stream = spark.readStream
      .schema(vectorSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        if (!batch.isEmpty) {
          VectorIndexPipeline.appendVectors(batch.sparkSession, indexDir,
            batch, (1L + batchId).toString, maxCodeBatches = maxCodeBatches)
          ()
        }
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Bind this stream's checkpoint to the index GENERATION
    * ([[VectorIndexPipeline.readGeneration]]) so the two silent-data-loss
    * shapes behind the single-writer/id-space contract fail loudly
    * instead of no-opping into `folded_batches`:
    *
    *   1. checkpoint outlives the index — a re-train (writeIvfPq) minted
    *      a new generation; this stream's replayed/next batch ids belong
    *      to the RETIRED id space. Without the check the ids collide with
    *      nothing and quietly build batches coded fine — but a checkpoint
    *      that believed earlier batches were committed has lost them to
    *      the re-train; the operator must choose (fresh checkpoint +
    *      re-ingest, or accept the loss) explicitly.
    *   2. index outlives the checkpoint — a FRESH checkpoint restarts
    *      batch ids at 0 (append ids at 1) against an index whose earlier
    *      stream life already wrote/folded those ids: every replayed id in
    *      `folded_batches` would be silently discarded as a "replay".
    *
    * A legacy index built before generation markers existed is adopted by
    * stamping one on first bind (writer-side call, inside the
    * single-writer contract).
    */
  private[streaming] def bindGeneration(spark: SparkSession, indexDir: String,
      checkpointDir: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(hconf)
    def path(s: String) = new org.apache.hadoop.fs.Path(s)
    val genPath = path(s"$indexDir/generation")
    val gen = VectorIndexPipeline.readGeneration(spark, indexDir) match {
      case Some(g) if g.nonEmpty => g
      case Some(_) =>
        // generation file exists but is empty: a concurrent adopter is
        // between its create and its content write — settle on its value
        val g = readSettled(fs, genPath)
        if (g.isEmpty) {
          throw new IllegalStateException(
            s"$genPath exists but stayed empty (1s): refusing to bind blind")
        }
        g
      case None =>
        // legacy-index adoption: atomic create-no-overwrite, so two
        // concurrent adopters agree on ONE minted generation (the loser
        // reads the winner's)
        writeTextFileOnce(fs, genPath, java.util.UUID.randomUUID().toString)
    }
    val marker = path(s"$checkpointDir/graft-index-generation")
    val markerFs = marker.getFileSystem(hconf)
    if (markerFs.exists(marker)) {
      // readSettled, not a bare read: a concurrent first-binder may have
      // created the marker but not yet written its bytes
      val bound = readSettled(markerFs, marker)
      if (bound.isEmpty) {
        // still empty after the settle budget: no live binder is mid-write
        // — a prior first-binder crashed between creating the marker and
        // landing its bytes. Routing this through the mismatch branch
        // would report a baffling "bound to generation ''"; name the real
        // state and the one-step recovery instead.
        throw new IllegalStateException(
          s"checkpoint marker $marker exists but is EMPTY — a prior bind " +
            "crashed between creating the marker and writing its bytes. " +
            s"Delete the marker file to let this stream re-bind to " +
            s"$indexDir explicitly.")
      }
      if (bound != gen) {
        throw new IllegalStateException(
          s"stream checkpoint $checkpointDir is bound to index generation " +
            s"$bound but $indexDir is now generation $gen: the index was " +
            "re-trained since this stream last ran, so the checkpoint's " +
            "batch ids (and its committed-batch bookkeeping) refer to a " +
            "retired index life. Start a fresh checkpointDir and re-ingest " +
            "the source, or delete the marker to adopt the new life " +
            "explicitly.")
      }
    } else {
      // fresh checkpoint: ids restart — only safe against an index with no
      // earlier stream life (no folded ids, no batches beyond the base)
      val folded = fs.exists(path(s"$indexDir/folded_batches"))
      val extraBatches = fs.exists(path(s"$indexDir/codes")) &&
        fs.listStatus(path(s"$indexDir/codes")).map(_.getPath.getName)
          .exists(n => n.startsWith("batch=") && n != "batch=0")
      if (folded || extraBatches) {
        throw new IllegalStateException(
          s"fresh stream checkpoint $checkpointDir against $indexDir, but " +
            "the index already contains appended or folded stream batches " +
            "from an earlier checkpoint: restarting ids at 1 would collide " +
            "with (and be silently discarded against) the folded id space. " +
            "Reuse the original checkpointDir, or re-train the index " +
            "(writeIvfPq) to start a new life.")
      }
      markerFs.mkdirs(marker.getParent)
      // atomic first bind: create-no-overwrite closes the
      // exists-check→write race between two simultaneous first-run
      // streams — exactly one creates the marker; the other reads the
      // winner's value and either agrees (same index, same generation:
      // proceed) or fails with the standard mismatch error
      val bound = writeTextFileOnce(markerFs, marker, gen)
      if (bound != gen) {
        throw new IllegalStateException(
          s"stream checkpoint $checkpointDir was concurrently bound to " +
            s"index generation $bound but this stream targets $indexDir " +
            s"generation $gen: two streams raced the first bind against " +
            "different index lives. Use one checkpointDir per index life.")
      }
    }
  }

  /** Atomically create `p` with `content`, exclusive against concurrent
    * creators (via [[graft.pipeline.WriterLease.createExclusive]], the
    * per-filesystem test-and-set). Returns the file's actual content
    * afterwards: `content` if this call won the create, the concurrent
    * winner's content if it lost.
    */
  private def writeTextFileOnce(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, content: String): String = {
    val won = graft.pipeline.WriterLease.createExclusive(fs, p, content)
    if (won) content
    else {
      // Lost the create race: the winner's content is the binding truth —
      // poll past the tiny window where its file exists but its bytes
      // haven't landed. A non-race IOException (permissions, dead FS)
      // surfaces from the read.
      val got = readSettled(fs, p)
      if (got.isEmpty) {
        throw new IllegalStateException(
          s"lost the create race on $p but the winner's content never " +
            "appeared (empty after 1s): refusing to bind blind")
      }
      got
    }
  }

  /** Read `p`, polling briefly while it is missing or empty (a concurrent
    * creator between its create and its content write). Returns "" only
    * after the poll budget expires.
    */
  private def readSettled(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    var got = ""
    var tries = 0
    while ({
      got = try VectorIndexPipeline.readTextFile(fs, p)
            catch { case _: java.io.FileNotFoundException => "" }
      got.isEmpty && tries < 100
    }) { tries += 1; Thread.sleep(10) }
    got
  }
}
