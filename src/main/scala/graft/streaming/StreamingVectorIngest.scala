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
}
