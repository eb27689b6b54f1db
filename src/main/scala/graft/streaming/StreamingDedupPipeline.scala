package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous-ingestion near-dup rejection — the online form of
  * [[graft.operators.Dedup]]'s `dd_incremental`: documents arrive as a
  * file stream, and each micro-batch admits only documents that are NOT
  * near-duplicates (word-3-gram Jaccard ≥ τ) of anything already
  * admitted — either in the persisted store of earlier batches or earlier
  * (by doc_id) within the same batch. The admitted set is exactly the
  * SEQUENTIAL GREEDY over arrival order (batch order, doc_id within a
  * batch): a doc is kept iff it has no kept near-dup predecessor —
  * proven against an independently computed greedy in
  * StreamingDedupSpec.
  *
  * Scale shape, per stage:
  *   - The store holds each admitted doc's hashed shingle array,
  *     partitioned by admitting batch (`batch=<id>/`). The cross-batch
  *     candidate join is the `dd_incremental` shape: explode both sides
  *     to (shingle, doc) postings, drop high-df ("stopword") shingles,
  *     equi-join on the 8-byte shingle hash — shuffle volume driven by
  *     the incoming batch, never all-pairs. (At index scale the store
  *     side becomes a maintained posting-list index with per-shingle df —
  *     [[graft.pipeline.CorpusPipeline.appendBatch]] is that machinery;
  *     here df is recomputed per batch, which only ever ADMITS more
  *     candidates than a final-df run would, and the exact verification
  *     makes extra candidates harmless.)
  *   - Within-batch greedy is a bounded peeling loop over the batch's
  *     near-dup subgraph (pairs, not docs): each round decides every doc
  *     whose smaller-id neighbours are all decided, and the minimum
  *     undecided doc is always decidable, so rounds ≤ longest dependency
  *     chain (near-dup chains are cluster-sized, not corpus-sized). Each
  *     round's survivors are `localCheckpoint`ed — the `dd_clusters`
  *     iterative-lineage discipline.
  *   - Replay safety: foreachBatch re-delivers a batch after a crash;
  *     every write is a deterministic function of (batch content, store
  *     state strictly below this batch id) into this batch's own
  *     partition directory with overwrite — a half-written partition from
  *     the crashed attempt is excluded from reads (store reads filter
  *     `batch < batchId`) and then overwritten by the replay.
  */
object StreamingDedupPipeline {

  /** Jaccard admission threshold (same τ as the dd_* near-dup family). */
  val Tau = 0.6

  /** df cap for candidate generation (same constant as dd_incremental):
    * shingles shared by more docs than this carry no dedup signal and
    * would fan the join out ~Σ df²; the exact verifier keeps the cap
    * recall-safe for any pair that also shares one rare shingle.
    */
  val MaxShingleDf = 50L

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Drain `srcDir` (AvailableNow) through the greedy admission filter:
    * admitted docs land in `keptDir/batch=<id>/`, their shingles in
    * `storeDir/batch=<id>/`. `maxFilesPerTrigger` bounds batch size so a
    * backlog replays as the same ordered micro-batches.
    */
  def ingestDedup(spark: SparkSession, srcDir: String, storeDir: String,
      keptDir: String, checkpointDir: String,
      maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: java.lang.Long) =>
        processBatch(batch, batchId, storeDir, keptDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Verified near-dup pairs between two hashed-shingle frames
    * (columns: id/shingles aliased per side), J ≥ [[Tau]]. `df` spans
    * BOTH sides so the cap sees every posting the join would touch.
    */
  private def nearDupPairs(a: DataFrame, b: DataFrame): DataFrame = {
    val s = a.sparkSession
    import s.implicits._
    val postA = a.select($"a_id", explode($"sa").as("sh"))
    val postB = b.select($"b_id", explode($"sb").as("sh"))
    val frequent = postA.select($"sh")
      .unionAll(postB.select($"sh"))
      .groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" > MaxShingleDf).select($"sh")
    val cand = postA.join(broadcast(frequent), Seq("sh"), "left_anti")
      .join(postB.join(broadcast(frequent), Seq("sh"), "left_anti"), "sh")
      .select($"a_id", $"b_id").distinct()
    cand
      .join(a, "a_id").join(b, "b_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"sa", $"sb")).as("ni"),
        size($"sa").as("na"), size($"sb").as("nb"))
      .filter(($"ni".cast(DoubleType) / ($"na" + $"nb" - $"ni")) >= Tau)
      .select($"a_id", $"b_id")
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      storeDir: String, keptDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._

    // one materialization serves shingling, both joins, and the writes;
    // also pins the batch content against source-side races
    val docs = batch.localCheckpoint()
    val sh = graft.operators.Dedup.hashedShinglesOf(docs).localCheckpoint()

    // ---- cross-batch rejection: batch docs near-dup of any STORED doc.
    // Store reads exclude this batch id: a crashed attempt's partition
    // must not veto its own replay.
    // enumerate committed partitions explicitly instead of filtering a
    // root read: a crashed attempt can leave footer-less part files in
    // its own batch dir, and partition discovery would trip over them
    // before any batch < batchId filter could apply
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Seq[String] =
      if (!fs.exists(new org.apache.hadoop.fs.Path(storeDir))) Seq.empty
      else fs.listStatus(new org.apache.hadoop.fs.Path(storeDir)).toSeq
        .map(_.getPath)
        .filter(p => p.getName.startsWith("batch=") &&
          p.getName.stripPrefix("batch=").toLong < batchId)
        .map(_.toString)
    val store =
      if (committed.isEmpty)
        sh.filter(lit(false)).select($"doc_id".as("a_id"), $"shingles".as("sa"))
      else
        spark.read.option("basePath", storeDir).parquet(committed: _*)
          .select($"doc_id".as("a_id"), $"shingles".as("sa"))
    val batchSide = sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
    val storeHits = nearDupPairs(store, batchSide)
      .select($"b_id".as("doc_id")).distinct()
    val afterStore = sh.join(storeHits, Seq("doc_id"), "left_anti")
      .localCheckpoint()

    // ---- within-batch sequential greedy by doc_id: peel rounds until
    // every doc is decided. pairs is the batch's near-dup subgraph
    // (lo < hi), member-sized.
    val pairs = nearDupPairs(
        afterStore.select($"doc_id".as("a_id"), $"shingles".as("sa")),
        afterStore.select($"doc_id".as("b_id"), $"shingles".as("sb")))
      .filter($"a_id" < $"b_id")
      .localCheckpoint()
    var undecided = afterStore.select($"doc_id").localCheckpoint()
    var kept = undecided.filter(lit(false)).localCheckpoint()
    var nUndecided = undecided.count()
    while (nUndecided > 0) {
      // a doc is decidable when all its smaller-id neighbours are decided:
      // KEEP if none of them was kept, DROP otherwise
      val blockedBy = pairs.join(undecided.withColumnRenamed("doc_id", "a_id"), "a_id")
        .select($"b_id".as("doc_id")).distinct()
      val decidable = undecided.join(blockedBy, Seq("doc_id"), "left_anti")
      val droppedNow = decidable.join(
          pairs.join(kept.withColumnRenamed("doc_id", "a_id"), "a_id")
            .select($"b_id".as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
      val keptNow = decidable.join(droppedNow, Seq("doc_id"), "left_anti")
      kept = kept.unionAll(keptNow).localCheckpoint()
      undecided = undecided.join(decidable, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val n = undecided.count()
      // the minimum undecided doc has no undecided smaller neighbour, so
      // every round decides at least one doc — this guards the invariant
      require(n < nUndecided, s"peeling stalled at $n undecided")
      nUndecided = n
    }

    // docs too short to shingle can never be near-dups under the 3-gram
    // relation — always admitted (they carry no store shingles either)
    val unshingled = docs.select($"doc_id")
      .join(sh.select($"doc_id"), Seq("doc_id"), "left_anti")
    val admitted = kept.unionAll(unshingled)

    // ---- deterministic, per-batch-partition writes (replay = overwrite)
    docs.join(admitted, Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$keptDir/batch=$batchId")
    sh.join(kept, Seq("doc_id"), "left_semi")
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }
}
