package graft.operators

import graft.pipeline.VectorIndexPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 scale study: push one dedup and one ANN path an order of
  * magnitude past every earlier measurement (100k → 1M rows), validating
  * the two claims the round-9 review asked to extend
  * (VERDICT r9, "Next round" #7):
  *
  *   sbt "Test/runMain graft.operators.ScalingStudyR10"        # all parts
  *   sbt "Test/runMain graft.operators.ScalingStudyR10 dedup"  # one part
  *   (parts: dedup | minhash | lsh | ivfpq)
  *
  * 1. **df-cap** (`Dedup.jaccardPairs(cap=50)`): the capped shingle join
  *    is claimed linear-ish because on Zipf-tailed vocabularies the
  *    over-cap "stopword" shingles carry no dedup signal while the
  *    sub-cap tail keeps every true pair connected. The earlier 31-word
  *    corpora measure the DEGENERATE regime (cap empties at 100k,
  *    SCALE.md §Dedup); this study adds the regime the cap is designed
  *    for — a 50k-word Zipf(≈1) vocabulary ([[zipfCorpus]], rank drawn
  *    log-uniformly so P(rank r) ∝ 1/r) at 100k / 300k / 1M docs, with
  *    planted-truth recall and the over-cap fraction measured per size.
  * 2. **MinHash-LSH survival** at 1M docs of the degenerate 31-word
  *    corpus (2×4 banding, the production config from the round-6
  *    sweep): recall of the planted truth and candidate precision must
  *    hold where every individual shingle is over-cap.
  * 3. **LSH bucket occupancy** (`lsh_bucket`): the capacity-control
  *    claim — expected occupancy n/2^planes, each plane halving it —
  *    measured at 1M vectors for 8 and 12 planes, with planted-pair
  *    recall (single probe vs Hamming-1 multiprobe).
  * 4. **Persisted IVF-PQ** ([[VectorIndexPipeline]]): build + probe-mode
  *    serve timed at 100k / 1M vectors; serve latency must track the
  *    probed-cell size (≈ n/16 rows read), not the corpus.
  *
  * All corpora are md5-derived and deterministic (no RNG) — reruns
  * reproduce bit-identical inputs. Results feed SCALE.md (round 10).
  */
object ScalingStudyR10 {

  /** n docs over a 50k-word Zipf-ish vocabulary: word ranks drawn
    * log-uniformly (inverse-CDF of 1/r), words are synthetic tokens
    * `w<rank>`. Same planted-dup structure as [[ScalingStudy.corpus]]:
    * ids ≡ 0 (mod 20) regenerate from id-1's seed plus a marker word,
    * so (id-1, id) are near-dups at J ≈ 0.95.
    */
  private val ZipfVocab = 50000
  private[graft] def zipfCorpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val lnV = math.log(ZipfVocab.toDouble)
    val base = spark.range(n).select($"id".as("doc_id"))
      .withColumn("seed",
        when($"doc_id" % 20 === 0 && $"doc_id" > 0, $"doc_id" - 1)
          .otherwise($"doc_id"))
      .withColumn("nw",
        (expr("CAST(conv(substring(md5(CAST(seed AS STRING)), 1, 6), 16, 10) AS BIGINT)") % 40 + 40))
    // u in [0,1) from 6 md5 hex chars; rank = floor(exp(u·lnV)) ∈ [1, V]
    base.select($"doc_id",
      expr(s"""concat_ws(' ',
        transform(sequence(1, nw), i -> concat('w', CAST(
          exp(CAST(conv(substring(md5(concat(CAST(seed AS STRING), '-', CAST(i AS STRING))), 1, 6), 16, 10) AS DOUBLE)
              / 16777216.0 * $lnV) AS BIGINT))),
        CASE WHEN doc_id % 20 = 0 AND doc_id > 0 THEN 'marker0 marker1 marker2' ELSE '' END)""")
        .as("text"))
  }

  /** Planted pairs that genuinely verify at J ≥ tau — the O(n) truth. */
  private def plantedTruth(docs: DataFrame, sh: DataFrame, tau: Double)
      : DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val planted = docs
      .filter($"doc_id" % 20 === 0 && $"doc_id" > 0)
      .select(($"doc_id" - 1).as("a_id"), $"doc_id".as("b_id"))
    planted
      .join(sh.select($"doc_id".as("a_id"), $"shingles".as("sa")), "a_id")
      .join(sh.select($"doc_id".as("b_id"), $"shingles".as("sb")), "b_id")
      .filter((size(array_intersect($"sa", $"sb")).cast("double") /
        (size($"sa") + size($"sb") - size(array_intersect($"sa", $"sb"))))
        >= tau)
      .select($"a_id", $"b_id")
  }

  private def dedupZipf(spark: SparkSession): Unit = {
    import spark.implicits._
    for (n <- Seq(100000L, 300000L, 1000000L)) {
      val docs = zipfCorpus(spark, n)
      val sh = ScalingStudy.shingles(docs).localCheckpoint()

      // df profile: how much of the posting volume does the cap drop?
      val ex = sh.select($"doc_id", explode($"shingles").as("s"))
      val dfp = ex.groupBy($"s").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when($"df" > 50, 1L).otherwise(0L)).as("over_cap"),
          sum($"df").as("postings"),
          sum(when($"df" > 50, $"df").otherwise(0L)).as("postings_over"))
        .head()
      println(f"[r10-dedup] n=$n%-8d shingles=${dfp.getAs[Long]("n_shingles")}%-9d " +
        f"over_cap=${dfp.getAs[Long]("over_cap")}%-6d " +
        f"postings=${dfp.getAs[Long]("postings")}%-10d " +
        f"dropped_postings=${dfp.getAs[Long]("postings_over")}")

      val truth = plantedTruth(docs, sh, 0.6).localCheckpoint()
      val nTruth = truth.count()

      val t0 = System.nanoTime()
      val pairs = Dedup.jaccardPairs(sh, 0.6, maxShingleDf = Some(50L))
        .select($"a_id", $"b_id").localCheckpoint()
      val nPairs = pairs.count()
      val dt = (System.nanoTime() - t0) / 1e9
      val nHit = pairs.join(truth, Seq("a_id", "b_id"), "left_semi").count()
      println(f"[r10-dedup] n=$n%-8d capped_pairs=$nPairs%-7d ${dt}%.1fs " +
        f"plantedTruth=$nTruth plantedRecall=${nHit.toDouble / nTruth}%.4f")
      spark.catalog.clearCache() // jaccardPairs caches exRare + bounded
    }
  }

  private def minhash1M(spark: SparkSession): Unit = {
    import spark.implicits._
    val n = 1000000L
    val docs = ScalingStudy.corpus(spark, n)
    val sh = ScalingStudy.shingles(docs).localCheckpoint()
    val truth = plantedTruth(docs, sh, 0.6).localCheckpoint()
    val nTruth = truth.count()

    val t0 = System.nanoTime()
    val P = 2147483647L
    val as = Seq(1777L, 2203L, 3407L, 4001L, 5303L, 6121L, 7001L, 8011L)
    val bs = Seq(101L, 211L, 307L, 401L, 503L, 601L, 701L, 809L)
    val mh = (0 until 8).map(j =>
      expr(s"array_min(transform(shingles, h -> (pmod(h, $P) * ${as(j)} + ${bs(j)}) % $P))")
        .as(s"mh$j"))
    val sig = sh.select(col("doc_id") +: col("shingles") +: mh: _*)
    // 2×4 banding — the production config for low-entropy corpora
    // (round-6 sweep: ~unity precision, ~1% planted-recall loss)
    val cand = Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 7)).map { slots =>
      sig.as("x").join(sig.as("y"),
          slots.map(j => col(s"x.mh$j") === col(s"y.mh$j"))
            .reduce(_ && _) && $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
    }.reduce(_ union _).distinct().localCheckpoint()
    val nCand = cand.count()
    val shA = sh.select($"doc_id".as("a_id"), $"shingles".as("sa"))
    val shB = sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
    val conf = cand.join(shA, "a_id").join(shB, "b_id")
      .filter((size(array_intersect($"sa", $"sb")).cast("double") /
        (size($"sa") + size($"sb") - size(array_intersect($"sa", $"sb"))))
        >= 0.6)
      .select($"a_id", $"b_id").localCheckpoint()
    val nConf = conf.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val nHit = conf.join(truth, Seq("a_id", "b_id"), "left_semi").count()
    println(f"[r10-minhash] n=$n cand=$nCand confirmed=$nConf " +
      f"precision=${nConf.toDouble / math.max(nCand, 1)}%.4f " +
      f"plantedTruth=$nTruth plantedRecall=${nHit.toDouble / nTruth}%.4f ${dt}%.1fs")
    spark.catalog.clearCache()
  }

  private def lshOccupancy1M(spark: SparkSession): Unit = {
    import spark.implicits._
    val n = 1000000L
    for (planes <- Seq(8, 12)) {
      val e = LshOccupancyStudy.vectors(spark, n)
        .withColumn("bucket",
          graft.functions.VectorFunctions.lsh_bucket($"embedding", planes, 64))
        .localCheckpoint()
      val stats = e.groupBy($"bucket").count().agg(
        count(lit(1)).as("n_buckets"),
        avg($"count").as("mean_occ"),
        max($"count").as("max_occ"),
        sum($"count" * ($"count" - 1) / 2).as("cand_pairs")).head()
      println(f"[r10-lsh] n=$n planes=$planes " +
        f"buckets=${stats.getAs[Long]("n_buckets")}%-5d " +
        f"mean_occ=${stats.getAs[Double]("mean_occ")}%.1f " +
        f"expected=${n.toDouble / (1L << planes)}%.1f " +
        f"max_occ=${stats.getAs[Long]("max_occ")} " +
        f"cand_pairs=${stats.getAs[Long]("cand_pairs")}")
      val planted = e.filter($"vec_id" % 20 === 19)
        .select($"vec_id".as("dup_id"), $"base_id", $"bucket".as("db"))
        .join(e.select($"vec_id".as("base_id"), $"bucket".as("bb")), "base_id")
      val r = planted.agg(
        count(lit(1)).as("n_planted"),
        sum(when($"db" === $"bb", 1L).otherwise(0L)).as("hit1"),
        sum(when(bit_count($"db".bitwiseXOR($"bb")) <= 1, 1L).otherwise(0L))
          .as("hit_mp")).head()
      val np = r.getAs[Long]("n_planted")
      println(f"[r10-lsh] n=$n planes=$planes planted=$np " +
        f"recall_single=${r.getAs[Long]("hit1").toDouble / np}%.3f " +
        f"recall_mp=${r.getAs[Long]("hit_mp").toDouble / np}%.3f")
    }
  }

  /** The skew fix measured at the scale that motivated it: per-bucket
    * extension planes (`dd_embedding_lsh_bounded`'s blocking) vs the flat
    * 8-plane bucket at 1M vectors, for two capacity settings.
    */
  private def bounded1M(spark: SparkSession): Unit = {
    import spark.implicits._
    val n = 1000000L
    val e = LshOccupancyStudy.vectors(spark, n)
      .withColumn("b16",
        graft.functions.VectorFunctions.lsh_bucket($"embedding", 16, 64))
      .select($"vec_id", $"base_id",
        $"b16".bitwiseAND(lit(255L)).as("bucket"),
        shiftright($"b16", 8).as("ext"))
      .localCheckpoint()
    for (cap <- Seq(4096L, 1024L)) {
      val occ = e.groupBy($"bucket").agg(count(lit(1)).as("occ"))
      val kCol = (1 to 8).foldLeft(lit(0)) { (acc, k) =>
        when($"occ" > lit(cap << (k - 1)), lit(k)).otherwise(acc)
      }
      val refined = e.join(broadcast(occ.select($"bucket", kCol.as("k"))), "bucket")
        .select($"vec_id", $"base_id", $"bucket",
          expr("ext & (shiftleft(CAST(1 AS BIGINT), k) - 1)").as("sub"))
        .localCheckpoint()
      val stats = refined.groupBy($"bucket", $"sub").count().agg(
        count(lit(1)).as("n_blocks"),
        max($"count").as("max_occ"),
        sum($"count" * ($"count" - 1) / 2).as("cand_pairs")).head()
      val planted = refined.filter($"vec_id" % 20 === 19)
        .select($"vec_id".as("dup_id"), $"base_id",
          $"bucket".as("db"), $"sub".as("ds"))
        .join(refined.select($"vec_id".as("base_id"), $"bucket".as("bb"),
          $"sub".as("bs")), "base_id")
      val r = planted.agg(
        count(lit(1)).as("n_planted"),
        sum(when($"db" === $"bb" && $"ds" === $"bs", 1L).otherwise(0L))
          .as("hit")).head()
      val np = r.getAs[Long]("n_planted")
      println(f"[r10-bounded] n=$n cap=$cap blocks=${stats.getAs[Long]("n_blocks")}%-5d " +
        f"max_occ=${stats.getAs[Long]("max_occ")} " +
        f"cand_pairs=${stats.getAs[Long]("cand_pairs")} " +
        f"recall_single=${r.getAs[Long]("hit").toDouble / np}%.3f")
    }
  }

  private def ivfpq1M(spark: SparkSession): Unit = {
    import spark.implicits._
    for (n <- Seq(100000L, 1000000L)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-r10-ivfpq-$n").toString
      val sfDir = s"$root/sf"
      val indexDir = s"$root/ix"
      LshOccupancyStudy.vectors(spark, n)
        .select($"vec_id", $"embedding")
        .write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")

      var t0 = System.nanoTime()
      val rep = VectorIndexPipeline.writeIvfPq(spark, sfDir, indexDir)
      val tBuild = (System.nanoTime() - t0) / 1e9

      t0 = System.nanoTime()
      val served = VectorIndexPipeline
        .serveIvfPq(spark, indexDir, sfDir, serveAll = false, nprobe = 1)
        .count()
      val tServe = (System.nanoTime() - t0) / 1e9
      println(f"[r10-ivfpq] n=$n%-8d build=${tBuild}%.1fs " +
        f"cells=${rep.nCells} maxCellRows=${rep.maxCellRows} " +
        f"serve_probe1=${tServe}%.1fs served_rows=$served")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(root))
      spark.catalog.clearCache() // writeIvfPq caches cells + centroids
    }
  }

  /** Exact-rerank marginal cost at scale: time the plain ADC top-3 serve
    * vs the top-10-shortlist + exact-cosine rerank ([[Similarity
    * .ivfPqRerank]]) over the same corpus. The refinement touches
    * |queries|×10 raw vectors via one broadcast join against the store,
    * so its marginal cost must stay a small constant share of the serve
    * as n grows 10× — that is the claim this part measures.
    */
  private def rerank1M(spark: SparkSession): Unit = {
    import spark.implicits._
    for (n <- Seq(100000L, 1000000L)) {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-r10-rr-$n").toString
      val sfDir = s"$root/sf"
      LshOccupancyStudy.vectors(spark, n)
        .select($"vec_id", $"embedding")
        .write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")
      // untimed warmup: the first serve of an iteration pays whole-stage
      // codegen + JIT for the shared 64-dim expression trees (measured
      // ~30s, constant in n — it dwarfed the data cost and made the
      // first-timed query look 3x slower than the second)
      Similarity.ivfPqTopK.build(spark, sfDir).count()
      spark.catalog.clearCache()
      var t0 = System.nanoTime()
      val adcRows = Similarity.ivfPqTopK.build(spark, sfDir).count()
      val tAdc = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t0 = System.nanoTime()
      val rrRows = Similarity.ivfPqRerank.build(spark, sfDir).count()
      val tRr = (System.nanoTime() - t0) / 1e9
      println(f"[r10-rerank] n=$n%-8d adc_top3=${tAdc}%.1fs ($adcRows rows) " +
        f"rerank_top3=${tRr}%.1fs ($rrRows rows) marginal=${tRr - tAdc}%.1fs")
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(root))
      spark.catalog.clearCache()
    }
  }

  /** Streaming vector-index ingestion at scale: base on 100k vectors,
    * then 18 batches of 50k appended through the same appendVectors call
    * the file stream delegates to 1:1, timing each. The claim under
    * test: per-batch cost is O(batch) — coding is a narrow pass against
    * the broadcast stored quantizer and the manifest write touches only
    * the batch's own partition — so latency stays FLAT as the index
    * grows 10×, with one amortized O(index) spike at the FoldEvery-th
    * append (the auto-rebuild).
    */
  private def vectorIngest1M(spark: SparkSession): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-r10-vi").toString
    val sfDir = s"$root/sf"
    val indexDir = s"$root/ix"
    val all = LshOccupancyStudy.vectors(spark, 1000000L)
      .select($"vec_id", $"embedding")
    all.filter($"vec_id" < 100000L)
      .write.mode("overwrite").parquet(s"$sfDir/embeddings.parquet")
    graft.pipeline.VectorIndexPipeline.writeIvfPq(spark, sfDir, indexDir)
    val times = (1 to 18).map { i =>
      val lo = 100000L + (i - 1) * 50000L
      val batch = all.filter($"vec_id" >= lo && $"vec_id" < lo + 50000L)
        .localCheckpoint()
      val t0 = System.nanoTime()
      graft.pipeline.VectorIndexPipeline
        .appendVectors(spark, indexDir, batch, i.toString)
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[r10-vingest] batch=$i%-3d rows=50000 t=${t}%.1fs " +
        f"(index now ${100000L + i * 50000L} vectors)")
      t
    }
    val fold = times(15) // batch 16 trips MaxCodeBatches=16 and folds
    val steady = times.zipWithIndex.filterNot(_._2 == 15).map(_._1)
    println(f"[r10-vingest] steady first3=${steady.take(3).sum / 3}%.1fs " +
      f"last3=${steady.takeRight(3).sum / 3}%.1fs fold16=${fold}%.1fs")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val parts = if (args.isEmpty)
      Seq("dedup", "minhash", "lsh", "bounded", "ivfpq", "rerank", "vingest")
    else args.toSeq
    parts.foreach {
      case "dedup"   => dedupZipf(spark)
      case "minhash" => minhash1M(spark)
      case "lsh"     => lshOccupancy1M(spark)
      case "bounded" => bounded1M(spark)
      case "ivfpq"   => ivfpq1M(spark)
      case "rerank"  => rerank1M(spark)
      case "vingest" => vectorIngest1M(spark)
      case other     => println(s"[r10] unknown part: $other")
    }
    spark.stop()
  }
}
