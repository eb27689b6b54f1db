package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scope scaling driver: sbt "Test/runMain graft.operators.ScalingStudy"
  *
  * Generates tiny-vocabulary corpora of 5k/20k/100k documents
  * DETERMINISTICALLY (md5-derived word choices — no RNG, so runs are
  * reproducible) with a planted ~5% near-dup rate, and times the near-dup
  * pair finders against each other:
  *
  *   - capped+bounded shingle join (`jaccardPairs`, df cap 50)
  *   - prefix-filtered exact join (`jaccardPairsPrefix`) — expected to
  *     degenerate on tiny vocabularies (prefixes stay high-df), measured
  *     at the smaller sizes only
  *
  * Pair counts are printed so method agreement is visible alongside time.
  * Results feed SCALE.md §Dedup.
  */
object ScalingStudy {

  private val Vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "spark", "line",
    "sort", "window", "order", "data", "column", "join", "small", "query",
    "customer", "big", "group", "stream", "filter", "vector", "the", "a",
    "of")

  /** words per doc in [40, 79], word picks md5-derived from (id, i). */
  private[graft] def corpus(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val vocabArr = s"array(${Vocab.map(w => s"'$w'").mkString(",")})"
    val base = spark.range(n).select($"id".as("doc_id"))
      // near-dup structure: ids divisible by 20 re-generate from id-1's
      // seed, so they share all but the appended marker word
      .withColumn("seed",
        when($"doc_id" % 20 === 0 && $"doc_id" > 0, $"doc_id" - 1)
          .otherwise($"doc_id"))
      .withColumn("nw",
        (expr("CAST(conv(substring(md5(CAST(seed AS STRING)), 1, 6), 16, 10) AS BIGINT)") % 40 + 40))
    base.select($"doc_id",
      expr(s"""concat_ws(' ',
        transform(sequence(1, nw), i -> element_at($vocabArr,
          CAST(CAST(conv(substring(md5(concat(CAST(seed AS STRING), '-', CAST(i AS STRING))), 1, 6), 16, 10) AS BIGINT) % ${Vocab.size} + 1 AS INT))),
        CASE WHEN doc_id % 20 = 0 AND doc_id > 0 THEN 'marker' ELSE '' END)""")
        .as("text"))
  }

  private[graft] def shingles(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs.repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", split(trim($"text"), " ").as("w"))
      .filter(size($"w") >= 3)
      .select($"doc_id", expr(
        "transform(array_distinct(transform(sequence(0, size(w)-3), " +
          "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))), s -> xxhash64(s))")
        .as("shingles"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- Seq(5000L, 20000L, 100000L)) {
      val sh = shingles(corpus(spark, n)).cache()
      sh.count() // materialize generation outside the timed region

      var t0 = System.nanoTime()
      val capped = Dedup.jaccardPairs(sh, 0.6, maxShingleDf = Some(50L))
        .count()
      val tCap = (System.nanoTime() - t0) / 1e9

      val tPre = if (n <= 20000L) {
        t0 = System.nanoTime()
        val p = Dedup.jaccardPairsPrefix(sh, 3L, 5L).count()
        val dt = (System.nanoTime() - t0) / 1e9
        f"prefix=$p%-6d ${dt}%.1fs"
      } else "prefix=skipped (degenerate regime)"

      // MinHash LSH (8 perms, 4 bands of 2) + exact verification — the
      // sketch path that keeps working when every shingle is high-df
      t0 = System.nanoTime()
      val P = 2147483647L
      val as = Seq(1777L, 2203L, 3407L, 4001L, 5303L, 6121L, 7001L, 8011L)
      val bs = Seq(101L, 211L, 307L, 401L, 503L, 601L, 701L, 809L)
      val mh = (0 until 8).map(j =>
        expr(s"array_min(transform(shingles, h -> (pmod(h, $P) * ${as(j)} + ${bs(j)}) % $P))")
          .as(s"mh$j"))
      val sig = sh.select(col("doc_id") +: col("shingles") +: mh: _*)
      val banded = sig.select($"doc_id", $"shingles", posexplode(array(
        (0 until 4).map(b => struct(col(s"mh${2 * b}").as("lo"),
          col(s"mh${2 * b + 1}").as("hi"))): _*))
        .as(Seq("band", "bkey")))
      val cands = banded.as("x").join(banded.as("y"),
          $"x.band" === $"y.band" && $"x.bkey" === $"y.bkey" &&
            $"x.doc_id" < $"y.doc_id")
        .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"),
          $"x.shingles".as("sa"), $"y.shingles".as("sb"))
        .distinct()
      val lsh = cands
        .select($"a_id", $"b_id",
          (size(array_intersect($"sa", $"sb")).cast("double") /
            (size($"sa") + size($"sb") - size(array_intersect($"sa", $"sb"))))
            .as("j"))
        .filter($"j" >= 0.6).count()
      val tLsh = (System.nanoTime() - t0) / 1e9

      println(f"[study] n=$n%-7d capped=$capped%-6d ${tCap}%.1fs  lsh=$lsh%-6d ${tLsh}%.1fs  $tPre")

      // Banding sweep at every size (dd_lsh_band_sweep's 2 configs):
      // candidate volume, confirmed (J >= 0.6) pairs, and precision /
      // planted-truth recall — the readout SCALE.md's production banding
      // rule is based on. Truth = the planted (id-1, id) near-dup pairs
      // that genuinely verify at J >= 0.6 (computable in O(n), unlike
      // the all-pairs truth).
      val planted = corpus(spark, n)
        .filter($"doc_id" % 20 === 0 && $"doc_id" > 0)
        .select(($"doc_id" - 1).as("a_id"), $"doc_id".as("b_id"))
      val shA = sh.select($"doc_id".as("a_id"), $"shingles".as("sa"))
      val shB = sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
      def verified(pairs: DataFrame): DataFrame = pairs
        .join(shA, "a_id").join(shB, "b_id")
        .filter((size(array_intersect($"sa", $"sb")).cast("double") /
          (size($"sa") + size($"sb") - size(array_intersect($"sa", $"sb"))))
          >= 0.6)
        .select($"a_id", $"b_id")
      val truth = verified(planted).cache()
      val nTruth = truth.count()
      for ((name, bands) <- Seq(
          "4x2" -> Seq(Seq(0, 1), Seq(2, 3), Seq(4, 5), Seq(6, 7)),
          "2x4" -> Seq(Seq(0, 1, 2, 3), Seq(4, 5, 6, 7)))) {
        val t1 = System.nanoTime()
        val cand = bands.map { slots =>
          sig.as("x").join(sig.as("y"),
              slots.map(j => col(s"x.mh$j") === col(s"y.mh$j"))
                .reduce(_ && _) && $"x.doc_id" < $"y.doc_id")
            .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
        }.reduce(_ union _).distinct().cache()
        val nCand = cand.count()
        val nConf = verified(cand).count()
        val nHit = cand.join(truth, Seq("a_id", "b_id"), "left_semi").count()
        val dt = (System.nanoTime() - t1) / 1e9
        val prec = if (nCand > 0) nConf.toDouble / nCand else 1.0
        val rec = if (nTruth > 0) nHit.toDouble / nTruth else 1.0
        println(f"[sweep] n=$n%-7d config=$name cand=$nCand%-8d confirmed=$nConf%-6d " +
          f"precision=$prec%.4f plantedTruth=$nTruth plantedRecall=$rec%.4f ${dt}%.1fs")
        cand.unpersist(true)
      }
      truth.unpersist(true)
      sh.unpersist(true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
