package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-13 scaling study for the exact-substring dedup at a length
  * threshold (`dd_dup_substrings`, `Dedup.dupSpanDf(n = 8)`):
  *
  *   sbt "Test/runMain graft.operators.SubstrDedupStudyR13"
  *
  * Claims measured, on a deterministic planted corpus at 100k / 300k /
  * 1M docs (10× end-to-end):
  *
  * 1. **Exactness at every tier**: each planted pair shares one 12-token
  *    run (≥ threshold → must be flagged, exact bounds) and one 6-token
  *    run (< threshold → must NOT be flagged). The study asserts the
  *    span set is exactly the planted truth — no approximation creeps in
  *    as the corpus grows.
  * 2. **Near-linear cost**: every shuffle key is the n-gram hash or the
  *    doc_id, so k× docs should cost ≈k× — each ~3.16× tier step is
  *    asserted ≤ 1.3 × the row growth (superlinearity would betray an
  *    accidental pairwise stage or a skew collapse).
  * 3. **Gram-length-independent shuffle**: grams cross the shuffle as
  *    64-bit hashes (see dupSpanDf), so the 8-gram run's total shuffle
  *    write must not exceed the 4-gram run's (slightly fewer gram
  *    instances per doc, identical 8-byte keys) — measured from task
  *    metrics at the 100k tier. The text-keyed form failed this by
  *    1.4× (longer keys), which is what motivated the hashing.
  *
  * Corpus is md5/hash-derived, no RNG: reruns are bit-identical.
  * Results feed SCALE.md §"Round-13 substring-dedup tiers".
  */
object SubstrDedupStudyR13 {

  /** n docs (n % 10 == 0), ~30 tokens each over a 50k synthetic vocab.
    * Ids with id%10 ∈ {0,1} form pairs sharing a 12-token run and a
    * 6-token run (both keyed on the pair id g = id div 10, positions
    * fixed); all other tokens are id-salted and effectively unique.
    */
  private[operators] def corpus(spark: SparkSession, n: Long,
      dir: String): Unit = {
    val uniq = (salt: Int, k: Int) =>
      (0 until k).map(i => s"concat('u', abs(hash(id * 131 + $salt * 17 + $i)) % 50000, '_', id, '_', $i)")
        .mkString("concat_ws(' ', ", ", ", ")")
    val planted = (tag: String, k: Int) =>
      (0 until k).map(i => s"concat('$tag', g, '_', $i)")
        .mkString("concat_ws(' ', ", ", ", ")")
    spark.range(n)
      .selectExpr("id", "id div 10 AS g")
      .selectExpr("id",
        s"""CASE WHEN id % 10 <= 1 THEN
              concat_ws(' ', ${uniq(1, 4)}, ${planted("p", 12)},
                             ${uniq(2, 3)}, ${planted("q", 6)}, ${uniq(3, 5)})
            ELSE ${uniq(4, 30)} END AS text""")
      .selectExpr("id AS doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  /** Long-doc variant for the PRODUCTION threshold (the published
    * ExactSubstr recipe removes ≥ ~50-token duplicated substrings, Lee
    * et al. 2022 §3): 102 tokens per doc; pair docs (id%10 ∈ {0,1})
    * share a 60-token run at positions [4, 63] (≥ 50 → must be flagged
    * with exact bounds) and a 30-token run at [67, 96] (< 50 → must be
    * invisible: no 50-gram fits inside it, and every straddling gram
    * contains id-salted tokens unique to one doc).
    */
  private[operators] def corpusLong(spark: SparkSession, n: Long,
      dir: String): Unit = {
    val uniq = (salt: Int, k: Int) =>
      (0 until k).map(i => s"concat('u', abs(hash(id * 131 + $salt * 17 + $i)) % 50000, '_', id, '_', $i)")
        .mkString("concat_ws(' ', ", ", ", ")")
    val planted = (tag: String, k: Int) =>
      (0 until k).map(i => s"concat('$tag', g, '_', $i)")
        .mkString("concat_ws(' ', ", ", ", ")")
    spark.range(n)
      .selectExpr("id", "id div 10 AS g")
      .selectExpr("id",
        s"""CASE WHEN id % 10 <= 1 THEN
              concat_ws(' ', ${uniq(1, 4)}, ${planted("P", 60)},
                             ${uniq(2, 3)}, ${planted("Q", 30)}, ${uniq(3, 5)})
            ELSE ${uniq(4, 102)} END AS text""")
      .selectExpr("id AS doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private class WriteProbe extends SparkListener {
    val bytes = new java.util.concurrent.atomic.LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  /** Materialize spans at gram length n; returns (best-of-2 seconds,
    * spans df). Two passes for the same reason graft.Bench runs the
    * suite twice: single-pass wall times on this host have repeatedly
    * shown 3× noise spikes (SCALE.md §round-12 re-measure), and a curve
    * assertion must not trip on one slow pass.
    */
  private def timed(spark: SparkSession, dir: String, n: Int)
      : (Double, DataFrame) = {
    val df = Dedup.dupSpanDf(spark, dir, n)
    val secs = (1 to 2).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    (secs.min, df)
  }

  private def shuffleBytes(spark: SparkSession, dir: String, n: Int): Long = {
    val probe = new WriteProbe
    spark.sparkContext.addSparkListener(probe)
    Dedup.dupSpanDf(spark, dir, n)
      .write.format("noop").mode("overwrite").save()
    // settle the async listener bus before detaching
    val cur = graft.TestMetrics.settle(() => probe.bytes.sum())
    spark.sparkContext.removeSparkListener(probe)
    cur
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("substr13")

    // warmup (JIT + codegen) on a throwaway tier
    corpus(spark, 20000L, s"$base/warm"); timed(spark, s"$base/warm", 8)

    val tiers = Seq(100000L, 316000L, 1000000L)
    val times = tiers.map { n =>
      val dir = s"$base/t$n"
      val nn = n / 10 * 10 // exact pair bookkeeping
      corpus(spark, nn, dir)
      val (sec, df) = timed(spark, dir, 8)
      val spans = df.collect()
      // exactness: one 12-token span per pair doc at tokens [4, 15],
      // nothing else (the 6-token plant must be invisible at n=8)
      assert(spans.length == (nn / 10 * 2).toInt,
        s"tier $nn: ${spans.length} spans, expected ${nn / 10 * 2}")
      assert(spans.forall { r =>
        r.getLong(1) == 4L && r.getLong(2) == 15L && r.getLong(3) == 12L
      }, s"tier $nn: off-truth span among ${spans.take(3).mkString(";")}")
      println(f"tier n=$nn%8d  spans=${spans.length}%7d  time=$sec%7.2f s")
      sec
    }
    times.sliding(2).zip(tiers.sliding(2)).foreach {
      case (Seq(a, b), Seq(na, nb)) =>
        val ratio = b / a
        val rows = nb.toDouble / na
        println(f"tier ${na} -> ${nb}: time x$ratio%.2f (rows x$rows%.2f)")
        assert(ratio < rows * 1.3,
          f"superlinear tier step: time x$ratio%.2f for a rows x$rows%.1f tier")
      case _ => ()
    }

    // threshold grams vs marking grams: shuffle volume at the 100k tier
    val d100 = s"$base/t100000"
    val sh8 = shuffleBytes(spark, d100, 8)
    val sh4 = shuffleBytes(spark, d100, 4)
    println(f"shuffle @100k: n=8 ${sh8 / 1048576.0}%.1f MiB   n=4 ${sh4 / 1048576.0}%.1f MiB")
    assert(sh8 <= sh4,
      s"threshold grams shuffled MORE than marking grams: $sh8 > $sh4")

    // production threshold N=50 (round-14): same exactness discipline on
    // the long-doc corpus, plus the SCALE.md slope claim extended to the
    // published recipe's threshold — with 8-byte hashed keys, shuffle
    // DECREASES as the gram lengthens (53 gram instances/doc at n=50 vs
    // 95 at n=8 on identical 102-token docs), where text keys would grow
    // it ~6× instead.
    val dLong = s"$base/long100k"
    corpusLong(spark, 100000L, dLong)
    val (sec50, df50) = timed(spark, dLong, 50)
    val spans50 = df50.collect()
    assert(spans50.length == 100000 / 10 * 2,
      s"n=50 tier: ${spans50.length} spans, expected ${100000 / 10 * 2}")
    assert(spans50.forall { r =>
      r.getLong(1) == 4L && r.getLong(2) == 63L && r.getLong(3) == 60L
    }, s"n=50 tier: off-truth span among ${spans50.take(3).mkString(";")}")
    println(f"tier n=100000 (102-token docs, N=50)  spans=${spans50.length}%7d  time=$sec50%7.2f s")
    val sh50 = shuffleBytes(spark, dLong, 50)
    val sh8Long = shuffleBytes(spark, dLong, 8)
    println(f"shuffle @100k long docs: n=50 ${sh50 / 1048576.0}%.1f MiB   n=8 ${sh8Long / 1048576.0}%.1f MiB")
    assert(sh50 <= sh8Long,
      s"production-threshold grams shuffled MORE than n=8 grams: $sh50 > $sh8Long")
    spark.stop()
  }
}
