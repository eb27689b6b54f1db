package graft.operators

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 planted-skew study for the Zipf-keyed `bg ⋈ model` join in
  * `ta_bigram_lm` (VERDICT r10, "Next round" #4): hot bigrams concentrate
  * in few shuffle partitions, and at 100 TB the model is NOT
  * broadcastable, so the scale-safe plan is a shuffle join whose hot
  * partitions AQE's skew-join splitting must absorb. This study PLANTS
  * the skew at two intensities, forbids broadcast (the 100 TB shape), and
  * measures the join stage's per-task spread with
  * `spark.sql.adaptive.skewJoin.enabled` off vs on:
  *
  *   sbt "Test/runMain graft.operators.SkewStudyR11"
  *
  * The two regimes matter because AQE's skew detection is BYTES-based on
  * COMPRESSED map output, and a hot bigram's rows are near-identical —
  * they compress several times harder than the diverse cold keys:
  *
  *   - **moderate** (hot key ≈ 25% of rows, a strong natural-corpus
  *     Zipf head): the 10× row skew deflates to ≈ 2× in compressed
  *     bytes — UNDER the 5× skewedPartitionFactor, so AQE stays dormant
  *     by design; the measured task-time spread is bounded by the same
  *     ≈ 2× and there is no straggler catastrophe to fix.
  *   - **extreme** (hot key ≈ 70% of rows, the adversarial case): the
  *     row skew survives compression, AQE splits the hot partition
  *     (`skew=true` in the final plan, more join tasks than the static
  *     32), and the join-stage max-task time drops accordingly.
  *
  * Engagement is asserted structurally in the extreme regime; dormancy
  * and its bounded spread are asserted in the moderate one. Thresholds
  * are lowered proportionally to the MB-sized corpus (production has
  * GBs); the trip RATIO (hot/median compressed bytes vs factor 5) is the
  * scale-invariant part. Results feed SCALE.md §"Round-11 planted-skew
  * study". The measured pipeline is [[TextAnalysis.bigramLmScore]] — the
  * same code the oracled entry runs, not a replica.
  */
object SkewStudyR11 {

  /** nDocs docs of `nw` words each: each token is the single hot word
    * `h` with probability pPct/100, else Zipf-ish over 5000 synthetic
    * words — so the hot bigram "h h" is ≈ (pPct/100)² of all bigrams.
    * md5-derived, deterministic.
    */
  private[graft] def skewCorpus(spark: SparkSession, nDocs: Long,
      pPct: Int, nw: Int = 40): DataFrame = {
    import spark.implicits._
    spark.range(nDocs).select($"id".as("doc_id"))
      .select($"doc_id", expr(s"""concat_ws(' ',
        transform(sequence(1, $nw), i -> CASE
          WHEN CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '-', CAST(i AS STRING))), 1, 6), 16, 10) AS BIGINT) % 100 < $pPct
          THEN 'h'
          ELSE concat('w', CAST(CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '-', CAST(i AS STRING))), 7, 6), 16, 10) AS BIGINT) % 5000 AS STRING))
        END))""").as("text"))
  }

  private case class TaskRow(stageId: Int, durationMs: Long, shuffleRead: Long)

  private class Probe extends SparkListener {
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[TaskRow]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        rows.add(TaskRow(t.stageId, t.taskMetrics.executorRunTime,
          t.taskMetrics.shuffleReadMetrics.totalBytesRead))
      }
  }

  private case class RunStats(wallMs: Long, nTasks: Int, medB: Long,
      maxB: Long, medT: Long, maxT: Long, skewMarked: Boolean) {
    def line: String =
      f"tasks=$nTasks%d shuffleRead med/max=$medB%d/$maxB%d B " +
        f"(x${maxB.toDouble / math.max(medB, 1)}%.1f) " +
        f"taskTime med/max=$medT%d/$maxT%d ms " +
        f"(x${maxT.toDouble / math.max(medT, 1)}%.1f) " +
        s"wall=${wallMs}ms planSkewSplit=$skewMarked"
  }

  private def run(spark: SparkSession, bg: DataFrame, skewOn: Boolean)
      : RunStats = {
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)
    val t0 = System.nanoTime()
    val df = TextAnalysis.bigramLmScore(bg)
    // collect() drives df's OWN QueryExecution, so executedPlan below is
    // the adaptively-finalized plan of the measured query (count() would
    // plan and execute a different QueryExecution)
    val n = df.collect().length
    val wallMs = (System.nanoTime() - t0) / 1000000
    spark.sparkContext.removeSparkListener(probe)
    assert(n > 0)
    val skewMarked =
      df.queryExecution.executedPlan.toString.contains("skew=true")
    // the join stage = the stage containing the hottest single task (the
    // skewed partition); total-read would pick the uniform doc_id agg
    val all = scala.jdk.CollectionConverters
      .CollectionHasAsScala(probe.rows).asScala.toSeq
    val ts = all.groupBy(_.stageId).maxBy(_._2.map(_.shuffleRead).max)._2
    def medMax(xs: Seq[Long]): (Long, Long) = {
      val s = xs.sorted
      (s(s.length / 2), s.last)
    }
    val (medB, maxB) = medMax(ts.map(_.shuffleRead))
    val (medT, maxT) = medMax(ts.map(_.durationMs))
    RunStats(wallMs, ts.length, medB, maxB, medT, maxT, skewMarked)
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 100000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the 100 TB shape: the model does NOT broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // thresholds scaled to the MB-sized test corpus; the trip RATIO
      // (hot/median > skewedPartitionFactor=5) is what production shares
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      // coalescing would merge the tiny cold partitions and muddy the
      // per-task spread readout; disabled so both runs compare like
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for ((regime, pPct) <- Seq(("moderate", 50), ("extreme", 85))) {
      val bg = TextAnalysis.bigramFrame(skewCorpus(spark, nDocs, pPct))
        .cache()
      val total = bg.count()
      val hot = bg.filter($"bg" === "h h").count()
      println(f"== SkewStudyR11 [$regime]: nDocs=$nDocs bigrams=$total " +
        f"hotShare=${hot.toDouble / total}%.3f ==")
      // warm once per regime (cache + JIT), then measure
      run(spark, bg, skewOn = false)
      val off = run(spark, bg, skewOn = false)
      val on = run(spark, bg, skewOn = true)
      println(s"  skewJoin=off ${off.line}")
      println(s"  skewJoin=on  ${on.line}")
      assert(!off.skewMarked)
      if (regime == "extreme") {
        assert(on.skewMarked,
          "AQE must split the hot partition in the extreme regime")
        assert(on.nTasks > off.nTasks,
          s"skew split must add join tasks: ${on.nTasks} vs ${off.nTasks}")
      } else {
        // moderate repetitive skew deflates under compression below the
        // 5x factor: AQE stays dormant AND the byte spread is bounded
        assert(!on.skewMarked,
          "compression-deflated moderate skew should stay under the factor")
        assert(on.maxB.toDouble / math.max(on.medB, 1) < 4.0,
          "moderate-regime byte spread should be bounded")
      }
      bg.unpersist(blocking = true)
    }
    spark.stop()
  }
}
