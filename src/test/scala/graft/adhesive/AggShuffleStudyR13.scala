package graft.adhesive

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-13 extension of [[AggShuffleStudyR12]], per the round-12 verdict
  * (#6): one order of magnitude more rows on the ARRAY-state axis, and
  * MAP state (token counting) added to the measured matrix.
  *
  *   sbt "Test/runMain graft.adhesive.AggShuffleStudyR13"
  *
  * Claims, measured from the partial-aggregation stage's shuffle WRITE:
  *
  * 1. **ARRAY-state flatness extends to 20M rows**: r12 showed rows ×4
  *    (500k→2M) leaves shuffle ≈flat; this study pushes rows ×10 past
  *    that ceiling (2M→20M, ~10 GB logical input) at fixed groups — the
  *    shuffle must STILL be ≈flat (asserted < 1.5×), because partials
  *    absorb rows before the exchange no matter how many there are.
  * 2. **MAP-state shuffle tracks STATE SIZE, not rows**: per-group token
  *    counting over a V-word vocabulary shuffles
  *    `tasks × groups × min(rowsSeen, ~V) entries` — rows-independent
  *    only once each (task, group) cell SATURATES its vocabulary
  *    (rowsPerCell ≫ V). The operating point here puts every cell well
  *    past saturation (≈16 appearances per word), where the claims are
  *    clean: rows ×4 at fixed vocab → ≈flat (asserted < 1.5×); vocab ×4
  *    at fixed rows → ≈×4 (asserted > 2.5×). Below saturation the
  *    shuffle grows with DISTINCT tokens seen per cell (measured ×1.74
  *    for rows ×4 at half-coverage before this point was fixed) — at
  *    100 TB any real corpus is deep into the saturated regime, where
  *    the exchange carries one vocabulary histogram per (task, group),
  *    never the corpus.
  *
  * Results feed SCALE.md §"Round-13 aggregate-state shuffle volume".
  */
object AggShuffleStudyR13 {

  private val Dim = 64

  private class WriteProbe extends SparkListener {
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        perStage.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.atomic.LongAdder())
          .add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
  }

  /** Max-stage shuffle-write bytes of `sql` (the partial-agg map stage
    * dominates), with the listener-bus settle from the r12 study.
    */
  private def measure(spark: SparkSession, sql: String, expectRows: Int): Long = {
    val probe = new WriteProbe
    spark.sparkContext.addSparkListener(probe)
    val out = spark.sql(sql).collect()
    def total(): Long = scala.jdk.CollectionConverters
      .CollectionHasAsScala(probe.perStage.values()).asScala.map(_.sum()).sum
    val cur = graft.TestMetrics.settle(() => total())
    spark.sparkContext.removeSparkListener(probe)
    assert(out.length == expectRows)
    scala.jdk.CollectionConverters
      .CollectionHasAsScala(probe.perStage.values()).asScala.map(_.sum()).max
  }

  private def vectorRun(spark: SparkSession, rows: Long, groups: Int): Long = {
    spark.range(0, rows, 1, 32)
      .selectExpr(s"id % $groups AS k",
        s"transform(sequence(1, $Dim), i -> CAST(id + i AS DOUBLE)) AS v")
      .createOrReplaceTempView("t_vs13")
    measure(spark, "SELECT k, vsum13(v) AS s FROM t_vs13 GROUP BY k", groups)
  }

  private def mapRun(spark: SparkSession, rows: Long, groups: Int,
      vocab: Int): Long = {
    spark.range(0, rows, 1, 32)
      .selectExpr(s"id % $groups AS k",
        s"concat('w', abs(hash(id)) % $vocab) AS tok")
      .createOrReplaceTempView("t_tc13")
    measure(spark, "SELECT k, tokc13(tok) AS m FROM t_tc13 GROUP BY k", groups)
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
    AdhesiveDdl.execute(spark, TestAggregates.vectorSumDdl("vsum13"))
    AdhesiveDdl.execute(spark, TestAggregates.tokenCountsDdl("tokc13"))
    def mb(b: Long): String = f"${b / 1048576.0}%.2f MiB"

    // warm both folds
    vectorRun(spark, 100000L, 64); mapRun(spark, 100000L, 64, 100)

    println("== AggShuffleStudyR13 ==")
    // 1. ARRAY state, one order of magnitude past r12's 2M ceiling
    val v2m = vectorRun(spark, 2000000L, 256)
    val v20m = vectorRun(spark, 20000000L, 256)
    println(f"ARRAY  rows=2M   groups=256: shuffle ${mb(v2m)}")
    println(f"ARRAY  rows=20M  groups=256: shuffle ${mb(v20m)}  " +
      f"(rows x10 -> shuffle x${v20m.toDouble / v2m}%.2f)")
    assert(v20m < v2m * 1.5,
      s"ARRAY-state shuffle grew with rows at the 20M tier: $v2m -> $v20m")

    // 2. MAP state: rows-flat, vocab-linear — in the SATURATED regime
    // (rows per (task, group) cell >> vocab; see the scaladoc)
    val mBase = mapRun(spark, 4000000L, 32, 250)
    val mRows4 = mapRun(spark, 16000000L, 32, 250)
    val mVocab4 = mapRun(spark, 4000000L, 32, 1000)
    println(f"MAP    rows=4M   vocab=250 : shuffle ${mb(mBase)}")
    println(f"MAP    rows=16M  vocab=250 : shuffle ${mb(mRows4)}  " +
      f"(rows x4 -> shuffle x${mRows4.toDouble / mBase}%.2f)")
    println(f"MAP    rows=4M   vocab=1000: shuffle ${mb(mVocab4)}  " +
      f"(vocab x4 -> shuffle x${mVocab4.toDouble / mBase}%.2f)")
    assert(mRows4 < mBase * 1.5,
      s"MAP-state shuffle grew with rows: $mBase -> $mRows4")
    assert(mVocab4 > mBase * 2.5,
      s"MAP-state shuffle did not track state size: $mBase -> $mVocab4")
    spark.stop()
  }
}
