package graft.adhesive

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-12 shuffle-volume study for dynamic AGGREGATE UDFs with container
  * state — the scale claim behind `CREATE AGGREGATE FUNCTION ... STATE
  * ARRAY<DOUBLE>` (an element-wise vector sum, the embedding-pipeline
  * fold): because the data path is a typed `Aggregator` planned with
  * map-side partial aggregation, the bytes crossing the shuffle are
  * `#mapTasks × #groupsPerTask × sizeof(STATE)` — INDEPENDENT of the input
  * row count. At 100 TB that is the difference between shuffling terabytes
  * of rows and shuffling megabytes of per-group vector partials.
  *
  *   sbt "Test/runMain graft.adhesive.AggShuffleStudyR12"
  *
  * Two axes, measured from the map stage's shuffle WRITE bytes:
  *   - rows 4× at fixed groups → shuffle bytes must stay ≈ flat
  *     (partials absorb the extra rows before the exchange);
  *   - groups 32× at fixed rows → shuffle bytes must grow ≈ linearly in
  *     groups (each map task emits one vector per group it saw).
  *
  * Results feed SCALE.md §"Round-12 aggregate-state shuffle volume".
  */
object AggShuffleStudyR12 {

  private val Dim = 64

  // the same fold AggregateDdlSpec proves correct — shared source of truth
  private val VSumDdl = TestAggregates.vectorSumDdl("vsum_study")

  private class WriteProbe extends SparkListener {
    val perStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.LongAdder]()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) {
        perStage.computeIfAbsent(t.stageId,
          _ => new java.util.concurrent.atomic.LongAdder())
          .add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
  }

  /** Run the grouped vector-sum over `rows` synthetic vectors in `groups`
    * groups; returns the map stage's total shuffle-write bytes.
    */
  private def run(spark: SparkSession, rows: Long, groups: Int): Long = {
    spark.range(0, rows, 1, 32)
      .selectExpr(s"id % $groups AS k",
        s"transform(sequence(1, $Dim), i -> CAST(id + i AS DOUBLE)) AS v")
      .createOrReplaceTempView("t_vs")
    val probe = new WriteProbe
    spark.sparkContext.addSparkListener(probe)
    val out = spark.sql("SELECT k, vsum_study(v) AS s FROM t_vs GROUP BY k")
      .collect()
    // TaskEnd events arrive on an async listener bus: settle until two
    // consecutive reads agree before detaching, or a lagging queue
    // undercounts the measurement and spuriously trips the assertions
    def total(): Long = scala.jdk.CollectionConverters
      .CollectionHasAsScala(probe.perStage.values()).asScala.map(_.sum()).sum
    val cur = graft.TestMetrics.settle(() => total())
    spark.sparkContext.removeSparkListener(probe)
    assert(out.length == groups)
    // the partial-aggregation map stage is the one that wrote the shuffle
    val writes = scala.jdk.CollectionConverters
      .CollectionHasAsScala(probe.perStage.values()).asScala.map(_.sum())
    writes.max
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
    AdhesiveDdl.execute(spark, VSumDdl)

    def mb(b: Long): String = f"${b / 1048576.0}%.2f MiB"
    def logicalMb(rows: Long): String = mb(rows * Dim * 8L)

    // warm (JIT + codegen + instance cache) outside the measurements
    run(spark, 100000L, 64)

    val base = run(spark, 500000L, 256)
    val rows4x = run(spark, 2000000L, 256)
    val groups32x = run(spark, 2000000L, 8192)
    println(s"== AggShuffleStudyR12 (dim=$Dim, 32 map partitions) ==")
    println(s"rows=500k  groups=256 : input ${logicalMb(500000L)}  " +
      s"shuffle ${mb(base)}")
    println(s"rows=2M    groups=256 : input ${logicalMb(2000000L)}  " +
      s"shuffle ${mb(rows4x)}  (rows x4 -> shuffle x" +
      f"${rows4x.toDouble / base}%.2f)")
    println(s"rows=2M  groups=8192 : input ${logicalMb(2000000L)}  " +
      s"shuffle ${mb(groups32x)}  (groups x32 -> shuffle x" +
      f"${groups32x.toDouble / rows4x}%.2f)")
    // the claims, with slack for per-record shuffle framing overhead:
    // 4x rows must NOT grow the shuffle materially (partials absorb it)...
    assert(rows4x < base * 1.5,
      s"shuffle grew with rows: $base -> $rows4x (expected ~flat)")
    // ...and 32x groups must grow it roughly linearly (x32), well past 10x
    assert(groups32x > rows4x * 10,
      s"shuffle did not scale with groups: $rows4x -> $groups32x")
    spark.stop()
  }
}
