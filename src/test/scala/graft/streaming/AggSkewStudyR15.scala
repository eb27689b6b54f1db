package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-15 skew study, aggregation half — the companion to
  * [[JoinSkewStudyR15]]: the stream-stream JOIN concentrates a hot
  * key's rows and its quadratic fan-out on one task (mitigation:
  * salting), but the streaming windowed AGGREGATION is skew-immune BY
  * CONSTRUCTION, and this study measures why instead of asserting it:
  *
  *   sbt "Test/runMain graft.streaming.AggSkewStudyR15"
  *
  * 1. **Partial aggregation absorbs the hot key before the wire**: the
  *    pre-shuffle HashAggregate emits at most one partial row per
  *    (window, user) per task, so shuffle RECORDS are bounded by
  *    distinct keys — a corpus with 30% of rows on one user ships
  *    FEWER records than the uniform corpus (fewer distinct keys), not
  *    300,000 copies of one.
  * 2. **State is one row per key, not per event**: post-drain
  *    `numRowsTotal` equals distinct open/closed (window, user) keys —
  *    row-count-independent — so the hot key's state is exactly one
  *    row per hour window it touches, and no salting is ever needed.
  *
  * Same deterministic corpus generator as the join study (30 days,
  * hash-derived; hot user takes 30% of rows in the Zipf tier).
  */
object AggSkewStudyR15 {

  private val DayUs = 86400000000L

  private def corpus(spark: SparkSession, perDay: Int, users: Int,
      hotPermille: Int, dir: String): Long = {
    val days = 30
    val n = days.toLong * perDay
    spark.range(n)
      .selectExpr(
        "id AS event_id",
        s"($DayUs + id * $days * ${DayUs}L div $n) * 1000 AS ts",
        s"""CASE WHEN abs(hash(id * 40503)) % 1000 < $hotPermille THEN 0L
            ELSE 1 + abs(hash(id * 2654435761)) % $users END AS user_id""",
        "'view' AS event_type", "CAST(1.0 AS DOUBLE) AS value", "'' AS props")
      .coalesce(4)
      .write.mode("overwrite").parquet(dir)
    n
  }

  private class ShuffleProbe extends SparkListener {
    val records = new java.util.concurrent.atomic.LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        records.add(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
  }

  private case class Drain(outRows: Long, stateRows: Long,
      shuffleRecords: Long)

  private def drain(spark: SparkSession, dir: String, name: String): Drain = {
    import org.apache.spark.sql.functions._
    val probe = new ShuffleProbe
    spark.sparkContext.addSparkListener(probe)
    val q = EventStreamPipeline.readEvents(spark, dir)
      .select(timestamp_micros(
          expr(graft.queries.Tables.fldivExpr("ts", 1000L))).as("event_time"),
        col("user_id"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      Drain(spark.table(name).count(),
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum,
        graft.TestMetrics.settle(() => probe.records.sum()))
    } finally {
      spark.sparkContext.removeSparkListener(probe)
      q.stop(); spark.catalog.dropTempView(name)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("aggskew15")
    // density matters: at 500 users x 720 hour-windows almost every row
    // is its own key and "key-bounded" degenerates to "event-bounded";
    // 50 users x 4000/day gives ~3.3 rows per (window,user), so the
    // partial agg's collapse is visible in the record counts
    val perDay = 4000
    val users = 50

    val n = corpus(spark, perDay, users, hotPermille = 0, s"$base/uni")
    corpus(spark, perDay, users, hotPermille = 300, s"$base/zipf")

    val uni = drain(spark, s"$base/uni", "as_uni")
    val zipf = drain(spark, s"$base/zipf", "as_zipf")
    println(s"rows=$n")
    println(s"uniform: out=${uni.outRows} state=${uni.stateRows} " +
      s"shuffleRecords=${uni.shuffleRecords}")
    println(s"zipf:    out=${zipf.outRows} state=${zipf.stateRows} " +
      s"shuffleRecords=${zipf.shuffleRecords}")

    // 1. the hot key never floods the wire: partial aggregation bounds
    // shuffle records by distinct keys, so the skewed corpus (FEWER
    // distinct (window,user) keys) ships no more than the uniform one
    assert(zipf.shuffleRecords <= uni.shuffleRecords * 11 / 10,
      s"hot key leaked through the partial agg: ${zipf.shuffleRecords} " +
        s"vs ${uni.shuffleRecords}")
    // and both are key-scale, nowhere near event-scale
    assert(uni.shuffleRecords < n / 2,
      s"shuffle records must be key-bounded: ${uni.shuffleRecords} of $n")

    // 2. state is one row per key: closed windows emitted + open windows
    // in state — per-key cost is independent of the 30% row share
    assert(zipf.stateRows <= uni.stateRows,
      s"skew grew agg state: ${uni.stateRows} -> ${zipf.stateRows}")
    // the hot user contributes at most one key per hour window: ~720
    // windows over 30 days, so the zipf tier's key count drops by
    // roughly the rows the head absorbed
    assert(zipf.outRows < uni.outRows,
      s"expected fewer distinct keys under the head: " +
        s"${uni.outRows} -> ${zipf.outRows}")
    spark.stop()
    println("AGG-SKEW-STUDY-OK")
  }
}
