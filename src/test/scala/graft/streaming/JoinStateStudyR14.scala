package graft.streaming

import org.apache.spark.sql.SparkSession

/** Round-14 scaling study for the stream-stream interval join family
  * (`ev_stream_join*`): the claim that makes the operator production-
  * viable is that join STATE is bounded by the interval horizon, not by
  * stream length — a job over an ever-growing stream holds a flat
  * working set. Measured, not argued:
  *
  *   sbt "Test/runMain graft.streaming.JoinStateStudyR14"
  *
  * Construction: synthetic signup/purchase streams at a FIXED event
  * density (rows/day) over growing spans (15 / 30 / 60 days — 4× the
  * stream length tier-over-tier rows too). Each tier drains the 7-day
  * interval join through a real streaming query (one data batch + the
  * watermark-advancing cleanup batch), then reads
  * `stateOperators.numRowsTotal`:
  *
  * 1. **Flat state**: post-drain state rows must NOT grow with the span
  *    — eviction keeps only rows inside the watermark-derived horizons
  *    (signups: 7 d + 1 h; purchases: 1 h), which fixed density makes a
  *    CONSTANT. Asserted: the 60-day tier holds ≤ 1.3× the 15-day
  *    tier's state (a linear leak would show ~4×).
  * 2. **Correctness at every tier**: drained matches equal the batch
  *    interval join computed on the same parquet — the state machinery
  *    never trades rows for boundedness.
  *
  * Deterministic corpus (hash-derived, no RNG). Results feed SCALE.md
  * §"Round-14 join-state tiers".
  */
object JoinStateStudyR14 {

  private val DayUs = 86400000000L

  /** `days` days of events at ~`perDay` rows/day: alternating signup /
    * purchase rows over `users` users, timestamps ns-long per the
    * events contract, purchases offset so a known fraction match.
    */
  private def corpus(spark: SparkSession, days: Int, perDay: Int,
      users: Int, dir: String): Unit = {
    val n = days.toLong * perDay
    spark.range(n)
      .selectExpr(
        "id AS event_id",
        // spread uniformly over the span, offset one day from epoch 0: an
        // event time EQUAL to the initial watermark (0) is judged late by
        // the join's input filter and silently dropped — a degenerate
        // 1970-01-01T00:00:00.000000 corner no real stream hits, found
        // when id=0's signup cost exactly its 29 in-interval matches
        s"($DayUs + id * $days * ${DayUs}L div $n) * 1000 AS ts",
        s"abs(hash(id * 2654435761)) % $users AS user_id",
        "CASE WHEN id % 2 = 0 THEN 'signup' ELSE 'purchase' END AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "'' AS props")
      .coalesce(4)
      .write.mode("overwrite").parquet(dir)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("joinstate14")

    val tiers = Seq(15, 30, 60) // days; fixed rows/day
    val perDay = 4000
    val results = tiers.map { days =>
      val dir = s"$base/d$days"
      corpus(spark, days, perDay, users = 500, dir)
      val stream = EventStreamPipeline.readEvents(spark, dir)
      val q = EventStreamPipeline.signupPurchaseJoin(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"js_$days")
        .start()
      try {
        q.processAllAvailable()
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        val matches = spark.table(s"js_$days").count()
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        println(s"tier ${days}d: $dataBatches data batches")
        // batch twin: the drained matches must equal the batch interval
        // join — boundedness must not cost rows
        val ev = EventStreamPipeline.readEventsBatch(spark, dir)
        val s = ev.filter($"event_type" === "signup")
          .select($"user_id", $"ts".as("sts"))
        val p = ev.filter($"event_type" === "purchase")
          .select($"user_id".as("pu"), $"ts".as("pts"))
        val batchMatches = s.join(p,
          $"user_id" === $"pu" && $"pts" >= $"sts" &&
            $"pts" <= $"sts" + org.apache.spark.sql.functions
              .lit(7L * DayUs * 1000)).count()
        assert(matches == batchMatches,
          s"tier ${days}d: stream emitted $matches, batch twin $batchMatches")
        println(f"tier ${days}%3dd  rows=${days.toLong * perDay}%8d  " +
          f"matches=$matches%9d  stateRows=$stateRows%7d")
        (days, stateRows)
      } finally {
        q.stop()
        spark.catalog.dropTempView(s"js_$days")
      }
    }
    val first = results.head._2.toDouble
    val last = results.last._2.toDouble
    println(f"state growth over ${tiers.last / tiers.head}x stream length: " +
      f"x${last / first}%.2f")
    assert(last <= first * 1.3,
      f"join state grew x${last / first}%.2f over a 4x longer stream — " +
        "the horizon eviction is leaking")
    spark.stop()
  }
}
