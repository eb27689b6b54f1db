package graft.streaming

import org.apache.spark.sql.SparkSession

/** Round-16 skew study: the salted LEFT OUTER stream-stream join —
  * does the hot-share cut carry over from the inner form
  * (JoinSkewStudyR15), and are its eviction rows exact under a Zipf
  * head?
  *
  *   sbt "Test/runMain graft.streaming.JoinSkewStudyR16"
  *
  * The outer form INVERTS the salting (signups content-salted into one
  * lane each, purchases replicated across lanes —
  * [[EventStreamPipeline.signupPurchaseJoinOuterSalted]]), because the
  * inner scheme's replicated signups would evict k−1 spurious
  * "unconverted" rows per converted signup. Measured claims:
  *
  * 1. **Exactness**: the salted outer drain equals the unsalted outer
  *    drain ROW FOR ROW on the Zipf corpus — matches AND null-extended
  *    eviction rows (the part the inversion exists for).
  * 2. **The hot-share cut carries over to the pairing work**: the
  *    straggler unit of the interval join is per-key match fan-out
  *    (signups × purchases on one key). Content-salting the signups
  *    cuts the hot key's per-lane product by ~the salt count.
  * 3. **The stated cost**: purchase-side state × salts (the dual of
  *    the inner form's signup-side × salts) — asserted inside the
  *    1×..salts× envelope.
  *
  * Results feed SCALE.md §"Round-16 outer join skew".
  */
object JoinSkewStudyR16 {

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
        "CASE WHEN id % 2 = 0 THEN 'signup' ELSE 'purchase' END AS event_type",
        "CAST(1.0 AS DOUBLE) AS value",
        "'' AS props")
      .coalesce(4)
      .write.mode("overwrite").parquet(dir)
    n
  }

  private case class Drain(rows: Seq[(Long, Long, Long)], stateRows: Long)

  private def drain(spark: SparkSession, dir: String, name: String,
      salted: Int): Drain = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val stream = EventStreamPipeline.readEvents(spark, dir)
    val joined =
      if (salted > 0)
        EventStreamPipeline.signupPurchaseJoinOuterSalted(stream, salted)
      else EventStreamPipeline.signupPurchaseJoinOuter(stream)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      val rows = spark.table(name)
        .select($"user_id", unix_micros($"signup_time").as("s_us"),
          coalesce(unix_micros($"purchase_time"), lit(-1L)).as("p_us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      Drain(rows, q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
    } finally { q.stop(); spark.catalog.dropTempView(name) }
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
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("joinskew16")
    val perDay = 300
    val users = 500
    val salts = 8
    val n = corpus(spark, perDay, users, hotPermille = 300, s"$base/zipf")

    // ——— claim 2 (batch-computable): the straggler unit is per-key
    // pairing work signups(k) × purchases(k); content-salting signups
    // cuts the hot key's per-lane product by ~salts
    val ev = EventStreamPipeline.readEventsBatch(spark, s"$base/zipf")
    def maxPairWork(salted: Boolean): Double = {
      val s0 = ev.filter($"event_type" === "signup")
      val s =
        if (!salted) s0.groupBy($"user_id").count()
          .withColumnRenamed("count", "n_s")
        else s0.groupBy($"user_id",
            pmod(xxhash64($"event_id"), lit(salts.toLong)).as("salt"))
          .count().withColumnRenamed("count", "n_s")
      val p = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id".as("pu")).count().withColumnRenamed("count", "n_p")
      // per lane, a signup pairs against ALL of its user's purchases
      // (replicated) — the per-task work unit is n_s(lane) * n_p(user)
      s.join(p, $"user_id" === $"pu")
        .select(($"n_s" * $"n_p").as("work"))
        .agg(max($"work")).head.getLong(0).toDouble
    }
    val unsaltedWork = maxPairWork(salted = false)
    val saltedWork = maxPairWork(salted = true)
    println(f"max per-lane pair work: unsalted=$unsaltedWork%.0f " +
      f"salted=$saltedWork%.0f cut=x${unsaltedWork / saltedWork}%.1f")
    assert(saltedWork <= unsaltedWork / (salts * 0.7),
      f"salting must cut the hot lane's pairing work ~x$salts: " +
        f"$unsaltedWork%.0f -> $saltedWork%.0f")

    // ——— claims 1 and 3: real streaming drains
    val plain = drain(spark, s"$base/zipf", "sk16_plain", salted = 0)
    val salted = drain(spark, s"$base/zipf", "sk16_salt", salted = salts)
    val evictions = plain.rows.count(_._3 == -1L)
    println(s"rows=${plain.rows.size} (evictions=$evictions) " +
      s"state: plain=${plain.stateRows} salted=${salted.stateRows}")

    // 1. row-for-row equality, eviction rows included
    assert(evictions > 0,
      "fixture must exercise eviction emission (unconverted signups)")
    assert(salted.rows == plain.rows,
      s"salted outer drain diverged: ${salted.rows.size} vs " +
        s"${plain.rows.size} rows; " +
        s"evictions ${salted.rows.count(_._3 == -1L)} vs $evictions")

    // 3. the stated cost: purchase-side state replicated × salts —
    // total state strictly above 1× and below salts× the unsalted
    assert(salted.stateRows > plain.stateRows &&
      salted.stateRows < plain.stateRows * salts.toLong,
      s"salted state out of the stated envelope: ${plain.stateRows} -> " +
        s"${salted.stateRows} (salts=$salts)")
    println(f"salted state cost: x${salted.stateRows.toDouble / plain.stateRows}%.2f " +
      f"(envelope 1..$salts)")
    assert(n > 0)
    spark.stop()
    println("JOIN-SKEW-STUDY-R16-OK")
  }
}
