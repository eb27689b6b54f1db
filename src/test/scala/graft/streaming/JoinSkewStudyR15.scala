package graft.streaming

import org.apache.spark.sql.SparkSession

/** Round-15 skew study for the stream-stream interval join — the one
  * join scale-killer r14 left unmeasured: a Zipf-HEAD key. Uniform-key
  * tiers proved state is horizon-bounded in TOTAL; a hot user (30% of
  * the stream on one user_id) concentrates that bounded state — and the
  * quadratic `signups x purchases` match fan-out — on a single task.
  *
  *   sbt "Test/runMain graft.streaming.JoinSkewStudyR15"
  *
  * Measured claims:
  *
  * 1. **Total state is skew-INVARIANT**: the symmetric hash join keeps
  *    every row inside the watermark horizon regardless of which key it
  *    carries — uniform and Zipf corpora of equal size must hold equal
  *    post-drain state (within batch-boundary noise).
  * 2. **The hot key is the straggler**: max rows on one shuffle key
  *    (the unit one task must hold and pair) is ~30% of the stream vs
  *    ~0.2% uniform — a 150x per-task imbalance no AQE can fix for a
  *    STREAMING stateful operator (state placement is keyed, permanent,
  *    and replayed across batches).
  * 3. **Salting is the mitigation and costs what it says**:
  *    [[EventStreamPipeline.signupPurchaseJoinSalted]] (key widened to
  *    (user_id, salt), signups replicated) emits EXACTLY the unsalted
  *    matches (asserted against the batch twin), cuts the max per-key
  *    share by ~the salt count, and pays signup-side state x salts —
  *    asserted, so the trade is stated in numbers, not vibes.
  *
  * Results feed SCALE.md §"Round-15 join skew".
  */
object JoinSkewStudyR15 {

  private val DayUs = 86400000000L

  /** 30 days of events; `hotPermille`/1000 of rows land on user 0, the
    * rest spread over `users` (hash-derived, no RNG).
    */
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

  private case class Drain(matches: Long, stateRows: Long)

  private def drain(spark: SparkSession, dir: String, name: String,
      salted: Int): Drain = {
    val stream = EventStreamPipeline.readEvents(spark, dir)
    val joined =
      if (salted > 0) EventStreamPipeline.signupPurchaseJoinSalted(stream, salted)
      else EventStreamPipeline.signupPurchaseJoin(stream)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      q.processAllAvailable()
      Drain(spark.table(name).count(),
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum)
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
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("joinskew15")
    val perDay = 300 // the quadratic fan-out is scale-free; 120k rows OOMed the memory sink
    val users = 500
    val salts = 8

    val nUni = corpus(spark, perDay, users, hotPermille = 0, s"$base/uni")
    val nZipf = corpus(spark, perDay, users, hotPermille = 300, s"$base/zipf")
    assert(nUni == nZipf)

    // ——— claim 2 first (batch-computable): per-shuffle-key imbalance
    def maxKeyShare(dir: String, salted: Boolean): Double = {
      val ev = EventStreamPipeline.readEventsBatch(spark, dir)
      val keyed =
        if (!salted) ev.groupBy($"user_id").count()
        else ev.groupBy($"user_id",
          org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.xxhash64($"event_id"),
            org.apache.spark.sql.functions.lit(salts.toLong)).as("salt"))
          .count()
      keyed.agg(org.apache.spark.sql.functions.max("count")).head.getLong(0)
        .toDouble / nUni
    }
    val uniShare = maxKeyShare(s"$base/uni", salted = false)
    val zipfShare = maxKeyShare(s"$base/zipf", salted = false)
    val zipfSaltedShare = maxKeyShare(s"$base/zipf", salted = true)
    println(f"max per-key share: uniform=$uniShare%.4f zipf=$zipfShare%.4f " +
      f"zipf+salt$salts=$zipfSaltedShare%.4f")
    assert(zipfShare >= 0.28, "the planted head must dominate one key")
    assert(zipfShare / uniShare >= 30,
      f"skew fixture too mild: x${zipfShare / uniShare}%.1f")
    assert(zipfSaltedShare <= zipfShare / (salts * 0.7),
      f"salting must cut the hot key's share ~x$salts: " +
        f"$zipfShare%.4f -> $zipfSaltedShare%.4f")

    // ——— claims 1 and 3: real streaming drains
    val uni = drain(spark, s"$base/uni", "sk_uni", salted = 0)
    val zipf = drain(spark, s"$base/zipf", "sk_zipf", salted = 0)
    val zipfSalted = drain(spark, s"$base/zipf", "sk_zipf_s", salted = salts)
    println(s"uniform:     matches=${uni.matches} state=${uni.stateRows}")
    println(s"zipf:        matches=${zipf.matches} state=${zipf.stateRows}")
    println(s"zipf+salt$salts: matches=${zipfSalted.matches} " +
      s"state=${zipfSalted.stateRows}")

    // 1. total state is skew-invariant (same rows, same horizon)
    assert(math.abs(zipf.stateRows - uni.stateRows) <= uni.stateRows / 5,
      s"skew changed TOTAL state: ${uni.stateRows} vs ${zipf.stateRows}")

    // the hot key's quadratic match fan-out, quantified: ~30% of signups
    // x ~30% of purchases on one user vs 1/500th x 1/500th each
    println(f"match blowup zipf/uniform: x${zipf.matches.toDouble / uni.matches}%.1f")
    assert(zipf.matches > uni.matches * 5,
      "the fixture must exhibit the quadratic hot-key fan-out")

    // 3a. salted join = same answer (and both equal the batch twin)
    val ev = EventStreamPipeline.readEventsBatch(spark, s"$base/zipf")
    val s = ev.filter($"event_type" === "signup")
      .select($"user_id", $"ts".as("sts"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pu"), $"ts".as("pts"))
    val batchMatches = s.join(p,
      $"user_id" === $"pu" && $"pts" >= $"sts" &&
        $"pts" <= $"sts" + org.apache.spark.sql.functions
          .lit(7L * DayUs * 1000)).count()
    assert(zipf.matches == batchMatches,
      s"unsalted drain diverged from batch twin: ${zipf.matches} vs $batchMatches")
    assert(zipfSalted.matches == batchMatches,
      s"SALTED drain diverged: ${zipfSalted.matches} vs $batchMatches")

    // 3b. the stated cost: signup-side state replicated x salts. State =
    // signups*salts + purchases (modulo horizon eviction, identical
    // across the two runs) — bounded between the two extremes
    assert(zipfSalted.stateRows > zipf.stateRows &&
      zipfSalted.stateRows < zipf.stateRows * salts.toLong,
      s"salted state out of the stated envelope: ${zipf.stateRows} -> " +
        s"${zipfSalted.stateRows} (salts=$salts)")
    println(f"salted state cost: x${zipfSalted.stateRows.toDouble / zipf.stateRows}%.2f " +
      f"(envelope 1..$salts)")
    spark.stop()
    println("JOIN-SKEW-STUDY-OK")
  }
}
