package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Constructed two-event fixtures that pin `ev_session_window`'s gap
  * boundary — the cases the corpus happens not to contain, where a
  * µs-precision engine against a ms-precision oracle silently diverges.
  *
  * Empirical boundary rule (pinned here): Spark's `session_window`
  * MERGES an event arriving at exactly session-end — its merge test is
  * eventStart <= currentEnd, so touching [t, t+gap) windows coalesce.
  * That is exactly the lag oracle's strict `> 1800000` new-session
  * comparator. The remaining divergence risk was precision: the engine
  * previously sessionized at µs while the oracle floor-divides to ms, so
  * a gap of 1800000.5 ms split in the engine (1800000500 µs > gap) but
  * merged in the oracle (floor gap = 1800000, `>` false). Truncating
  * event times to ms BEFORE `session_window` closes it: both engines now
  * sessionize the same integers, and the built-in operator agrees with
  * [[graft.operators.EventWindows.sessionize]]'s lag idiom on every gap,
  * boundaries included.
  */
class SessionBoundarySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val GapNs = 1800000L * 1000000L // 30 min in ns

  /** Write an events.parquet fixture; ts is ns-epoch (read as long, same
    * as the corpus under nanosAsLong).
    */
  private def fixture(rows: Seq[(Long, Long, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("session-boundary").toString
    rows.toDF("event_id", "ts", "user_id")
      .selectExpr("event_id", "ts", "user_id",
        "'view' AS event_type", "1.0 AS value", "'{}' AS props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // t0 aligned to an exact millisecond so truncation arithmetic is exact
  private val t0 = 1000000000000000000L // ns

  private def sessions(name: String, dir: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("exact 30:00.000 gap merges — touching windows coalesce (matches oracle's strict >)") {
    val out = sessions("ev_session_window", fixture(Seq((1L, t0, 1L), (2L, t0 + GapNs, 1L))))
    assert(out.length == 1, out.mkString("; "))
    assert(out.head.getLong(2) == 2L, out.head.toString)
  }

  test("30:00.0005 gap merges at ms precision — the former µs-vs-ms divergence case") {
    // gap = 1800000500000 ns = 1800000.5 ms; ms-truncated gap = 1800000,
    // not > gap → merge. A µs-precision engine split here while the
    // ms-floor oracle merged — the latent mismatch this spec pins shut.
    val out = sessions("ev_session_window",
      fixture(Seq((1L, t0, 1L), (2L, t0 + GapNs + 500000L, 1L))))
    assert(out.length == 1, out.mkString("; "))
  }

  test("30:00.001 gap splits — first gap strictly over the threshold") {
    val out = sessions("ev_session_window",
      fixture(Seq((1L, t0, 1L), (2L, t0 + GapNs + 1000000L, 1L))))
    assert(out.length == 2, out.mkString("; "))
    assert(out.forall(_.getLong(2) == 1L), out.mkString("; "))
  }

  test("session_start_ms is the ms-truncated first event time") {
    val out = sessions("ev_session_window", fixture(Seq((1L, t0 + 123456L, 1L))))
    assert(out.head.getLong(1) == t0 / 1000000L, out.head.toString)
  }

  test("ev_sessionize (lag idiom) classifies all three boundary gaps identically") {
    for ((delta, expected) <- Seq(0L -> 1, 500000L -> 1, 1000000L -> 2)) {
      val dir = fixture(Seq((1L, t0, 1L), (2L, t0 + GapNs + delta, 1L)))
      val a = sessions("ev_session_window", dir).length
      val b = sessions("ev_sessionize", dir).length
      assert(a == expected && b == expected, s"delta=$delta: window=$a lag=$b expected=$expected")
    }
  }
}
