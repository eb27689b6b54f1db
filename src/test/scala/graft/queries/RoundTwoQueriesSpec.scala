package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-2 query additions (their hash-exactness
  * vs DuckDB is covered by the Verify gate; these pin the invariants a
  * hash can't explain).
  */
class RoundTwoQueriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("q_argmax_latest keeps exactly one row per customer, the max-date one") {
    import spark.implicits._
    val out = run("q_argmax_latest")
    val perCust = out.groupBy($"o_custkey").count()
      .filter($"count" > 1).count()
    assert(perCust === 0, "argmax dedupe must be unique per key")
    val maxDates = Tables.orders(spark, TestSpark.sfDir)
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions.max($"o_orderdate").as("d"))
    val mismatches = out.join(maxDates, "o_custkey")
      .filter($"latest_date" =!= $"d").count()
    assert(mismatches === 0)
  }

  test("q_unpivot emits exactly 2 long rows per part, invertible") {
    import spark.implicits._
    val out = run("q_unpivot")
    val nParts = Tables.part(spark, TestSpark.sfDir).count()
    assert(out.count() === 2 * nParts)
    assert(out.groupBy($"p_partkey").count().filter($"count" =!= 2).count() === 0)
  }

  test("q_moment_stats matches Spark's own var_samp/stddev_samp closely") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = run("q_moment_stats").collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy($"l_returnflag")
      .agg(var_samp($"l_quantity").as("v"), stddev_samp($"l_quantity").as("s"))
      .collect().foreach { r =>
        val (v, s) = out(r.getString(0))
        assert(math.abs(v - r.getDouble(1)) < 1e-6, "variance drifted")
        assert(math.abs(s - r.getDouble(2)) < 1e-8, "stddev drifted")
      }
  }

  test("pipe_hash_sample is stable across runs and ~10% sized") {
    val a = run("pipe_hash_sample").collect().map(_.getLong(0)).toSeq
    val b = run("pipe_hash_sample").collect().map(_.getLong(0)).toSeq
    assert(a === b, "hash sampling must be deterministic")
    val total = Tables.documents(spark, TestSpark.sfDir).count()
    assert(a.size > total / 20 && a.size < total / 5,
      s"10% bucket wildly off: ${a.size} of $total")
  }

  test("ta_top_bigrams ranks by doc frequency with text tiebreak") {
    val rows = run("ta_top_bigrams").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length === 20)
    rows.sliding(2).foreach { case Array((g1, n1), (g2, n2)) =>
      assert(n1 > n2 || (n1 === n2 && g1 < g2), s"order broken at $g1/$g2")
    }
  }

  test("ann_centroids covers every (label, dim) cell exactly once") {
    import spark.implicits._
    val out = run("ann_centroids")
    val labels = Tables.embeddings(spark, TestSpark.sfDir)
      .select($"label").distinct().count()
    val dim = Tables.embeddings(spark, TestSpark.sfDir)
      .select(org.apache.spark.sql.functions.size($"embedding")).head().getInt(0)
    assert(out.count() === labels * dim)
    // centroid of unit-ish embeddings stays in a sane range
    assert(out.filter($"centroid" > 1.0 || $"centroid" < -1.0).count() === 0)
  }

  test("q_sql_cte runs through the temp-view catalog") {
    val out = run("q_sql_cte").collect()
    assert(out.length === 5) // five regions
    assert(out.map(_.getLong(1)).sum === 25) // 25 nations total
  }
}
