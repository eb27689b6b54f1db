package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** approx_count_distinct has no cross-engine oracle (HLL implementations
  * differ); bound its error against exact counts instead.
  */
class ApproxSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("approx_count_distinct within 15% (3x default rsd) of exact counts") {
    val sf = TestSpark.sfDir
    val approx = SparkEntry_queriesHelper.approx(spark, sf)
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct($"l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.collect().foreach { r =>
      val flag = r.getString(0)
      val est = r.getLong(1)
      val ex = exact(flag)
      // default rsd = 0.05; 3 sigma keeps the test deterministic-ish
      assert(math.abs(est - ex).toDouble / ex < 0.15,
        s"flag $flag: approx $est vs exact $ex")
    }
  }

  test("KMV sketch (q_kmv_distinct) within 20% of exact; exact columns exact; error columns consistent") {
    // unlike HLL, the KMV estimator IS oracle-replayed bit-for-bit
    // every round (q_kmv_distinct's DuckDB SQL); this bounds its
    // statistical error so a hash-matching-but-useless estimator
    // cannot ship. k=256 → rsd ≈ 1/√(k−2) ≈ 6.3%; 3σ ≈ 19%.
    val sf = TestSpark.sfDir
    val r = graft.SparkEntry.queries("q_kmv_distinct")(spark, sf).head
    val (estO, exO) = (r.getLong(0), r.getLong(1))
    val (estP, exP) = (r.getLong(2), r.getLong(3))
    assert(math.abs(estO - exO).toDouble / exO < 0.20,
      s"orders: kmv $estO vs exact $exO")
    assert(math.abs(estP - exP).toDouble / exP < 0.20,
      s"parts: kmv $estP vs exact $exP")
    val exactO = Tables.lineitem(spark, sf)
      .agg(org.apache.spark.sql.functions.countDistinct($"l_orderkey"))
      .head.getLong(0)
    assert(exO == exactO, "the ride-along exact count must be exact")
    assert(r.getLong(4) == math.abs(estO - exO) * 1000L / exO,
      "err_orders_permille inconsistent with its own columns")
  }
}

private object SparkEntry_queriesHelper {
  def approx(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries("q_approx_distinct")(s, d)
}
