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
}

private object SparkEntry_queriesHelper {
  def approx(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.SparkEntry.queries("q_approx_distinct")(s, d)
}
