package graft.operators

import graft.TestSpark
import graft.queries.Tables
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sfDir

  test("salted join is row-identical to the plain join") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_partkey")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")

    val plain = li.join(o, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_partkey", $"o_totalprice")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    val salted = SkewJoin.saltedInnerJoin(li, o, "l_orderkey", "o_orderkey")
      .select($"l_orderkey", $"l_partkey", $"o_totalprice")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap

    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("AQE splits a skewed join partition at runtime (SortMergeJoin skew=true)") {
    // the automatic counterpart to manual salting: AQE detects the hot
    // partition from runtime shuffle stats and splits it, replicating the
    // matching build-side rows. Thresholds lowered so test-scale data
    // qualifies; at 100 TB the defaults (256MB / factor 5) do this for free.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val hot = (0 until 200000).map(i => (0L, s"pad-$i")) ++
        (1 to 100).flatMap(k => (0 until 10).map(i => (k.toLong, s"x-$i")))
      val left = hot.toDF("k", "payload")
      val right = (0 to 100).map(k => (k.toLong, s"dim-$k")).toDF("k", "name")
      val j = left.join(right, "k").groupBy("name").count()
      val rows = j.collect() // drive THIS QueryExecution so AQE re-plans it
      assert(rows.length == 101)
      val plan = j.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"),
        s"expected a skew-split join in the final plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("salt column does not leak into the output") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey").limit(10)
    val o = Tables.orders(spark, sf).select($"o_orderkey").limit(10)
    val out = SkewJoin.saltedInnerJoin(li, o, "l_orderkey", "o_orderkey")
    assert(!out.columns.contains("__salt"))
  }
}
