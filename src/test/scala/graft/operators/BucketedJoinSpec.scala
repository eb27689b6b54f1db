package graft.operators

import graft.TestSpark
import graft.queries.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Scale mechanism check: bucketing both join sides on the join key makes
  * the join shuffle-free (Exchange-free plan). This is the co-location
  * strategy the engine relies on for repeated large-large joins at 100 TB
  * — pay the shuffle once at write time, never again per query.
  */
class BucketedJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dropManaged(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed previous run can leave the location behind with no catalog entry
    val loc = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val sf = TestSpark.sfDir
    dropManaged("li_bucketed")
    dropManaged("o_bucketed")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").count()

    joined.collect() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }
    val shufflesBelowAgg = plan.collect { case s: ShuffleExchangeExec => s }
    // one exchange is allowed for the final tiny groupBy; the JOIN itself
    // must not shuffle either 600k-row side
    assert(shufflesBelowAgg.size <= 1,
      s"expected at most the aggregation exchange, got:\n$plan")

    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }
}
