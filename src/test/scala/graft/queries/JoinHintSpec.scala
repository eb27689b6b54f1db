package graft.queries

import graft.TestSpark
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Join strategy control: hints must actually change the physical join
  * operator while leaving results identical — the knob used at scale to
  * override Catalyst's default when statistics mislead it.
  */
class JoinHintSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // the static physical plan: AQE may later demote an SMJ to broadcast at
  // runtime (small inputs here), but the hint's effect on strategy choice
  // is visible pre-adaptive
  private def finalPlan(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }

  test("merge / shuffle_hash / broadcast hints select their join operators; results agree") {
    val sf = TestSpark.sfDir
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_orderstatus")

    def joined(hint: String) =
      li.hint(hint).join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus").count()

    val merge = joined("merge")
    assert(finalPlan(merge).exists(_.isInstanceOf[SortMergeJoinExec]))

    val shuffleHash = joined("shuffle_hash")
    assert(finalPlan(shuffleHash).exists(_.isInstanceOf[ShuffledHashJoinExec]))

    val bcast = joined("broadcast")
    assert(finalPlan(bcast).exists(_.isInstanceOf[BroadcastHashJoinExec]))

    val rows = Seq(merge, shuffleHash, bcast)
      .map(_.collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    assert(rows.distinct.size == 1, "all strategies must agree on results")
  }
}
