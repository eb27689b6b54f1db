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

  test("salt column does not leak into the output") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey").limit(10)
    val o = Tables.orders(spark, sf).select($"o_orderkey").limit(10)
    val out = SkewJoin.saltedInnerJoin(li, o, "l_orderkey", "o_orderkey")
    assert(!out.columns.contains("__salt"))
  }
}
