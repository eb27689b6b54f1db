package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class CatalogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("registerAll exposes every table to pure SQL, adhesive functions included") {
    Catalog.registerAll(spark, TestSpark.sfDir)
    Catalog.TableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $t").head().getLong(0) > 0, t)
    }
    // the reference's end-to-end flow: registered tables + CREATE FUNCTION + SQL
    spark.sql(
      """CREATE OR REPLACE FUNCTION cat_add(BIGINT, BIGINT) RETURNS BIGINT
        |LANGUAGE CLASS AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    val v = spark.sql(
      "SELECT cat_add(o_orderkey, o_custkey) AS s FROM orders ORDER BY o_orderkey LIMIT 1")
      .head().getLong(0)
    val expect = spark.sql(
      "SELECT o_orderkey + o_custkey AS s FROM orders ORDER BY o_orderkey LIMIT 1")
      .head().getLong(0)
    assert(v == expect)
  }

  test("custom UDAF registers for pure SQL and matches the DataFrame form") {
    import spark.implicits._
    Catalog.registerAll(spark, TestSpark.sfDir)
    graft.functions.TopKAggregator.register(spark, "top_k3", 3)
    val viaSql = spark.sql(
      "SELECT l_returnflag, top_k3(l_quantity) AS top FROM lineitem GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val viaDf = graft.queries.Tables.lineitem(spark, TestSpark.sfDir)
      .groupBy($"l_returnflag")
      .agg(graft.functions.TopKAggregator.top_k(3)($"l_quantity").as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(viaSql == viaDf)
    assert(viaSql.values.forall(_.size == 3))
  }
}
