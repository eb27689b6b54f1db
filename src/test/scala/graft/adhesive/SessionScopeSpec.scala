package graft.adhesive

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Registration scoping: adhesive functions are session-scoped temp
  * functions (like the reference's per-SessionContext registry), so
  * Spark's native DROP TEMPORARY FUNCTION manages them and sibling
  * sessions don't see them.
  */
class SessionScopeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("native DROP TEMPORARY FUNCTION removes an adhesive function") {
    spark.sql(
      """CREATE FUNCTION f_dropme(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    assert(spark.sql("SELECT f_dropme(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS v")
      .head().getLong(0) == 3L)
    spark.sql("DROP TEMPORARY FUNCTION f_dropme")
    val e = intercept[Exception] {
      spark.sql("SELECT f_dropme(CAST(1 AS BIGINT), CAST(2 AS BIGINT))").collect()
    }
    assert(e.getMessage.contains("f_dropme"))
  }

  test("registered functions are visible in the SQL catalog (SHOW FUNCTIONS)") {
    spark.sql(
      """CREATE FUNCTION f_visible(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    val listed = spark.sql("SHOW USER FUNCTIONS").collect().map(_.getString(0))
    assert(listed.exists(_.endsWith("f_visible")), listed.mkString(", "))
  }

  test("aggregate and table variants are catalog-visible too") {
    spark.sql(
      """CREATE OR REPLACE AGGREGATE FUNCTION agg_visible(BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveAggregate;
        |import org.apache.spark.sql.Row;
        |public class AggVis extends AdhesiveAggregate {
        |  public Object zero() { return 0L; }
        |  public Object reduce(Object s, Row i) { return (Long) s + 1L; }
        |  public Object merge(Object a, Object b) { return (Long) a + (Long) b; }
        |}
        |'""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TABLE FUNCTION tf_visible(BIGINT) RETURNS TABLE(n BIGINT) LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveTableFunction;
        |import org.apache.spark.sql.Row;
        |import org.apache.spark.sql.RowFactory;
        |import java.util.ArrayList;
        |import java.util.List;
        |public class TfVis extends AdhesiveTableFunction {
        |  public List<Row> eval(Row args) {
        |    List<Row> out = new ArrayList<>();
        |    out.add(RowFactory.create(args.getLong(0)));
        |    return out;
        |  }
        |}
        |'""".stripMargin)
    val listed = spark.sql("SHOW USER FUNCTIONS").collect().map(_.getString(0))
    assert(listed.exists(_.endsWith("agg_visible")), listed.mkString(", "))
    assert(listed.exists(_.endsWith("tf_visible")), listed.mkString(", "))
    // DESCRIBE resolves the registered names without erroring
    assert(spark.sql("DESCRIBE FUNCTION agg_visible").collect().nonEmpty)
    spark.sql("DROP TEMPORARY FUNCTION agg_visible")
    spark.sql("DROP TEMPORARY FUNCTION tf_visible")
    val after = spark.sql("SHOW USER FUNCTIONS").collect().map(_.getString(0))
    assert(!after.exists(_.endsWith("agg_visible")) &&
      !after.exists(_.endsWith("tf_visible")),
      "dropped variants must leave the catalog listing")
  }

  test("a sibling session does not see another session's functions") {
    spark.sql(
      """CREATE FUNCTION f_scoped(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    val sibling = spark.newSession()
    val e = intercept[Exception] {
      sibling.sql("SELECT f_scoped(CAST(1 AS BIGINT), CAST(2 AS BIGINT))").collect()
    }
    assert(e.getMessage.contains("f_scoped"))
    // and the original still works
    assert(spark.sql("SELECT f_scoped(CAST(1 AS BIGINT), CAST(2 AS BIGINT)) AS v")
      .head().getLong(0) == 3L)
  }
}
