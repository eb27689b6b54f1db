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
