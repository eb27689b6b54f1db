package graft.adhesive

import graft.TestSpark
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pure parser tests for the DDL grammar plus the zero-arg function path. */
class AdhesiveDdlSpec extends AnyFunSuite {

  import AdhesiveDdl._

  test("full grammar: OR REPLACE, mixed case, semicolon, multiline body") {
    val stmt = parse(
      """create Or Replace FUNCTION my_f(bigint, Double) returns INT
        |language java as 'class X {}' ;""".stripMargin).get
    assert(stmt.name == "my_f")
    assert(stmt.argTypes == Seq(LongType, DoubleType))
    assert(stmt.returnType == IntegerType)
    assert(stmt.language == LangJava)
    assert(stmt.body == "class X {}")
    assert(!stmt.deterministic)
  }

  test("zero-argument signature parses") {
    val stmt = parse("CREATE FUNCTION f0() RETURNS BIGINT AS 'class X {}'").get
    assert(stmt.argTypes.isEmpty)
  }

  test("DETERMINISTIC flag parses in every body form") {
    assert(parse("CREATE FUNCTION f(INT) RETURNS INT DETERMINISTIC AS 'x class Y {}'").get.deterministic)
    assert(parse("CREATE FUNCTION f(INT) RETURNS INT DETERMINISTIC LANGUAGE CLASS AS \"a.B\"").get.deterministic)
    assert(parse("CREATE FUNCTION f(INT) RETURNS INT DETERMINISTIC AS $$class Y{}$$").get.deterministic)
  }

  test("unknown language is rejected with the supported list") {
    val e = intercept[AdhesiveException] {
      parse("CREATE FUNCTION f(INT) RETURNS INT LANGUAGE PYTHON AS 'x'")
    }
    assert(e.getMessage.contains("PYTHON".toLowerCase) ||
      e.getMessage.contains("python"))
    assert(e.getMessage.contains("JAVA, SCALA, CLASS"))
  }

  test("unknown type is rejected with the reference's message shape") {
    val e = intercept[AdhesiveException] {
      parse("CREATE FUNCTION f(BLOB5) RETURNS INT AS 'x'")
    }
    assert(e.getMessage.contains("not supported (to be added)"))
  }

  test("non-adhesive SQL returns None (delegation)") {
    assert(parse("SELECT 1").isEmpty)
    assert(parse("CREATE TABLE t (a INT)").isEmpty)
    // Spark's native CREATE FUNCTION (no RETURNS) must delegate too
    assert(parse("CREATE FUNCTION h AS 'com.x.C' USING JAR '/j.jar'").isEmpty)
  }

  test("package-private user class instantiates (no `public` on the class)") {
    val spark = TestSpark.spark
    spark.sql(
      """CREATE FUNCTION f_pkgpriv(BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |class PkgPriv extends Adhesive {
        |  public Object compute(Row row) { return row.getLong(0) + 1; }
        |}
        |$$""".stripMargin)
    assert(spark.sql("SELECT f_pkgpriv(CAST(41 AS BIGINT)) AS v")
      .head().getLong(0) == 42L)
  }

  test("zero-arg function registers and evaluates end-to-end") {
    val spark = TestSpark.spark
    spark.sql(
      """CREATE FUNCTION f_const() RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class Const extends Adhesive {
        |  public Object compute(Row row) { return 42L; }
        |}
        |$$""".stripMargin)
    assert(spark.sql("SELECT f_const() AS v").head().getLong(0) == 42L)
  }
}
