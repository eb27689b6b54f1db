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

  test("NOT NULL and DETERMINISTIC parse in either order") {
    for (flags <- Seq("NOT NULL DETERMINISTIC", "DETERMINISTIC NOT NULL")) {
      val st = parse(
        s"CREATE FUNCTION f(BIGINT) RETURNS BIGINT $flags LANGUAGE JAVA AS 'class Y {}'").get
      assert(st.deterministic && st.nonNullable,
        s"'$flags' parsed as det=${st.deterministic} nn=${st.nonNullable}")
    }
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

  test("DECIMAL(p,s) and ARRAY<T> argument types parse (nested commas/parens)") {
    val stmt = parse(
      """CREATE FUNCTION f(DECIMAL(12,2), ARRAY<FLOAT>, BIGINT, ARRAY<DECIMAL(10, 4)>)
        |RETURNS BIGINT AS 'class X {}'""".stripMargin).get
    assert(stmt.argTypes == Seq(DecimalType(12, 2), ArrayType(FloatType),
      LongType, ArrayType(DecimalType(10, 4))))
    // bare DECIMAL defaults to Spark SQL's (10,0)
    assert(parse("CREATE FUNCTION g(DECIMAL) RETURNS INT AS 'x'").get
      .argTypes == Seq(DecimalType(10, 0)))
    // nested arrays
    assert(parse("CREATE FUNCTION h(ARRAY<ARRAY<INT>>) RETURNS INT AS 'x'").get
      .argTypes == Seq(ArrayType(ArrayType(IntegerType))))
  }

  test("MAP<K,V> argument type parses (flat, nested, malformed)") {
    assert(parse(
      "CREATE FUNCTION f(MAP<STRING, BIGINT>) RETURNS BIGINT AS 'x'").get
      .argTypes == Seq(MapType(StringType, LongType)))
    // nested container values and a second argument after the map
    assert(parse(
      "CREATE FUNCTION g(MAP<STRING, ARRAY<DOUBLE>>, BIGINT) RETURNS INT AS 'x'").get
      .argTypes == Seq(MapType(StringType, ArrayType(DoubleType)), LongType))
    val e = intercept[AdhesiveException] {
      parse("CREATE FUNCTION h(MAP<STRING>) RETURNS INT AS 'x'")
    }
    assert(e.getMessage.contains("exactly two type parameters"))
  }

  test("STRUCT<name: TYPE, ...> argument type parses (flat, nested, malformed)") {
    assert(parse(
      "CREATE FUNCTION f(STRUCT<a: BIGINT, b: STRING>) RETURNS BIGINT AS 'x'").get
      .argTypes == Seq(StructType(Seq(
        StructField("a", LongType), StructField("b", StringType)))))
    // nested containers inside struct fields
    assert(parse(
      "CREATE FUNCTION g(STRUCT<xs: ARRAY<DOUBLE>, n: INT>) RETURNS INT AS 'x'").get
      .argTypes == Seq(StructType(Seq(
        StructField("xs", ArrayType(DoubleType)), StructField("n", IntegerType)))))
    val e = intercept[AdhesiveException] {
      parse("CREATE FUNCTION h(STRUCT<BIGINT>) RETURNS INT AS 'x'")
    }
    assert(e.getMessage.contains("expected name: TYPE"))
  }

  test("nested-angle RETURNS/STATE types tokenize whole") {
    // ARRAY<ARRAY<T>> in RETURNS position must reach parseType (and the
    // return-matrix), not break the grammar at the inner '>'
    assert(parse(
      "CREATE FUNCTION f(BIGINT) RETURNS ARRAY<ARRAY<BIGINT>> AS 'x'").get
      .returnType == ArrayType(ArrayType(LongType)))
    val agg = parse(
      "CREATE AGGREGATE FUNCTION g(BIGINT) RETURNS BIGINT STATE ARRAY<ARRAY<DOUBLE>> AS 'x'").get
    assert(agg.stateType.contains(ArrayType(ArrayType(DoubleType))))
    // depth 3-5 tokenize too (generated angle-nesting regex, depth 4 +
    // the outer level)
    assert(parse(
      "CREATE FUNCTION h(BIGINT) RETURNS ARRAY<ARRAY<ARRAY<BIGINT>>> AS 'x'").get
      .returnType == ArrayType(ArrayType(ArrayType(LongType))))
    assert(parse(
      "CREATE FUNCTION i(BIGINT) RETURNS ARRAY<MAP<STRING, ARRAY<ARRAY<BIGINT>>>> AS 'x'").get
      .returnType == ArrayType(MapType(StringType, ArrayType(ArrayType(LongType)))))
  }

  test("invalid DECIMAL precision/scale is a clear DDL error") {
    val e = intercept[AdhesiveException] {
      parse("CREATE FUNCTION f(DECIMAL(2,5)) RETURNS INT AS 'x'")
    }
    assert(e.getMessage.contains("invalid DECIMAL"))
    val e2 = intercept[AdhesiveException] {
      parse("CREATE FUNCTION f(DECIMAL(99,0)) RETURNS INT AS 'x'")
    }
    assert(e2.getMessage.contains("invalid DECIMAL"))
  }

  test("the declared-type lattice is closed under RETURNS (round 12)") {
    // every type the grammar can declare as an argument also parses and
    // REGISTERS as a return type — no declarable type hits the
    // return-matrix error anymore
    val stmt = parse(
      "CREATE FUNCTION f(BIGINT) RETURNS DECIMAL(10,2) AS 'class X {}'").get
    assert(stmt.returnType == DecimalType(10, 2))
    assert(parse(
      "CREATE FUNCTION f(BIGINT) RETURNS ARRAY<BIGINT> AS 'class X {}'").get
      .returnType == ArrayType(LongType))
    for (ret <- Seq("BINARY", "SMALLINT", "TINYINT", "MAP<STRING, BIGINT>",
        "ARRAY<BINARY>", "STRUCT<a: MAP<STRING, ARRAY<BIGINT>>>")) {
      AdhesiveDdl.execute(TestSpark.spark,
        s"""CREATE OR REPLACE FUNCTION f_lattice(BIGINT, BIGINT) RETURNS $ret LANGUAGE CLASS
           |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    }
    TestSpark.spark.sql("DROP TEMPORARY FUNCTION f_lattice")
    // the reference-parity "not supported (to be added)" error
    // (src/fusion.rs:86) still guards types the grammar cannot declare
    val e = intercept[AdhesiveException] {
      AdhesiveRegistry.registerClass(TestSpark.spark, "f_badret",
        "graft.adhesive.example.BasicAddExample",
        Seq(LongType, LongType), NullType)
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("non-adhesive SQL returns None (delegation)") {
    assert(parse("SELECT 1").isEmpty)
    assert(parse("CREATE TABLE t (a INT)").isEmpty)
    // Spark's native CREATE FUNCTION (no RETURNS) must delegate too
    assert(parse("CREATE FUNCTION h AS 'com.x.C' USING JAR '/j.jar'").isEmpty)
    // Spark 4 SQL UDFs (RETURN-body, no AS) must delegate — TEMPORARY
    // never matches the grammar, and even the non-TEMPORARY scalar/table
    // forms fail the AS-clause requirement (the q_sql_* queries pin this
    // end-to-end; these pin the parser boundary directly)
    assert(parse(
      "CREATE OR REPLACE TEMPORARY FUNCTION f(p DOUBLE) RETURNS DOUBLE RETURN p * 2").isEmpty)
    assert(parse(
      "CREATE FUNCTION f(p DOUBLE) RETURNS DOUBLE RETURN CAST(p AS DOUBLE)").isEmpty)
    assert(parse(
      "CREATE FUNCTION f(lo DOUBLE) RETURNS TABLE(q DOUBLE) RETURN SELECT lo").isEmpty)
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

  test("RETURNS ... NOT NULL parses in every position and body form") {
    val stmt = parse(
      "CREATE FUNCTION f(BIGINT) RETURNS BIGINT NOT NULL AS 'class X {}'").get
    assert(stmt.nonNullable && !stmt.deterministic)
    val both = parse("CREATE FUNCTION f(BIGINT) RETURNS BIGINT NOT NULL " +
      "DETERMINISTIC LANGUAGE CLASS AS \"a.B\"").get
    assert(both.nonNullable && both.deterministic && both.language == LangClass)
    assert(parse("CREATE FUNCTION f() RETURNS INT not null AS $$class Y{}$$")
      .get.nonNullable)
    // absent NOT NULL stays nullable
    assert(!parse("CREATE FUNCTION f(BIGINT) RETURNS BIGINT AS 'class X {}'")
      .get.nonNullable)
  }

  test("NOT NULL declares a non-nullable result column (null-check elision)") {
    val spark = TestSpark.spark
    spark.sql(
      """CREATE FUNCTION f_nn_inc(BIGINT) RETURNS BIGINT NOT NULL AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class NnInc extends Adhesive {
        |  public Object compute(Row row) { return row.getLong(0) + 1; }
        |}
        |$$""".stripMargin)
    val df = spark.sql("SELECT f_nn_inc(CAST(41 AS BIGINT)) AS v")
    assert(!df.schema("v").nullable,
      "NOT NULL must surface as a non-nullable schema field")
    assert(df.head().getLong(0) == 42L)
    // the plain form stays nullable — the fast path is opt-in
    val dfPlain = TestSpark.spark.sql("SELECT f_pkgpriv(CAST(1 AS BIGINT)) AS v")
    assert(dfPlain.schema("v").nullable)
  }

  test("returning NULL under NOT NULL fails the query with the kept message") {
    val spark = TestSpark.spark
    spark.sql(
      """CREATE FUNCTION f_nn_bad(BIGINT) RETURNS BIGINT NOT NULL AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class NnBad extends Adhesive {
        |  public Object compute(Row row) {
        |    return row.getLong(0) == 0L ? null : row.getLong(0);
        |  }
        |}
        |$$""".stripMargin)
    // non-null rows pass through the fast path
    assert(spark.sql("SELECT f_nn_bad(CAST(7 AS BIGINT)) AS v")
      .head().getLong(0) == 7L)
    val e = intercept[Exception] {
      spark.sql("SELECT f_nn_bad(CAST(0 AS BIGINT)) AS v").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("f_nn_bad") && m.contains("NOT NULL")),
      s"expected kept NOT NULL violation message, got: ${messages(e)}")
  }
}
