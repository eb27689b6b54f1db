package graft.adhesive

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end golden tests replicating the reference's factory test
  * (`/root/reference/tests/factory.rs:11-78`): 4-row table `t(a, b)`,
  * `CREATE FUNCTION` in both languages, `SELECT f(a, b) FROM t`, golden
  * outputs f1 = a*b → [10,40,90,160], f2 = a+b → [11,22,33,44].
  */
class AdhesiveFactorySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def fixture(): Unit = {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)).toDF("a", "b")
    df.createOrReplaceTempView("t")
  }

  test("LANGUAGE JAVA: inline source compiled and invoked, f1 = a*b") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f1(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class Multiply extends Adhesive {
        |  public Object compute(Row row) {
        |    return row.getLong(0) * row.getLong(1);
        |  }
        |}
        |'""".stripMargin)
    val out = spark.sql("SELECT a, b, f1(a, b) AS f1 FROM t ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 10L, 10L), (2L, 20L, 40L), (3L, 30L, 90L), (4L, 40L, 160L)))
  }

  test("LANGUAGE CLASS: classpath class resolved and invoked, f2 = a+b") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f2(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    val out = spark.sql("SELECT f2(a, b) AS f2 FROM t ORDER BY a")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(11L, 22L, 33L, 44L))
  }

  test("language omitted defaults to JAVA (reference src/fusion.rs:31-35)") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_default(BIGINT) RETURNS BIGINT AS '
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class Neg extends Adhesive {
        |  public Object compute(Row row) { return -row.getLong(0); }
        |}
        |'""".stripMargin)
    val out = spark.sql("SELECT f_default(a) AS v FROM t ORDER BY a")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(-1L, -2L, -3L, -4L))
  }

  test("CREATE OR REPLACE re-registers under a fresh generated package") {
    fixture()
    def ddl(expr: String) = spark.sql(
      s"""CREATE OR REPLACE FUNCTION f_redef(BIGINT) RETURNS BIGINT AS '
         |import graft.adhesive.Adhesive;
         |import org.apache.spark.sql.Row;
         |public class Redef extends Adhesive {
         |  public Object compute(Row row) { return $expr; }
         |}
         |'""".stripMargin)
    ddl("row.getLong(0) + 1")
    assert(spark.sql("SELECT f_redef(CAST(1 AS BIGINT)) AS v").head().getLong(0) == 2L)
    ddl("row.getLong(0) + 100")
    assert(spark.sql("SELECT f_redef(CAST(1 AS BIGINT)) AS v").head().getLong(0) == 101L)
  }

  test("DROP TEMPORARY FUNCTION completes the lifecycle: dropped name unresolvable") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_drop(BIGINT) RETURNS BIGINT AS '
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class Dropper extends Adhesive {
        |  public Object compute(Row row) { return row.getLong(0); }
        |}
        |'""".stripMargin)
    assert(spark.sql("SELECT f_drop(CAST(7 AS BIGINT)) AS v").head().getLong(0) == 7L)
    // adhesive functions live in the session registry like any temp
    // function, so Spark's own DROP path removes them — no custom DDL
    spark.sql("DROP TEMPORARY FUNCTION f_drop")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT f_drop(CAST(7 AS BIGINT))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("f_drop"))
  }

  test("double-quoted class body: the reference README's LANGUAGE CLASS form") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_dq(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS "graft.adhesive.example.BasicAddExample"""".stripMargin)
    val out = spark.sql("SELECT f_dq(a, b) AS v FROM t ORDER BY a")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(11L, 22L, 33L, 44L))
  }

  test("dollar-quoted body needs no quote escaping (the form the reference TODO'd)") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_dollar(BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class Dollar extends Adhesive {
        |  public Object compute(Row row) { return (long) 'x' + row.getLong(0); }
        |}
        |$$""".stripMargin)
    val out = spark.sql("SELECT f_dollar(a) AS v FROM t WHERE a = 1").head().getLong(0)
    assert(out == 'x'.toLong + 1)
  }

  test("LANGUAGE SCALA: inline Scala source compiled and invoked") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_scala(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE SCALA AS $$
        |import graft.adhesive.Adhesive
        |import org.apache.spark.sql.Row
        |class ScalaMax extends Adhesive {
        |  override def compute(row: Row): Object =
        |    java.lang.Long.valueOf(math.max(row.getLong(0), row.getLong(1)))
        |}
        |$$""".stripMargin)
    val out = spark.sql("SELECT f_scala(a, b) AS v FROM t ORDER BY a")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(10L, 20L, 30L, 40L))
  }

  test("DataFrame API path: call_function resolves the registered function") {
    fixture()
    spark.sql(
      """CREATE FUNCTION f_df(BIGINT, BIGINT) RETURNS BIGINT LANGUAGE CLASS
        |AS 'graft.adhesive.example.BasicAddExample'""".stripMargin)
    import org.apache.spark.sql.functions._
    val out = spark.table("t")
      .select(call_function("f_df", $"a", $"b").as("s"))
      .orderBy($"s").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(11L, 22L, 33L, 44L))
  }
}
