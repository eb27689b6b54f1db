package graft.adhesive

import graft.TestSpark
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.scalatest.funsuite.AnyFunSuite

/** [[AdhesiveConstantFolding]]: DETERMINISTIC calls over literal arguments
  * fold to a plan-time Literal; volatile calls and non-literal arguments
  * never fold; a throwing call is left in place so the error still
  * surfaces at execution.
  */
class ConstantFoldingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def hasUdf(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[ScalaUDF]))

  private def define(name: String, deterministic: Boolean): Unit = {
    val det = if (deterministic) "DETERMINISTIC " else ""
    spark.sql(s"""CREATE OR REPLACE FUNCTION $name(BIGINT, BIGINT)
      RETURNS BIGINT ${det}LANGUAGE JAVA AS '
      import graft.adhesive.Adhesive;
      import org.apache.spark.sql.Row;
      public class FoldAdd extends Adhesive {
        public Object compute(Row row) {
          long b = row.getLong(1);
          if (b == 13L) throw new RuntimeException("unlucky");
          return row.getLong(0) + b;
        }
      }'""")
  }

  test("deterministic call over literals folds to a Literal") {
    define("fold_det", deterministic = true)
    val df = spark.sql("SELECT fold_det(40L, 2L) AS v FROM range(3)")
    assert(!hasUdf(df), "expected the call to fold out of the plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(42L, 42L, 42L))
  }

  test("volatile call over literals does NOT fold (reference Volatile parity)") {
    define("fold_vol", deterministic = false)
    val df = spark.sql("SELECT fold_vol(40L, 2L) AS v FROM range(3)")
    assert(hasUdf(df), "volatile call must stay in the plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(42L, 42L, 42L))
  }

  test("deterministic call over a column does NOT fold") {
    define("fold_col", deterministic = true)
    val df = spark.sql("SELECT fold_col(CAST(id AS BIGINT), 2L) AS v FROM range(3)")
    assert(hasUdf(df), "non-literal args must stay in the plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
  }

  test("deterministic STRING-returning call over literals folds to a Literal") {
    // the folded value crosses the CatalystTypeConverters boundary
    // (String -> UTF8String) — the extended return matrix must fold too
    spark.sql("""CREATE OR REPLACE FUNCTION fold_str(STRING)
      RETURNS STRING DETERMINISTIC LANGUAGE JAVA AS '
      import graft.adhesive.Adhesive;
      import org.apache.spark.sql.Row;
      public class FoldUp extends Adhesive {
        public Object compute(Row row) { return row.getString(0).toUpperCase(java.util.Locale.ROOT); }
      }'""")
    val df = spark.sql("SELECT fold_str('abc') AS v FROM range(2)")
    assert(!hasUdf(df), "expected the STRING call to fold out of the plan")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("ABC", "ABC"))
  }

  test("throwing call over literals is left unfolded and fails at execution") {
    define("fold_boom", deterministic = true)
    val df = spark.sql("SELECT fold_boom(1L, 13L) AS v FROM range(1)")
    assert(hasUdf(df), "a throwing call must not be folded away")
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("unlucky")))
  }
}
