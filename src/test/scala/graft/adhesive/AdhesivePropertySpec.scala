package graft.adhesive

import graft.TestSpark
import graft.functions.RollingHash
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}
import org.scalacheck.{Gen, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 rebuild test plan): engine results over
  * generated inputs, and algebraic laws of the hash primitives.
  */
class AdhesivePropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def passes(p: org.scalacheck.Prop, trials: Int = 15): Unit = {
    val res = check(Parameters.default.withMinSuccessfulTests(trials), p)
    assert(res.passed, res.status.toString)
  }

  test("property: registered multiply equals Scala multiply over random longs") {
    AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE FUNCTION prop_mul(BIGINT, BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class PropMul extends Adhesive {
        |  public Object compute(Row row) { return row.getLong(0) * row.getLong(1); }
        |}
        |$$""".stripMargin)
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.long, Gen.long))
    passes(forAll(gen) { pairs =>
      pairs.toDF("a", "b").createOrReplaceTempView("prop_t")
      val got = spark.sql("SELECT a, b, prop_mul(a, b) AS p FROM prop_t")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.forall { case (a, b, p) => p == a * b }
    })
  }

  test("property: null-in propagates through a null-checking compute") {
    AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE FUNCTION prop_nullsafe(BIGINT) RETURNS BIGINT AS $$
        |import graft.adhesive.Adhesive;
        |import org.apache.spark.sql.Row;
        |public class PropNull extends Adhesive {
        |  public Object compute(Row row) {
        |    if (row.isNullAt(0)) return null;
        |    return row.getLong(0) + 1;
        |  }
        |}
        |$$""".stripMargin)
    val gen = Gen.nonEmptyListOf(Gen.option(Gen.long))
    passes(forAll(gen) { xs =>
      xs.toDF("a").createOrReplaceTempView("prop_n")
      val got = spark.sql("SELECT a, prop_nullsafe(a) AS v FROM prop_n")
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
          if (r.isNullAt(1)) None else Some(r.getLong(1))))
      got.forall { case (in, out) => out == in.map(_ + 1) }
    })
  }

  test("property: rolling hash obeys the concatenation law") {
    // h(a ++ b) = h(a)·B^|b| + h(b)  (mod 2^61−1)
    def powMod(base: Long, e: Int): Long =
      (0 until e).foldLeft(1L)((acc, _) => RollingHash.mulMod(acc, base))
    passes(forAll { (a: String, b: String) =>
      val bBytes = b.getBytes("UTF-8").length
      val expected = (RollingHash.mulMod(
        RollingHash.hashBytes(a.getBytes("UTF-8")),
        powMod(RollingHash.Base, bBytes)) +
        RollingHash.hashBytes(b.getBytes("UTF-8"))) % RollingHash.Mod
      RollingHash.hashBytes((a + b).getBytes("UTF-8")) == expected
    }, trials = 100)
  }
}
