package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the Unicode semantics of the edit-distance verifier
  * (dd_edit_verify): Spark's `levenshtein` counts Unicode CODE POINTS,
  * while DuckDB's counts UTF-8 BYTES — the cross-engine oracle
  * equivalence therefore holds only on ASCII text (one code point = one
  * byte), which the synthetic corpus satisfies. These fixtures make the
  * divergence concrete so the assumption is tested, not just documented,
  * and pin the production rule: NFC-normalize first, code-point distance
  * is the defined semantics (see Dedup.editVerify docstring).
  */
class EditDistanceUnicodeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def dist(a: String, b: String): Long = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(levenshtein($"a", $"b").cast("long")).collect()(0).getLong(0)
  }

  test("ASCII: code-point distance equals byte distance") {
    // On ASCII the two engines agree by construction.
    assert(dist("kitten", "sitting") == 3L)
    assert(dist("abc", "abc") == 0L)
  }

  test("non-ASCII: Spark counts code points, not UTF-8 bytes") {
    // 'é' (U+00E9) is 2 UTF-8 bytes: byte-wise engines report 2 here.
    assert(dist("café", "cafe") == 1L)
    // '€' (U+20AC) is 3 UTF-8 bytes; still one code-point substitution.
    assert(dist("€", "e") == 1L)
  }

  test("NFC normalization collapses composed/decomposed before distance") {
    import spark.implicits._
    // "é" composed (U+00E9) vs decomposed ("e" + U+0301): distance 2
    // raw (one substitution + one deletion of the combining mark), 0
    // after both sides are NFC-normalized — the production pre-step.
    val composed = "café"
    val decomposed = "café"
    assert(dist(composed, decomposed) == 2L)
    import graft.functions.UnicodeNormalize.unicode_normalize
    val df = Seq((composed, decomposed)).toDF("a", "b")
      .select(levenshtein(
        unicode_normalize($"a", "NFC"),
        unicode_normalize($"b", "NFC")).cast("long"))
    assert(df.collect()(0).getLong(0) == 0L)
  }
}
