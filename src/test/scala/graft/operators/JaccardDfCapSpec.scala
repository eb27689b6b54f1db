package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SCALE.md df-cap knob must not lose qualifying pairs on THIS corpus'
  * word grams: capping shingle document frequency during candidate
  * generation (the quadratic-fan-out guard for 100 TB) yields exactly the
  * uncapped pair set here, because near-dups share many rare word
  * shingles. (A cap is NOT lossless in general — on char grams at sf0.1 a
  * cap of 50 finds 148 of the true 256 pairs because some near-dups share
  * only high-df grams; dd_chargram_jaccard runs cap 400, measured exact
  * there, and [[Dedup.jaccardPairsPrefix]] is the provably-exact scheme.)
  */
class JaccardDfCapSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("df-capped candidate generation finds the same pairs as uncapped") {
    val sf = TestSpark.sfDir
    def pairs(cap: Option[Long]): Set[(Long, Long)] = {
      val sh = Dedup.shingleDf(spark, sf)
      Dedup.jaccardPairs(sh, 0.6, cap)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val uncapped = pairs(None)
    val capped = pairs(Some(50L))
    assert(uncapped.nonEmpty)
    assert(capped == uncapped)
  }

  test("prefix filtering finds exactly the uncapped pair set") {
    val sf = TestSpark.sfDir
    val sh = Dedup.shingleDf(spark, sf)
    val uncapped = Dedup.jaccardPairs(sh, 0.6, None)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefix = Dedup.jaccardPairsPrefix(Dedup.shingleDf(spark, sf), 3L, 5L)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prefix == uncapped)
  }
}
