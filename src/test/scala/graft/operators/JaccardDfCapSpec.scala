package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The SCALE.md df-cap knob must not lose qualifying pairs: capping shingle
  * document frequency during candidate generation (the quadratic-fan-out
  * guard for 100 TB) yields exactly the uncapped pair set here, because
  * near-dups share many rare shingles.
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
}
