package graft.operators

import graft.TestSpark
import graft.functions.BottomKLongs
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bounded posting-head aggregator (ta_inverted_index's skew
  * device): the buffer never exceeds k, and the result is the k smallest
  * values ascending regardless of arrival or merge order.
  */
class InvertedIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("BottomKLongs keeps the k smallest, ascending, buffer capped at k") {
    val agg = new BottomKLongs(3)
    val buf = Seq(9L, 4L, 7L, 1L, 8L, 2L, 6L).foldLeft(agg.zero)(agg.reduce)
    assert(buf == Seq(1L, 2L, 4L))
    assert(buf.size <= 3)
  }

  test("merge of partial buffers equals the global bottom-k") {
    val agg = new BottomKLongs(3)
    val a = Seq(5L, 3L, 11L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2L, 9L, 1L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b) == Seq(1L, 2L, 3L))
    assert(agg.merge(b, a) == agg.merge(a, b))
    assert(agg.merge(a, agg.zero) == a)
  }

  test("property: any partition of the input merges to the global bottom-k") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check, Parameters}
    import org.scalacheck.Gen
    val agg = new BottomKLongs(5)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    val prop = forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      merged == xs.sorted.take(5)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: TopKDoubles partial merges equal the global top-k") {
    import graft.functions.TopKDoubles
    import org.scalacheck.Prop.forAll
    import org.scalacheck.Test.{check, Parameters}
    import org.scalacheck.Gen
    val agg = new TopKDoubles(5)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(-1e12, 1e12))
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs, cut)
    val prop = forAll(gen) { case (xs, cut) =>
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      merged == xs.sorted(Ordering[Double].reverse).take(5)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("inverted index postings are df-capped sorted doc_id heads") {
    import org.apache.spark.sql.functions.col
    val rows = TextAnalysis.invertedIndex
      .build(spark, TestSpark.sfDir)
      .filter(col("token") === "table").collect()
    assert(rows.length == 1)
    val r = rows.head
    val df = r.getAs[Long]("df")
    val tf = r.getAs[Long]("tf")
    // Postings travel as a comma-joined string so the driver's pandas
    // checker can sort/hash the column; parse it back for the invariants.
    val postings = r.getAs[String]("postings").split(',').map(_.toLong).toSeq
    assert(tf >= df)
    assert(postings == postings.sorted)
    assert(postings.distinct == postings)
    assert(postings.size == math.min(df, 20L))
  }
}
