package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the duplicated-span detector (dd_dup_spans):
  * constructed corpora pin exactly where spans start, end, merge, and
  * split — the cases a corpus sample can't be trusted to contain.
  *
  * Token positions are 0-based; a duplicated 4-gram at position p covers
  * [p, p+3]; spans are maximal runs of covered tokens, so two hits merge
  * iff the later one starts within (previous covered end + 1).
  */
class DupSpansSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Writes a documents.parquet with the given texts into a fresh temp
    * dir shaped like an sf dir, returns the dir path.
    */
  private def corpus(texts: String*): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", "src0", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def spans(dir: String): Seq[(Long, Long, Long, Long)] =
    Dedup.dupSpanDf(spark, dir)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("a shared 6-token run yields one span covering exactly that run") {
    // tokens 2..7 of doc0 == tokens 0..5 of doc1; all other tokens unique
    val d = corpus(
      "u1 u2 a b c d e f u3 u4",
      "a b c d e f v1 v2 v3 v4")
    assert(spans(d) == Seq(
      (0L, 2L, 7L, 6L),
      (1L, 0L, 5L, 6L)))
  }

  test("two shared runs separated by >=1 unique token stay two spans") {
    val d = corpus(
      "a b c d x1 p q r s x2 x3",
      "a b c d y1 y2 p q r s y3")
    assert(spans(d) == Seq(
      (0L, 0L, 3L, 4L), (0L, 5L, 8L, 4L),
      (1L, 0L, 3L, 4L), (1L, 6L, 9L, 4L)))
  }

  test("adjacent coverage (zero-token gap) merges into one span") {
    // doc0 has "a b c d" then immediately "p q r s"; doc1/doc2 each share
    // one of the runs, so in doc0 the two hit intervals [0,3] and [4,7]
    // are adjacent -> one maximal duplicated span [0,7]
    val d = corpus(
      "a b c d p q r s",
      "a b c d z1 z2 z3 z4",
      "w1 w2 w3 w4 p q r s")
    assert(spans(d) == Seq(
      (0L, 0L, 7L, 8L),
      (1L, 0L, 3L, 4L),
      (2L, 4L, 7L, 4L)))
  }

  test("overlapping hits extend one island, not start a new one") {
    // doc0 tokens 0..4 ("a b c d e") all inside doc1 -> hits at pos 0 and
    // pos 1 overlap -> single span [0,4]
    val d = corpus(
      "a b c d e n1 n2 n3",
      "a b c d e m1 m2 m3")
    assert(spans(d) == Seq(
      (0L, 0L, 4L, 5L),
      (1L, 0L, 4L, 5L)))
  }

  test("a 4-gram repeated only within ONE doc is not a duplicated span") {
    // "a b c d" appears twice in doc0 but in no other doc; cross-document
    // df counts distinct docs, so it must not mark anything
    val d = corpus(
      "a b c d x1 x2 a b c d",
      "q1 q2 q3 q4 q5 q6 q7 q8")
    assert(spans(d).isEmpty)
  }

  test("docs shorter than the n-gram width never produce spans") {
    val d = corpus("a b c", "a b c", "long enough doc here ok yes")
    assert(spans(d).isEmpty)
  }

  test("threshold form (n=8): only duplicated substrings of >= 8 tokens are flagged") {
    // doc0/doc1 share a 10-token run AND a 7-token run; the substring
    // dedup at threshold 8 must flag exactly the 10-token one — the
    // 7-token duplicate contains no duplicated 8-gram
    val shared10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val shared7 = "t1 t2 t3 t4 t5 t6 t7"
    val d = corpus(
      s"u1 $shared10 u2 u3 $shared7 u4",
      s"$shared7 v1 v2 $shared10 v3")
    val got = Dedup.dupSpanDf(spark, d, n = 8)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // doc0: shared10 at tokens 1..10; doc1: shared10 at tokens 9..18
    assert(got == Seq((0L, 1L, 10L, 10L), (1L, 9L, 18L, 10L)))
    // the default 4-gram marker DOES see the 7-token run — the threshold
    // is what excluded it, not the machinery
    val at4 = spans(d)
    assert(at4.exists { case (_, _, _, len) => len == 7L })
  }

  test("self-repeats: later occurrences within ONE doc are flagged, first kept") {
    val d = corpus(
      // "a b c d" at pos 1 and pos 6: only the SECOND occurrence marks
      "x a b c d y a b c d z",
      // overlapping self-repeat: every 4-gram of "r r r r r" is the same
      // gram; occurrence 2 starts at pos 1 -> span [1, 4]
      "r r r r r",
      // cross-doc duplicate WITHOUT self-repeat: invisible here
      "p q s t u1", "p q s t u2")
    val got = Dedup.selfRepeatDf(spark, d)
      .orderBy("doc_id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((0L, 6L, 9L, 4L), (1L, 1L, 4L, 4L)))
    // ...and the cross-doc marker sees the OPPOSITE set: docs 2/3's
    // shared run, not the self-repeats
    val cross = spans(d).map(_._1).toSet
    assert(cross == Set(2L, 3L))
  }

  test("clean_substrings excises exactly the flagged spans") {
    val shared10 = "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"
    val d = corpus(
      s"u1 $shared10 u2",   // partial: the shared run is cut, ends kept
      shared10,             // fully duplicated -> empty clean text
      "w1 w2 w3 w4 w5 w6 w7 w8 w9") // unique -> untouched
    val got = Dedup.cleanSubstrings.build(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(
      (0L, "u1 u2", 12L, 10L),
      (1L, "", 10L, 10L),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", 9L, 0L)))
  }

  test("collision diagnosis: hashed-key spans equal text-keyed spans on real data") {
    // the debug path a suspected xxhash64 gram collision runs: symmetric
    // diff of the hashed marker against the text-keyed ground truth.
    // Empty on the driver testdata (and on any corpus without an actual
    // 64-bit collision); a collision would show up attributed as
    // src=hashed_only rows instead of an opaque oracle hash-mismatch
    val diff = Dedup.dupSpanCollisionDiff(spark, TestSpark.sfDir).collect()
    assert(diff.isEmpty,
      s"hashed vs text gram keys diverged: ${diff.take(5).mkString(";")}")
  }
}
