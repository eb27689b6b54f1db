package graft.operators

import graft.TestSpark
import graft.functions.{BpeTokenizer, FrozenBpeMerges}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[BpeTokenizer]]: the frozen fixture is pinned to the trainer (not
  * hand-maintainable), and the encode algorithm's two load-bearing
  * equivalences are property-tested — rank-order-with-fixpoint equals
  * the reference lowest-rank-pair-first loop on well-formed tables, and
  * the padded-string replace program the SQL oracle replays equals the
  * symbol-sequence merge.
  */
class BpeTokenizerSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("training on the sf0.01 corpus reproduces the frozen merge table exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the same word extraction ta_bpe_encode uses, counts via the
    // distributed aggregation (the scale shape: distinct words are the
    // small side; training is driver-side over that compact vocabulary)
    val counts = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
        .as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val trained = BpeTokenizer.train(counts, 40)
    assert(trained == FrozenBpeMerges.Merges,
      s"trainer drifted from the frozen fixture:\n$trained")
  }

  test("the frozen table is well-formed (every rule's symbols are chars or earlier outputs)") {
    assert(BpeTokenizer.wellFormed(FrozenBpeMerges.Merges))
    // and well-formedness is actually discriminating: a rule using a
    // symbol no earlier rule produced must fail
    assert(!BpeTokenizer.wellFormed(Seq(("ab", "c"))))
    assert(BpeTokenizer.wellFormed(Seq(("a", "b"), ("ab", "c"))))
  }

  test("hand example: train learns the frequency-ranked merges and encode applies them") {
    // 'abab' x3, 'abc' x1: (a,b) dominates, then (ab,ab) vs (ab,c) —
    // (ab,ab) counts 3, (ab,c) counts 1
    val merges = BpeTokenizer.train(Seq(("abab", 3L), ("abc", 1L)), 2)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
    assert(BpeTokenizer.encode("abab", merges) == Seq("abab"))
    assert(BpeTokenizer.encode("abc", merges) == Seq("ab", "c"))
    assert(BpeTokenizer.encode("x", merges) == Seq("x"))
    assert(BpeTokenizer.encode("", merges) == Seq.empty)
  }

  test("merges are left-to-right non-overlapping: 'aaa' under (a,a) is [aa, a]") {
    val m = Seq(("a", "a"))
    assert(BpeTokenizer.encode("aaa", m) == Seq("aa", "a"))
    assert(BpeTokenizer.encode("aaaa", m) == Seq("aa", "aa"))
    assert(BpeTokenizer.encode("aaaaa", m) == Seq("aa", "aa", "a"))
  }

  test("scale shape: memoized encode runs per DISTINCT word, not per occurrence") {
    // 100k word occurrences over a 500-word vocabulary — the Zipf shape
    // real corpora have. The ta_bpe_encode plan encodes the distinct-word
    // table and broadcast-joins back; the naive plan would run the UDF
    // per occurrence. Counted exactly with an accumulator inside the UDF.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val occurrences = 100000L
    val vocabSize = 500
    val words = spark.range(occurrences)
      .select((col("id") % vocabSize).as("wid"))
      .select(concat(lit("w"), col("wid"),
        lit("x"), col("wid") % 7).as("w"))
    val calls = spark.sparkContext.longAccumulator("bpe-encode-calls")
    val merges = FrozenBpeMerges.Merges
    // nondeterministic exactly as ta_bpe_encode's UDF: without it,
    // InferFiltersFromGenerate + predicate pushdown re-evaluate the UDF
    // per occurrence row below the distinct (measured 200,500 calls for
    // this fixture — the regression this test exists to catch)
    val countingEncode = udf { (w: String) =>
      calls.add(1); BpeTokenizer.encode(w, merges)
    }.asNondeterministic()
    val pieces = words.select($"w").distinct()
      .withColumn("ps", countingEncode($"w"))
    val n = words.join(broadcast(pieces), "w")
      .select(posexplode($"ps")).count()
    assert(n > occurrences, s"every word must emit >= 1 piece: $n")
    info(s"UDF calls for $occurrences occurrences over $vocabSize words: ${calls.value}")
    // speculative re-execution can re-run a task, so allow slack — but
    // the count must be vocabulary-scale, nowhere near occurrence-scale
    assert(calls.value >= vocabSize,
      s"expected at least one call per distinct word: ${calls.value}")
    assert(calls.value <= vocabSize * 4L,
      s"encode ran per occurrence, not per distinct word: ${calls.value}")
  }

  /** The reference encoder: repeatedly find the LOWEST-RANK rule whose
    * pair occurs anywhere, apply one full left-to-right pass of it,
    * until no rule applies — the loop production BPE encoders run.
    */
  private def referenceEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toVector
    var done = false
    while (!done && syms.length > 1) {
      val present = syms.sliding(2).collect {
        case Vector(a, b) if rank.contains((a, b)) => (a, b)
      }.toSeq
      if (present.isEmpty) done = true
      else {
        val best = present.minBy(rank)
        // one pass; the outer loop re-scans, so fixpoint is implicit
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && (syms(i), syms(i + 1)) == best) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** The oracle's program, simulated exactly: padded symbol string,
    * each rule merges its LEFTMOST occurrence repeatedly until absent.
    * Pinning encode == this is what licenses the SQL recursive CTE as
    * the cross-engine ground truth.
    */
  private def oracleEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var s = word.map(_.toString).mkString(" ", " ", " ")
    merges.foreach { case (a, b) =>
      val pat = s" $a $b "
      val rep = s" ${a + b} "
      var p = s.indexOf(pat)
      while (p >= 0) {
        s = s.substring(0, p) + rep + s.substring(p + pat.length)
        p = s.indexOf(pat)
      }
    }
    s.trim.split(' ').toSeq
  }

  test("property: rank-order fixpoint encode equals lowest-rank-first reference on trained tables") {
    val rnd = new Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 60) {
      // a random corpus over a tiny alphabet maximizes merge collisions
      val corpus = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          1L + rnd.nextInt(5))
      }
      val merges = BpeTokenizer.train(corpus, 1 + rnd.nextInt(10))
      assert(BpeTokenizer.wellFormed(merges), s"trial $trial: $merges")
      for (_ <- 1 to 20) {
        val w = Seq.fill(1 + rnd.nextInt(12))(
          alphabet(rnd.nextInt(alphabet.length))).mkString
        val got = BpeTokenizer.encode(w, merges)
        val want = referenceEncode(w, merges)
        assert(got == want,
          s"trial $trial word '$w' merges $merges: got $got want $want")
        assert(got == oracleEncode(w, merges),
          s"trial $trial word '$w': oracle replay diverged from encode")
        assert(got.mkString == w, "encode must be a partition of the word")
      }
    }
  }
}
