package graft.operators

import graft.functions.BpeTokenizer
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** [[BpeTokenizer.RankEncoder]] — the heap-walk encode — is EXACTLY
  * [[BpeTokenizer.encode]] for every well-formed merge table, and
  * [[BpeTokenizer.trainIncremental]] is exactly [[BpeTokenizer.train]]:
  * the production-vocabulary shapes change the algorithm, never the
  * answer. Pinned by property over the frozen char and byte fixtures
  * (the tables every `ta_bpe_*` oracle replays), over freshly TRAINED
  * random tables, and over the adversarial same-symbol runs where a
  * wrong tie-break shows first (`aaaa…` must merge left-to-right).
  * No Spark session — this is the pure encode kernel.
  */
class BpeHeapEncodeSpec extends AnyFunSuite {

  private def randWord(rnd: Random, alphabet: String, maxLen: Int): String =
    (0 until rnd.nextInt(maxLen + 1))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("heap encode == reference encode on the frozen char table over random [a-z]+ words") {
    val merges = BpeTokenizer.FrozenMerges
    val enc = new BpeTokenizer.RankEncoder(merges)
    val rnd = new Random(17)
    (0 until 5000).foreach { _ =>
      val w = randWord(rnd, "abcdefghijklmnopqrstuvwxyz", 24)
      val ref = BpeTokenizer.encode(w, merges)
      val got = enc.encode(w)
      assert(got == ref, s"'$w': heap $got vs reference $ref")
      assert(got.mkString == w, "pieces must partition the word")
    }
  }

  test("heap byte encode == reference on the frozen byte table over random multi-script Unicode") {
    val merges = BpeTokenizer.FrozenByteMerges
    val enc = new BpeTokenizer.RankEncoder(merges)
    val rnd = new Random(29)
    val scripts = Seq(
      "the quick brown fox 0123456789",
      "ÀÉÎÕÜßàéîõüÿ",
      "ΑΒΓΔΩαβγδω",
      "БГДЖЗИЙЛПФ",
      "אבגדהוזחטי",
      "中文分词测试汉字",
      "日本語のトークン",
      "🙂🚀𝕏𝟘𝟙", // astral plane: surrogate pairs byte-split correctly
      "!@#$%^&*()_+-=[]{};':\",./<>?")
    (0 until 3000).foreach { _ =>
      val script = scripts(rnd.nextInt(scripts.size))
      val w = (0 until rnd.nextInt(12))
        .map(_ => script.charAt(rnd.nextInt(script.length))).mkString
      val ref = BpeTokenizer.encodeBytes(w, merges)
      val got = enc.encodeBytes(w)
      assert(got == ref, s"'$w': heap $got vs reference $ref")
      // decode inverts encode for every VALID UTF-16 string; random
      // char sampling can tear a surrogate pair, which has no UTF-8
      // round-trip to assert (both paths still agree above)
      if (validUtf16(w))
        assert(BpeTokenizer.decodeBytes(got) == w,
          s"decode must invert encode for '$w'")
    }
  }

  private def validUtf16(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  test("heap encode == reference encode on freshly TRAINED random tables (ranks exercised end to end)") {
    val rnd = new Random(41)
    (0 until 20).foreach { round =>
      val alphabet = "abcdef" // small alphabet → dense merges, deep ranks
      val vocab = (0 until 200)
        .map(_ => randWord(rnd, alphabet, 12))
        .filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
      val merges = BpeTokenizer.train(vocab, numMerges = 40)
      assert(BpeTokenizer.wellFormed(merges))
      val enc = new BpeTokenizer.RankEncoder(merges)
      (0 until 300).foreach { _ =>
        val w = randWord(rnd, alphabet, 20)
        val ref = BpeTokenizer.encode(w, merges)
        assert(enc.encode(w) == ref,
          s"round $round '$w': ${enc.encode(w)} vs $ref")
      }
    }
  }

  test("adversarial tie-breaks: same-symbol runs merge LEFT-to-right, exactly like the reference pass") {
    val merges = Seq(("a", "a"), ("aa", "a"), ("aa", "aa"), ("b", "a"))
    assert(BpeTokenizer.wellFormed(merges))
    val enc = new BpeTokenizer.RankEncoder(merges)
    // aaaaa: (a,a) L2R pass → [aa, aa, a]; (aa,a) no adjacent (aa,a)?
    // — the reference computes whatever it computes; the point is
    // exact agreement on every run length
    (0 to 12).foreach { n =>
      val w = "a" * n
      assert(enc.encode(w) == BpeTokenizer.encode(w, merges),
        s"run length $n")
      val wb = "b" + "a" * n
      assert(enc.encode(wb) == BpeTokenizer.encode(wb, merges),
        s"b-prefixed run length $n")
    }
    // pinned end state: (a,a) left-to-right gives [aa, aa, a], then
    // (aa,a) folds the tail → [aa, aaa]. A right-biased tie-break
    // would give [a, aa, aa] → [aaa, aa] instead.
    assert(enc.encode("aaaaa") == Seq("aa", "aaa"))
  }

  test("trainIncremental == train: identical merges on random vocabularies and the frozen fixtures' sizes") {
    val rnd = new Random(53)
    (0 until 12).foreach { round =>
      val alphabet = if (round % 2 == 0) "abcde" else "abcdefghij"
      val vocab = (0 until 300)
        .map(_ => randWord(rnd, alphabet, 10))
        .filter(_.nonEmpty)
        .groupBy(identity).map { case (w, ws) =>
          (w, ws.size.toLong * (1 + rnd.nextInt(5))) }.toSeq
      val n = 60
      val a = BpeTokenizer.train(vocab, n)
      val b = BpeTokenizer.trainIncremental(vocab, n)
      assert(a == b, s"round $round: trainers diverged at " +
        s"rank ${a.zip(b).indexWhere(p => p._1 != p._2)}")
    }
    // early-stop parity: a vocabulary that runs out of pairs
    val tiny = Seq(("ab", 3L), ("ab", 2L), ("a", 1L))
    assert(BpeTokenizer.train(tiny, 100) ==
      BpeTokenizer.trainIncremental(tiny, 100))
  }

  test("RankEncoder refuses a malformed table instead of silently mis-encoding") {
    val bad = Seq(("xy", "z")) // xy is no rule's output and not a char
    val e = intercept[IllegalArgumentException] {
      new BpeTokenizer.RankEncoder(bad)
    }
    assert(e.getMessage.contains("well-formed"))
  }

  test("UDFs over a malformed table fall back to the scan encoder instead of throwing at construction") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // hand-built table: rule 0 uses rule 1's output — NOT well-formed
    // (a truncated or reordered vendor file has exactly this shape),
    // so the heap path's equivalence proof does not apply; the UDF
    // must keep the reference sequential-scan semantics instead of
    // failing its construction
    val bad = Seq(("ab", "c"), ("a", "b"))
    assert(!BpeTokenizer.wellFormed(bad))
    val words = Seq("abcab", "aabbcc", "cabab")
    val got = words.toDF("w")
      .select(BpeTokenizer.encodeUdf(bad)($"w").as("ps"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == words.map(w => BpeTokenizer.encode(w, bad)),
      "fallback must reproduce the scan semantics exactly")
    val gotBytes = words.toDF("w")
      .select(BpeTokenizer.encodeBytesUdf(bad)($"w").as("ps"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(gotBytes == words.map(w => BpeTokenizer.encodeBytes(w, bad)))
    // and a well-formed table still takes the heap path (same results)
    val good = Seq(("a", "b"), ("ab", "c"))
    assert(BpeTokenizer.wellFormed(good))
    val gotGood = words.toDF("w")
      .select(BpeTokenizer.encodeUdf(good)($"w").as("ps"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(gotGood == words.map(w => BpeTokenizer.encode(w, good)))
  }
}
