package graft.operators

import graft.TestSpark
import graft.functions.{BpeTokenizer, FrozenBpeMerges}
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Byte-level BPE ([[BpeTokenizer.encodeBytes]]): the properties that
  * make it the TOTAL-domain tokenizer — the byte↔char remap is a
  * bijection, encode partitions the input's bytes losslessly for
  * arbitrary Unicode, every emitted piece has an id (no OOV), and the
  * frozen byte merge table is pinned to the trainer over the same
  * enriched corpus `ta_bpe_bytes` tokenizes.
  */
class ByteBpeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val merges = BpeTokenizer.FrozenByteMerges
  private val ids = BpeTokenizer.byteVocabIds(merges)

  test("byte-to-char map is a bijection onto printable non-space chars") {
    assert(BpeTokenizer.ByteToChar.length == 256)
    assert(BpeTokenizer.ByteToChar.distinct.length == 256, "not injective")
    // no symbol may collide with the padded-replay delimiter, and every
    // mapped char must survive a trim() round-trip as a 1-char string
    BpeTokenizer.ByteToChar.foreach { c =>
      assert(!c.isWhitespace && !c.isControl, f"byte char U+${c.toInt}%04X")
    }
    // the GPT-2 construction: printable single-byte ranges map to
    // themselves, everything else to 256+n in byte order
    assert(BpeTokenizer.ByteToChar('a'.toInt) == 'a')
    assert(BpeTokenizer.ByteToChar('!'.toInt) == '!')
    assert(BpeTokenizer.ByteToChar(0) == 256.toChar)
    assert(BpeTokenizer.ByteToChar(' '.toInt) != ' ')
  }

  test("training on the enriched sf0.01 corpus reproduces the frozen byte table exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val counts = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .select(explode(expr(
        s"regexp_extract_all(${TextAnalysis.ByteRichExpr}, '\\\\S+', 0)"))
        .as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .collect().map(r => (BpeTokenizer.toByteChars(r.getString(0)),
        r.getLong(1))).toSeq
    val trained = BpeTokenizer.train(counts, 48)
    assert(trained == FrozenBpeMerges.ByteMerges,
      s"trainer drifted from the frozen byte fixture:\n$trained")
  }

  test("frozen byte table is well-formed; learned merges include digits, case and multi-byte sequences") {
    assert(BpeTokenizer.wellFormed(merges))
    val outputs = merges.map { case (a, b) => a + b }
    assert(outputs.exists(_.forall(_.isDigit)), "no digit merge learned")
    assert(outputs.exists(_.exists(_.isUpper)), "no cased merge learned")
    assert(outputs.exists(_.exists(_ >= 128.toChar)),
      "no multi-byte UTF-8 merge learned")
  }

  test("totality + losslessness: arbitrary Unicode encodes, every piece has an id, decode round-trips") {
    val rnd = new Random(7)
    val pools = Seq(
      "abcdefghijklmnopqrstuvwxyz",
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789",
      "!@#$%^&*()_+-=[]{}|;:'\",.<>?/\\`~",
      "àéîöūçñßæøå",
      "日本語中文한국어",
      "δθλπφωΩΣ",
      "😀🙂🚀🌍☕№—…")
    for (trial <- 1 to 200) {
      val pool = pools(rnd.nextInt(pools.length)) +
        pools(rnd.nextInt(pools.length))
      // build from whole code points so surrogate pairs stay intact
      val w = {
        val sb = new StringBuilder
        val cpArr = pool.codePoints().toArray
        (1 to (1 + rnd.nextInt(12))).foreach { _ =>
          sb.appendAll(Character.toChars(cpArr(rnd.nextInt(cpArr.length))))
        }
        sb.toString
      }
      val pieces = BpeTokenizer.encodeBytes(w, merges)
      assert(pieces.nonEmpty == w.nonEmpty)
      pieces.foreach { p =>
        assert(ids.contains(p), s"trial $trial: OOV piece '$p' for word '$w'")
      }
      assert(BpeTokenizer.decodeBytes(pieces) == w,
        s"trial $trial: decode lost bytes for '$w'")
      // id round-trip: base ids are byte values, learned ids are 256+k
      val tids = pieces.map(ids)
      tids.foreach(t => assert(t >= 0 && t < 256 + merges.length))
    }
    // the empty string and pure-whitespace edge
    assert(BpeTokenizer.encodeBytes("", merges) == Seq.empty)
  }

  test("byte encode equals the padded-string oracle replay over remapped symbols") {
    // the SQL oracle runs leftmost-occurrence replacement on the
    // byte-char string — same program BpeTokenizerSpec pins for the
    // char-level table; asserted here over the BYTE alphabet with the
    // frozen table and byte-rich words
    def oracleEncode(sym: String): Seq[String] = {
      if (sym.isEmpty) return Seq.empty
      var s = sym.map(_.toString).mkString(" ", " ", " ")
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
    for (w <- Seq("Doc", "#420:", "café", "№7", "☕🙂", "3.14!", "—",
        "batch", "slowslow", "MiXeD42", "日本", "a b".replace(" ", " "))) {
      assert(BpeTokenizer.encodeBytes(w, merges) ==
        oracleEncode(BpeTokenizer.toByteChars(w)), s"word '$w'")
    }
  }

  test("byte vocab ids: total, stable, collision-free (byte b ↦ b, merge k ↦ 256+k)") {
    assert(ids.size == 256 + merges.length)
    assert(ids(BpeTokenizer.ByteToChar('a'.toInt).toString) == 'a'.toInt)
    assert(ids(BpeTokenizer.ByteToChar(0).toString) == 0)
    merges.zipWithIndex.foreach { case ((a, b), k) =>
      assert(ids(a + b) == 256 + k)
    }
  }

  test("scale shape: byte encode runs per DISTINCT pretoken, not per occurrence") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val occurrences = 50000L
    val vocabSize = 400
    val words = spark.range(occurrences)
      .select(concat(lit("W"), col("id") % vocabSize, lit("é#"),
        col("id") % 3).as("w"))
    val calls = spark.sparkContext.longAccumulator("byte-bpe-calls")
    // local copy: a field reference would drag the spec instance (and
    // its SparkSession) into the UDF closure — Task not serializable
    val m = merges
    val countingEncode = udf { (w: String) =>
      calls.add(1); BpeTokenizer.encodeBytes(w, m)
    }.asNondeterministic()
    val pieces = words.select($"w").distinct()
      .withColumn("ps", countingEncode($"w"))
    val n = words.join(broadcast(pieces), "w")
      .select(posexplode($"ps")).count()
    assert(n > occurrences)
    assert(calls.value >= vocabSize * 3 / 4,
      s"expected roughly one call per distinct word: ${calls.value}")
    assert(calls.value <= vocabSize * 3L * 4L,
      s"encode ran per occurrence: ${calls.value}")
  }
}
