package graft.operators

import graft.functions.BpeTokenizer
import org.apache.spark.sql.SparkSession

/** Round-17 production-vocabulary tier for the BPE tokenizer — the
  * algorithmic claim behind [[BpeTokenizer.RankEncoder]], measured:
  *
  *   sbt "Test/runMain graft.operators.BpeVocabTierStudyR17"
  *
  * The reference [[BpeTokenizer.encode]] scans EVERY merge rule over
  * the word (O(merges × L) per word) — correct, oracle-replayable, and
  * exactly wrong at a production vocabulary: its per-word cost is a
  * straight line in merge-table size. The heap walk is O(L log L),
  * INDEPENDENT of table size. This study trains a real ≥5k-merge
  * byte-level vocabulary from the sf0.01 documents corpus (via
  * [[BpeTokenizer.trainIncremental]] — the same merges [[BpeTokenizer.train]]
  * would learn, verified here at the frozen 48-rule prefix) and
  * measures both encoders' cost over the same word sample at 48, 250,
  * 1000 and 5000 merges:
  *
  *  - the reference's cost must GROW with the table (slope ≈ linear in
  *    merges — asserted ≥4× from 250 to 5000);
  *  - the heap's cost must stay FLAT (≤3× over the same 20× table
  *    growth — in practice it RISES slightly because more rules mean
  *    more actual merging work per word, never because of table scans);
  *  - at 5000 merges the heap must beat the reference ≥3×, with
  *    IDENTICAL pieces for every sampled word.
  *
  * Greedy BPE training means the n-merge table is exactly the 5k run's
  * rank-prefix, so all four tiers come from ONE training pass.
  */
object BpeVocabTierStudyR17 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    // A vocabulary DEEP enough for a production tier: the documents
    // text is a ~31-word synthetic corpus, so single-word pretokens
    // run dry after ~700 merges — pretokenize on within-doc word
    // 3-GRAMS instead (the space is just another byte symbol under the
    // GPT-2 remap, exactly how real byte-level tokenizers learn
    // space-marked merges), giving ~16k distinct multi-word pretokens
    // and a merge space that sustains 5000 rules of real corpus bytes.
    val counts = graft.queries.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .select($"doc_id", posexplode(expr(
        "regexp_extract_all(text, '\\\\S+', 0)")).as(Seq("i", "w")))
      .withColumn("g", concat_ws(" ", $"w",
        lead($"w", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"i")),
        lead($"w", 2).over(org.apache.spark.sql.expressions.Window
          .partitionBy($"doc_id").orderBy($"i"))))
      .filter(size(split($"g", " ")) === 3)
      .groupBy($"g").agg(count(lit(1)).as("n"))
      .collect().map(r => (BpeTokenizer.toByteChars(r.getString(0)),
        r.getLong(1))).toSeq
    println(s"corpus vocabulary: ${counts.size} distinct byte pretokens")
    assert(counts.size >= 10000, s"pretoken space too small: ${counts.size}")

    val t0 = System.nanoTime()
    val merges5k = BpeTokenizer.trainIncremental(counts, 5000)
    val tTrain = (System.nanoTime() - t0) / 1e9
    assert(merges5k.size == 5000,
      s"corpus must sustain 5000 merges, got ${merges5k.size}")
    assert(BpeTokenizer.wellFormed(merges5k))
    // the incremental trainer IS the reference trainer on THIS corpus:
    // the reference's first 200 merges must equal the 5k run's prefix
    // (greedy BPE: the n-merge table is the rank-prefix of any longer
    // run over the same counts)
    assert(merges5k.take(200) == BpeTokenizer.train(counts, 200),
      "trainIncremental diverged from train on the study corpus")
    println(f"trained 5000 merges incrementally in $tTrain%.1f s " +
      "(200-rule prefix equals the reference trainer)")

    // deterministic word sample: every k-th distinct word by text order
    val sorted = counts.map(_._1).sorted
    val sample = sorted.indices.collect {
      case i if i % math.max(1, sorted.size / 3000) == 0 => sorted(i)
    }.toArray
    println(s"encode sample: ${sample.length} words")

    val tiers = Seq(48, 250, 1000, 5000)
    val results = tiers.map { n =>
      val table = merges5k.take(n)
      val heap = new BpeTokenizer.RankEncoder(table)
      // equivalence on every sampled word, OUTSIDE the timers
      sample.foreach { w =>
        val ref = BpeTokenizer.encode(w, table)
        val got = heap.encode(w)
        assert(got == ref, s"tier $n diverged on '$w'")
      }
      def bestOf3(f: () => Unit): Double = {
        var best = Long.MaxValue
        (0 until 3).foreach { _ =>
          val s = System.nanoTime(); f(); best = math.min(best, System.nanoTime() - s)
        }
        best / 1e6
      }
      val refMs = bestOf3(() =>
        sample.foreach(w => BpeTokenizer.encode(w, table)))
      val heapMs = bestOf3(() => sample.foreach(w => heap.encode(w)))
      println(f"tier $n%5d merges: reference $refMs%9.1f ms   " +
        f"heap $heapMs%7.1f ms   (${refMs / heapMs}%5.1fx)")
      (n, refMs, heapMs)
    }

    val ref250 = results.find(_._1 == 250).get._2
    val ref5k = results.find(_._1 == 5000).get._2
    val heap250 = results.find(_._1 == 250).get._3
    val heap5k = results.find(_._1 == 5000).get._3
    assert(ref5k / ref250 >= 4.0,
      f"reference encode must scale with table size: ${ref5k / ref250}%.1fx")
    assert(heap5k / heap250 <= 3.0,
      f"heap encode must stay flat over 20x table growth: ${heap5k / heap250}%.1fx")
    assert(heap5k * 3.0 <= ref5k,
      f"heap must beat reference >=3x at 5000 merges: ${ref5k / heap5k}%.1fx")

    spark.stop()
    println("BPE-VOCAB-TIER-STUDY-OK")
  }
}
