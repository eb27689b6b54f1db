package graft.queries

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-4 query additions (hash-exactness vs
  * DuckDB is covered by the Verify gate; these pin the invariants a hash
  * can't explain).
  */
class RoundFourQueriesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("ann_recall_report covers every probe with recall in [0,1]") {
    import spark.implicits._
    val out = run("ann_recall_report").collect()
    assert(out.length === 10, "one row per probe vector")
    assert(out.map(_.getLong(0)).toSeq === (0L until 10L))
    out.foreach { r =>
      val recall = r.getDouble(2)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(recall === r.getLong(1).toDouble / 5)
    }
  }

  test("ann_recall_report recall is 1 exactly when LSH top-5 = exact top-5") {
    import spark.implicits._
    // the LSH index can only LOSE neighbors (bucket restriction), so a
    // perfect-recall probe's approximate list must equal the truth list
    val bf = run("ann_bruteforce_topk").filter($"rank" <= 5)
      .select($"qid", $"cid")
    val perfect = run("ann_recall_report")
      .filter($"recall_at_5" === 1.0).select($"qid")
    val bfPerfect = bf.join(perfect, "qid").count()
    assert(bfPerfect === perfect.count() * 5)
  }

  test("ta_bigram_lm: probabilities average within (0,1], lengths consistent") {
    import spark.implicits._
    val out = run("ta_bigram_lm")
    assert(out.filter($"avg_cond_p" <= 0 || $"avg_cond_p" > 1).count() === 0)
    // every doc with >= 2 tokens scores; bigram count = token count - 1
    val toks = run("ta_token_count").select($"doc_id",
      $"n_tokens".as("nt"))
    val joined = out.join(toks, "doc_id")
      .filter($"n_bigrams" =!= $"nt" - 1).count()
    assert(joined === 0, "n_bigrams must be n_tokens - 1")
  }

  test("ta_bigram_lm: a corpus of one repeated bigram scores 1.0") {
    import spark.implicits._
    // conditional MLE on a deterministic corpus: every 'a b' transition
    // is certain, so the average conditional probability is exactly 1
    val docs = Seq((0L, "a b a b a b"), (1L, "a b a b")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("rf_lm_docs")
    // replicate the query inline against the tiny corpus
    val bg = docs
      .select($"doc_id", split(lower(trim($"text")), "\\s+").as("w"))
      .select($"doc_id", explode(expr(
        "transform(sequence(0, size(w)-2), i -> concat_ws(' ', w[i], w[i+1]))"))
        .as("bg"))
    val c2 = bg.groupBy($"bg").agg(count(lit(1)).as("c2"))
    val c1 = bg.groupBy(split($"bg", " ").getItem(0).as("w1"))
      .agg(count(lit(1)).as("c1"))
    val p = c2.join(c1, split($"bg", " ").getItem(0) === $"w1")
      .select(($"c2".cast("double") / $"c1").as("p")).collect()
    assert(p.forall(_.getDouble(0) === 1.0))
  }

  test("pipe_temperature_mix: probabilities sum to ~1 and flatten the mix") {
    import spark.implicits._
    val out = run("pipe_temperature_mix").collect()
    val ps = out.map(r => r.getDouble(2))
    assert(math.abs(ps.sum - 1.0) < 1e-9)
    // temperature < 1 upweights small sources: the sampled share of the
    // smallest source must never fall below its proportional share (equal
    // only when all sources are the same size, as in the uniform test
    // corpus), and symmetrically for the largest
    val n = out.map(_.getLong(1))
    val total = n.sum.toDouble
    val uniform = n.min == n.max
    val smallest = out.minBy(_.getLong(1))
    val largest = out.maxBy(_.getLong(1))
    if (uniform) {
      assert(math.abs(smallest.getDouble(2) - smallest.getLong(1) / total) < 1e-9)
    } else {
      assert(smallest.getDouble(2) > smallest.getLong(1) / total)
      assert(largest.getDouble(2) < largest.getLong(1) / total)
    }
    // and on a skewed synthetic mix the flattening must be strict
    import spark.implicits._
    val skew = Seq(("big", 900L), ("small", 100L)).toDF("source", "n_docs")
    val w = skew.select($"source", $"n_docs",
      expr("CAST(floor(pow(CAST(n_docs AS DOUBLE) / 1000, 0.7) * 1e14) AS BIGINT)")
        .as("w14"))
    val z = w.agg(sum($"w14")).head().getLong(0)
    val p = w.select($"source", ($"w14".cast("double") / z).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(p("small") > 0.1 && p("big") < 0.9)
    assert(math.abs(p("small") + p("big") - 1.0) < 1e-12)
  }

  test("pipe_quality_buckets: 10 near-equal buckets tiling the quality range") {
    val out = run("pipe_quality_buckets").collect()
    assert(out.map(_.getLong(0)).toSeq === (1L to 10L))
    val counts = out.map(_.getLong(1))
    assert(counts.max - counts.min <= 1, "ntile buckets differ by at most 1")
    val total = Tables.documents(spark, graft.TestSpark.sfDir).count()
    assert(counts.sum === total)
    // bucket ranges are ordered and non-overlapping
    out.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getDouble(3) <= hi.getDouble(2),
        s"bucket ${lo.getLong(0)} max must not exceed bucket ${hi.getLong(0)} min")
    }
  }

  test("dd_clusters canonical ids are closed under the pair relation") {
    import spark.implicits._
    val labels = run("dd_clusters")
    // every doc maps to a canonical <= itself, and paired docs share one
    assert(labels.filter($"canonical_id" > $"doc_id").count() === 0)
    val pairs = run("dd_ngram_jaccard").select($"a_id", $"b_id")
    val la = labels.toDF("a_id", "ca")
    val lb = labels.toDF("b_id", "cb")
    val broken = pairs.join(la, "a_id").join(lb, "b_id")
      .filter($"ca" =!= $"cb").count()
    assert(broken === 0, "directly-paired docs must share a canonical id")
  }

  test("ta_rolling_fingerprint matches the reference recurrence on a known string") {
    import graft.functions.RollingHash
    val s = "abc"
    val m = (1L << 61) - 1
    val expected = ((('a'.toLong * 257 + 'b') % m) * 257 + 'c') % m
    assert(RollingHash.hashBytes(s.getBytes("UTF-8")) === expected)
  }
}
