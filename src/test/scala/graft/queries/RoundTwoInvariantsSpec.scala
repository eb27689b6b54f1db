package graft.queries

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-2 operators — properties the DuckDB
  * hash-equality gate can't express (it proves Spark == DuckDB, not that
  * both mean what the operator claims).
  */
class RoundTwoInvariantsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, TestSpark.sfDir)

  test("pipe_token_packing: packs partition the corpus; budget respected modulo one-doc overshoot") {
    val packs = run("pipe_token_packing").collect()
    val ids = packs.map(_.getAs[Long]("pack_id")).sorted
    assert(ids.toSeq == (0L until ids.length).toSeq, "pack ids contiguous")
    val docsTotal = Tables.documents(spark, TestSpark.sfDir).count()
    assert(packs.map(_.getAs[Long]("n_docs")).sum == docsTotal,
      "every document lands in exactly one pack")
    val maxTokens = Tables.documents(spark, TestSpark.sfDir)
      .selectExpr("max(size(split(trim(text), '\\\\s+')))").as[Int].head()
    // cumulative cut: a pack exceeds 2048 only by (at most) its last doc
    packs.foreach { p =>
      assert(p.getAs[Long]("pack_tokens") <= 2048L + maxTokens,
        s"pack ${p.getAs[Long]("pack_id")} overshoots more than one doc")
    }
  }

  test("pipe_global_shuffle: positions are a permutation, batches full, order is non-trivial") {
    val rows = run("pipe_global_shuffle").collect()
    val n = rows.length
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (0L until n).toSeq,
      "positions must be exactly 0..n-1")
    // every batch is full (64) except possibly the last
    val byBatch = rows.groupBy(_.getAs[Long]("batch_id"))
      .view.mapValues(_.length).toMap
    val lastBatch = byBatch.keys.max
    byBatch.foreach { case (b, size) =>
      if (b != lastBatch) assert(size == 64, s"batch $b has $size docs")
    }
    // the permutation actually shuffles (not the identity order)
    val inOrder = rows.sortBy(_.getAs[Long]("pos")).map(_.getAs[Long]("doc_id"))
    assert(inOrder.zipWithIndex.count { case (id, i) => id == i } < n / 10,
      "hash order should displace nearly every document")
    // reproducible: a second build gives the identical permutation
    val again = run("pipe_global_shuffle").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    rows.foreach(r => assert(
      again(r.getAs[Long]("doc_id")) == r.getAs[Long]("pos")))
  }

  test("pipe_split_counts: splits cover the corpus with ~80/10/10 mass") {
    val rows = run("pipe_split_counts").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, TestSpark.sfDir).count())
    val bySplit = rows.groupBy(_.getAs[String]("split"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val train = bySplit("train").toDouble / total
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
  }

  test("ta_vocab: ids contiguous from 0 in (count desc, token) order") {
    val v = run("ta_vocab").collect()
    assert(v.map(_.getAs[Long]("token_id")).toSeq ==
      (0L until v.length).toSeq)
    val counts = v.sortBy(_.getAs[Long]("token_id")).map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts non-increasing along ids")
  }

  test("ta_repetition: ratios well-formed, top_count bounded by n_tokens") {
    run("ta_repetition").collect().foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("top_count") <= n)
      assert(r.getAs[Long]("n_distinct") <= n)
      val f = r.getAs[Double]("top_word_frac")
      assert(f > 0 && f <= 1)
    }
  }

  test("ev_retention: day-0 row is the cohort size; later offsets never exceed it") {
    val rows = run("ev_retention").collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("day_offset"),
        r.getAs[Long]("n_users")))
    val day0 = rows.collect { case (c, 0L, n) => c -> n }.toMap
    rows.foreach { case (c, off, n) =>
      assert(day0.contains(c), s"cohort $c missing its day-0 row")
      assert(n <= day0(c), s"offset $off of cohort $c exceeds cohort size")
    }
  }

  test("ann_quantize_int8: codes stay within the int8 range") {
    run("ann_quantize_int8").collect().foreach { r =>
      for (i <- 1 to 4) {
        val q = r.getAs[Long](s"q$i")
        assert(q >= -127 && q <= 127, s"q$i=$q out of range")
      }
      assert(r.getAs[Double]("scale") > 0)
    }
  }

  test("q_recursive_cte: contiguous month calendar, order counts conserved") {
    val rows = run("q_recursive_cte").collect()
    assert(rows.length == 80) // 1995-01 .. 2001-08 inclusive
    assert(rows.map(_.getAs[Long]("n_orders")).sum ==
      Tables.orders(spark, TestSpark.sfDir).count())
  }
}
