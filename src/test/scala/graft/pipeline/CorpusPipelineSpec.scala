package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline: conservation, determinism, and layout of the
  * composed curate → split → pack → write job.
  */
class CorpusPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline writes a split-partitioned corpus with conserved counts") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val r = CorpusPipeline.run(spark, TestSpark.sfDir, out)

    assert(r.nInput > 0 && r.nCurated > 0 && r.nCurated <= r.nInput)
    assert(r.splits.values.sum == r.nCurated, "split counts must cover the corpus")
    assert(r.splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(r.splits("train") > r.splits.getOrElse("val", 0L),
      "train must be the largest split")

    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.columns.toSet ==
      Set("doc_id", "n_tokens", "source", "text", "split", "pack_id"))
    // conservation: written tokens equal the observed accounting
    val written = corpus.agg(org.apache.spark.sql.functions.sum($"n_tokens"))
      .head.getLong(0)
    assert(written == r.tokensOut)
    // packs respect the budget modulo one-doc overshoot, per split
    val maxDoc = corpus.agg(org.apache.spark.sql.functions.max($"n_tokens"))
      .head.getLong(0)
    val packTotals = corpus.groupBy($"split", $"pack_id")
      .agg(org.apache.spark.sql.functions.sum($"n_tokens").as("t"))
      .collect()
    packTotals.foreach { row =>
      assert(row.getLong(2) <= CorpusPipeline.TokenBudget + maxDoc,
        s"pack ${row.get(0)}/${row.get(1)} overshoots")
    }

    // determinism: a second run selects the identical membership
    val out2 = java.nio.file.Files.createTempDirectory("graft-pipe2").toString
    val r2 = CorpusPipeline.run(spark, TestSpark.sfDir, out2)
    assert(r2 == r)
  }
}
