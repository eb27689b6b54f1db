package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope scaling driver for the streaming ingestion dedup:
  *
  *   sbt "Test/runMain graft.streaming.StreamingDedupStudy"
  *
  * Reuses the deterministic ScalingStudy corpus (~5% planted near-dups)
  * and feeds it as FIXED-SIZE arrival batches while the admitted store
  * grows — the claim under test is that per-batch cost is driven by the
  * incoming batch (store reads filtered to the batch's shingles, df-capped
  * candidate join, candidate-only verification against the maintained
  * posting index), not by the accumulated store, so ingest latency holds
  * flat as the admitted corpus grows 10×+ and across a
  * [[StreamingDedupPipeline.FoldEvery]] fold boundary (whose batch pays
  * the amortized store rewrite). Results feed SCALE.md.
  */
object StreamingDedupStudy {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val batchSize = 2500L
    val nBatches = 20 // store grows 0 → 47.5k docs: >10x past batch 2,
                      // and crosses the FoldEvery=16 fold at batch 16
    val n = batchSize * nBatches
    val docs = graft.operators.ScalingStudy.corpus(spark, n)
      .select($"doc_id", $"text", lit("en").as("lang"),
        lit("srcS").as("source"), length($"text").as("n_chars"))
      .localCheckpoint()
    val store = java.nio.file.Files
      .createTempDirectory(s"graft-sds-$n").resolve("store").toString
    val kept = java.nio.file.Files
      .createTempDirectory(s"graft-sds-k$n").resolve("kept").toString
    val times = Array.ofDim[Double](nBatches)
    for (b <- 0 until nBatches) {
      val batch = docs.filter(
        $"doc_id" >= b * batchSize && $"doc_id" < (b + 1) * batchSize)
      val t0 = System.nanoTime()
      StreamingDedupPipeline.processBatch(batch, b.toLong, store, kept)
      times(b) = (System.nanoTime() - t0) / 1e9
      val admitted = spark.read.parquet(s"$kept/batch=$b").count()
      println(f"[study-sdd] batch=$b%-3d store=${b * batchSize}%-6d " +
        f"admitted=$admitted%-5d of=$batchSize ${times(b)}%.1fs" +
        (if (b > 0 && b % StreamingDedupPipeline.FoldEvery == 0) " (fold)" else ""))
    }
    val total = spark.read.option("basePath", kept).parquet(kept).count()
    val early = times.slice(1, 4).sum / 3 // skip batch 0 (JIT/warmup)
    val late = times.slice(nBatches - 3, nBatches).sum / 3
    println(f"[study-sdd] TOTAL admitted=$total of=$n " +
      f"early(b1-3)=${early}%.1fs late(b${nBatches - 3}-${nBatches - 1})=${late}%.1fs " +
      f"ratio=${late / early}%.2f (store grew ${(nBatches - 2) * batchSize / batchSize}x over that span)")
    spark.stop()
  }
}
