package graft.operators

import org.apache.spark.sql.SparkSession

/** Test-scope scaling driver for the round-6 corpus operators:
  * sbt "Test/runMain graft.operators.ScalingStudyR6"
  *
  * Reuses [[ScalingStudy]]'s deterministic corpus generator (5k/20k/100k
  * docs, ~5% planted near-dups, md5-derived — reproducible across runs),
  * writes each corpus as a `documents.parquet` table, and times the
  * PRODUCTION query builders on it — not re-derived copies — so the
  * numbers measure the exact plans the driver benches:
  *
  *   - `dd_dup_spans`   — n-gram df + mark join + per-doc island merge
  *   - `ta_inverted_index` — two-stage posting build, O(1)-bounded heads
  *   - `pipe_global_shuffle` — range exchange + distributed prefix sum
  *
  * Each operator's SCALE.md entry argues linear scaling from the plan
  * shape (every shuffle key is an n-gram / (token, doc) / range key —
  * never a hot single partition, never all-pairs); this driver replaces
  * that argument with a measured 5k→100k curve. Results feed SCALE.md.
  */
object ScalingStudyR6 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ops = Seq(
      "dd_dup_spans" -> Dedup.dupSpans.build,
      "dd_dup_coverage" -> Dedup.dupCoverage.build,
      "ta_inverted_index" -> TextAnalysis.invertedIndex.build,
      "pipe_global_shuffle" -> CorpusCuration.globalShuffle.build)

    for (n <- Seq(5000L, 20000L, 100000L)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-r6-$n").toString
      ScalingStudy.corpus(spark, n).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")

      for ((name, build) <- ops) {
        val t0 = System.nanoTime()
        val rows = build(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[study-r6] n=$n%-7d op=$name%-20s rows=$rows%-9d ${dt}%.1fs")
      }

      // the full sharded inverted-index WRITE (round 7): the real job the
      // bounded-head query stands in for — timed end-to-end incl. manifest
      locally {
        val out = java.nio.file.Files.createTempDirectory(s"graft-ix-$n").toString
        val t0 = System.nanoTime()
        val r = graft.pipeline.CorpusPipeline.writeInvertedIndex(spark, dir, out)
        val dt = (System.nanoTime() - t0) / 1e9
        val opName = "index_write"
        println(f"[study-r6] n=$n%-7d op=$opName%-20s rows=${r.nPostings}%-9d " +
          f"${dt}%.1fs shards=${r.nShards} maxShardRows=${r.maxShardRows}")
      }
    }
    spark.stop()
  }
}
