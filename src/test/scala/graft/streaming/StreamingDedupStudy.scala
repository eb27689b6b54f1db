package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Test-scope scaling driver for the streaming ingestion dedup:
  *
  *   sbt "Test/runMain graft.streaming.StreamingDedupStudy"
  *
  * Reuses the deterministic ScalingStudy corpus (~5% planted near-dups),
  * splits it into 4 ordered arrival batches, and times each
  * [[StreamingDedupPipeline.processBatch]] as the store grows — the
  * claim under test is that per-batch cost is driven by the incoming
  * batch (candidate join on rare shingles, batch-sized verification),
  * not by the accumulated store, so ingest throughput holds as the
  * admitted corpus grows. Results feed SCALE.md.
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

    for (n <- Seq(5000L, 20000L)) {
      val docs = graft.operators.ScalingStudy.corpus(spark, n)
        .select($"doc_id", $"text", lit("en").as("lang"),
          lit("srcS").as("source"), length($"text").as("n_chars"))
        .localCheckpoint()
      val store = java.nio.file.Files
        .createTempDirectory(s"graft-sds-$n").resolve("store").toString
      val kept = java.nio.file.Files
        .createTempDirectory(s"graft-sds-k$n").resolve("kept").toString
      val per = n / 4
      for (b <- 0 until 4) {
        val batch = docs.filter($"doc_id" >= b * per && $"doc_id" < (b + 1) * per)
        val t0 = System.nanoTime()
        StreamingDedupPipeline.processBatch(batch, b.toLong, store, kept)
        val dt = (System.nanoTime() - t0) / 1e9
        val admitted = spark.read
          .parquet(s"$kept/batch=$b").count()
        println(f"[study-sdd] n=$n%-6d batch=$b admitted=$admitted%-6d of=$per ${dt}%.1fs")
      }
      val total = spark.read.option("basePath", kept).parquet(kept).count()
      println(f"[study-sdd] n=$n%-6d TOTAL admitted=$total of=$n")
    }
    spark.stop()
  }
}
