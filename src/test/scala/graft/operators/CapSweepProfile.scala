package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// test-scope profiling driver: sbt "Test/runMain graft.operators.CapSweepProfile"
// Times jaccardPairs at sf0.1 with raw-string vs xxhash64'd chargram
// shingles (2 runs each, fixed df cap 400) - measures what hashing the
// shingle payload buys the shuffle, not a cap sweep.
object CapSweepProfile {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet").groupBy("source").count()
      .write.format("noop").mode("overwrite").save()

    def shingleDf(hashed: Boolean) = {
      val base = graft.queries.Tables.spread(
          graft.queries.Tables.documents(spark, d), "doc_id")
        .select($"doc_id",
          expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')").as("t"))
        .filter(length($"t") >= 5)
        .select($"doc_id", array_distinct(expr(
          "transform(sequence(1, length(t)-4), i -> substring(t, i, 5))"))
          .as("shingles"))
      (if (hashed)
        base.select($"doc_id",
          expr("transform(shingles, s -> xxhash64(s))").as("shingles"))
      else base).cache()
    }

    for (run <- 1 to 2; hashed <- Seq(false, true)) {
      val sh = shingleDf(hashed)
      val t0 = System.nanoTime()
      val out = Dedup.jaccardPairs(sh, 0.6, maxShingleDf = Some(400L))
        .orderBy($"a_id", $"b_id")
      out.write.format("noop").mode("overwrite").save()
      val n = out.count()
      println(f"[sweep] run=$run hashed=$hashed%-5s pairs=$n%-6d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      sh.unpersist(true)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
