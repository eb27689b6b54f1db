package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// test-scope profiling driver: sbt "Test/runMain graft.operators.ClustersProfile"
object ClustersProfile {
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

    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"[prof] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val sh = Dedup.shingleDf(spark, d).cache()
    val pr = Dedup.jaccardPairs(sh, 0.6, maxShingleDf = Some(50L))
      .select($"a_id", $"b_id").cache()
    val sym = pr.select($"a_id".as("src"), $"b_id".as("dst"))
      .union(pr.select($"b_id".as("src"), $"a_id".as("dst"))).cache()
    var labels = sym.select($"src".as("doc_id")).distinct()
      .select($"doc_id", $"doc_id".as("canonical_id")).cache()
    def labelSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum($"canonical_id"), lit(0L))).head().getLong(0)
    var prevSum = labelSum(labels)
    lap("initial labelSum")
    var converged = false
    var round = 0
    while (!converged) {
      val propagated = labels
        .join(sym, $"doc_id" === $"src")
        .select($"dst".as("doc_id"), $"canonical_id")
      val next = labels.union(propagated)
        .groupBy($"doc_id")
        .agg(min($"canonical_id").as("canonical_id"))
        .cache()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels.unpersist()
      labels = next
      round += 1
      lap(s"round $round")
    }
    sh.unpersist(); pr.unpersist(); sym.unpersist()
    graft.queries.Tables.documents(spark, d).select($"doc_id")
      .join(labels.withColumnRenamed("canonical_id", "member_canonical"),
        Seq("doc_id"), "left")
      .select($"doc_id",
        coalesce($"member_canonical", $"doc_id").as("canonical_id"))
      .orderBy($"doc_id")
      .write.format("noop").mode("overwrite").save()
    lap("final join+write")
    spark.stop()
  }
}
