package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// test-scope profiling driver: sbt "Test/runMain graft.operators.MinhashProfile"
// Times the CURRENT dd_minhash_lsh pipeline stage by stage at sf0.1; keep
// in sync with Dedup.minhashLsh.
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        args.headOption.getOrElse("true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet").groupBy("source").count()
      .write.format("noop").mode("overwrite").save()

    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"[prof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val sh = Dedup.shingleDf(spark, d).cache()
    println("[prof] docs " + sh.count())
    lap("shingles+cache")
    val sig = Dedup.signatureDf(sh).cache()
    println("[prof] sigs " + sig.count())
    lap("signatures+cache")
    val banded = sig.select($"doc_id", posexplode(array(
      (0 until 4).map(bnd =>
        struct(col(s"mh${2 * bnd}").as("k0"),
          col(s"mh${2 * bnd + 1}").as("k1"))): _*)).as(Seq("band", "k")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.k") === col("y.k") &&
          $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
      .distinct()
    println("[prof] candidates " + cand.count())
    lap("banded self-join+distinct")
    val full = Dedup.minhashLsh.build(spark, d)
    full.write.format("noop").mode("overwrite").save()
    lap("full minhashLsh (fresh)")
    spark.catalog.clearCache()
    System.gc()
    Dedup.minhashLsh.build(spark, d)
      .write.format("noop").mode("overwrite").save()
    lap("full minhashLsh (bench-ish)")
    spark.stop()
  }
}
