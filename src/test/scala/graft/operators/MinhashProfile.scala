package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// test-scope profiling driver:
//   sbt "Test/runMain graft.operators.MinhashProfile <sfDir> [bloomFilter]"
// Times the CURRENT dd_minhash_lsh pipeline stage by stage; the candidate
// stage calls Dedup.bandedCandidates, the SAME code minhashLsh ships.
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
        args.drop(1).headOption.getOrElse("true"))
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
    val cand = Dedup.bandedCandidates(sig)
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
