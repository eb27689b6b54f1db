package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// test-scope profiling driver: sbt "Test/runMain graft.operators.ChargramProfile"
// Times the CURRENT dd_chargram_jaccard pipeline (hashed shingles, cap 400)
// stage by stage at sf0.1; keep in sync with Dedup.chargramJaccard.
object ChargramProfile {
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
    // warmup
    spark.read.parquet(s"$d/documents.parquet").groupBy("source").count()
      .write.format("noop").mode("overwrite").save()

    var t0 = System.nanoTime()
    def lap(name: String): Unit = {
      println(f"[prof] $name%-26s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val sh = graft.queries.Tables.spread(
        graft.queries.Tables.documents(spark, d), "doc_id")
      .select($"doc_id",
        expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')").as("t"))
      .filter(length($"t") >= 5)
      .select($"doc_id",
        graft.functions.CharGramHashes.char_gram_hashes($"t", 5)
          .as("shingles"))
      .cache()
    println("[prof] docs " + sh.count() + " avgsh " +
      sh.select(avg(size($"shingles"))).head())
    lap("shingle+hash+cache")
    val exAll = sh.select($"doc_id", explode($"shingles").as("sh"))
    val frequent = exAll.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" > 400).select($"sh")
    println("[prof] n frequent " + frequent.count())
    lap("df groupBy")
    val exRare = exAll.join(broadcast(frequent), Seq("sh"), "left_anti").cache()
    println("[prof] exRare " + exRare.count())
    lap("exRare anti-join")
    val counted = exRare.as("x").join(exRare.as("y"),
        $"x.sh" === $"y.sh" && $"x.doc_id" < $"y.doc_id")
      .groupBy($"x.doc_id".as("a_id"), $"y.doc_id".as("b_id"))
      .agg(count(lit(1)).as("ni_rare"))
    println("[prof] counted pairs " + counted.count())
    lap("counted self-join")
    val full = Dedup.jaccardPairs(sh, 0.6, maxShingleDf = Some(400L))
      .orderBy($"a_id", $"b_id")
    full.write.format("noop").mode("overwrite").save()
    lap("full jaccardPairs+sort")
    full.write.format("noop").mode("overwrite").save()
    lap("full again (warm cache)")
    spark.stop()
  }
}
