package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary profiling driver — not committed
object Scratch {
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

    def time(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val sh0 = Dedup.shingleDf(spark, d)
    println("[scratch] docs with shingles: " + sh0.count())
    println("[scratch] avg shingles/doc: " + sh0.select(avg(size($"shingles"))).head())

    // stage 1: candidate counted pairs (sub-cap self-join + groupBy)
    time("full dd_survivors") {
      Dedup.survivors.build(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    time("full dd_survivors again") {
      Dedup.survivors.build(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    // candidates only: replicate the capped path up to sizeOk
    val sh = Dedup.shingleDf(spark, d).cache()
    val exAll = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val frequent = exAll.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 50).select(col("sh"))
    val exRare = exAll.join(broadcast(frequent), Seq("sh"), "left_anti").cache()
    time("exRare materialize") { exRare.write.format("noop").mode("overwrite").save() }
    val counted = exRare.as("x").join(exRare.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("ni_rare"))
    time("counted pairs") { counted.write.format("noop").mode("overwrite").save() }
    println("[scratch] counted pairs n: " + counted.count())
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    val sizeOk = counted
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n", "nb"), "b_id")
      .filter((least(col("na"), col("nb")).cast("double") / greatest(col("na"), col("nb"))) >= 0.6)
    println("[scratch] sizeOk pairs n: " + sizeOk.count())
    time("verification join") {
      sh.select(col("doc_id").as("a_id"), col("shingles").as("sa"))
        .join(broadcast(sizeOk.select(col("a_id"), col("b_id"), col("na"), col("nb"))), "a_id")
        .join(sh.select(col("doc_id").as("b_id"), col("shingles").as("sb")).hint("shuffle_hash"), "b_id")
        .select(col("a_id"), col("b_id"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (col("na") + col("nb") - size(array_intersect(col("sa"), col("sb"))))).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
