package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

// test-scope profiling driver: sbt "Test/runMain graft.operators.ChargramProfile"
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
      .select($"doc_id", array_distinct(expr(
        "transform(sequence(1, length(t)-4), i -> substring(t, i, 5))"))
        .as("shingles"))
      .cache()
    println("[prof] docs " + sh.count() + " avgsh " +
      sh.select(avg(size($"shingles"))).head())
    lap("shingle+cache")
    val exAll = sh.select($"doc_id", explode($"shingles").as("sh"))
    val frequent = exAll.groupBy($"sh").agg(count(lit(1)).as("df"))
      .filter($"df" > 50).select($"sh")
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
    val exOver = exAll.join(broadcast(frequent), Seq("sh"))
    val overCnt = exOver.groupBy($"doc_id").agg(count(lit(1)).as("oc"))
    println("[prof] overCnt docs " + overCnt.count())
    lap("overCnt")
    // inlined jaccardPairs(cap=50) with laps
    val sizes = sh.select($"doc_id", size($"shingles").as("n"))
    val sizeOk = counted
      .join(sizes.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n", "nb"), "b_id")
      .filter((least($"na", $"nb").cast(DoubleType) /
        greatest($"na", $"nb")) >= 0.6)
    println("[prof] sizeOk " + sizeOk.count())
    lap("sizeOk")
    val bounded = sizeOk
      .join(overCnt.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("oc", "ca"), Seq("a_id"), "left")
      .join(overCnt.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("oc", "cb"), Seq("b_id"), "left")
      .withColumn("m", least(coalesce($"ca", lit(0L)), coalesce($"cb", lit(0L))))
      .withColumn("jlb", $"ni_rare".cast(DoubleType) / ($"na" + $"nb" - $"ni_rare"))
      .withColumn("jub", ($"ni_rare" + $"m").cast(DoubleType) /
        ($"na" + $"nb" - $"ni_rare" - $"m"))
      .filter($"jub" >= 0.6)
      .cache()
    println("[prof] bounded " + bounded.count())
    lap("bounded+cache")
    val band = bounded.filter($"m" > 0)
      .select($"a_id", $"b_id", $"na", $"nb", $"ni_rare")
    println("[prof] band " + band.count())
    lap("band count")
    val verified = sh.select($"doc_id".as("a_id"), $"shingles".as("sa"))
      .join(broadcast(band.drop("ni_rare")), "a_id")
      .join(sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
        .hint("shuffle_hash"), "b_id")
      .select($"a_id", $"b_id",
        (size(array_intersect($"sa", $"sb")).cast(DoubleType) /
          ($"na" + $"nb" - size(array_intersect($"sa", $"sb")))).as("jaccard"))
      .filter($"jaccard" >= 0.6)
    println("[prof] verified " + verified.count())
    lap("verified")
    spark.stop()
  }
}
