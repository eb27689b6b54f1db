package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-scope occupancy/recall study for the 8-hyperplane LSH bucket key
  * that blocks `dd_embedding_cosine_lsh(_mp)` and `pipe_semantic_dedup_lsh`:
  *
  *   sbt "Test/runMain graft.operators.LshOccupancyStudy"
  *
  * The scale claim those operators make is that the bucket is a
  * *capacity-controlled* blocking key — expected occupancy n/2^planes,
  * each added plane halving it — so the pair-join block size is an index
  * parameter, not a property of the data distribution. This driver
  * replaces the claim with a measured 5k→100k curve: deterministic
  * md5-derived vectors (~5% planted near-dups, reproducible across runs),
  * the PRODUCTION `lsh_bucket` expression, and per-n:
  *
  *   - occupancy: distinct buckets, mean/max rows per bucket vs the
  *     n/256 expectation, candidate-pair volume vs all-pairs;
  *   - recall of the planted near-dup pairs, same-bucket (single probe)
  *     vs Hamming-1 multiprobe — the `dd_embedding_recall` readout at
  *     sizes the 500-vector oracle table can't reach.
  *
  * Results feed SCALE.md ("LSH bucket occupancy", round 9).
  */
object LshOccupancyStudy {

  private val Planes = 8
  private val Dim = 64

  /** n deterministic vectors; every 20th id (j ≡ 19 mod 20) is a planted
    * near-dup of the id 19 below it (same base vector, one component
    * nudged by +0.01 — cosine ≈ 1, far above the 0.35 serving threshold).
    */
  def vectors(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).toDF("vec_id")
      .withColumn("base_id",
        when($"vec_id" % 20 === 19, $"vec_id" - 19).otherwise($"vec_id"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${Dim - 1}), j -> CAST(
           |  (CAST(conv(substring(md5(concat(base_id, ':', j)), 1, 6), 16, 10) AS BIGINT)
           |   % 2001 - 1000) / 1000.0
           |  + IF(vec_id % 20 = 19 AND j = 0, 0.01D, 0.0D)
           |AS FLOAT))""".stripMargin.replaceAll("\n", " ")))
      .select($"vec_id", $"base_id", $"embedding")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    for (n <- Seq(5000L, 20000L, 100000L)) {
      val e = vectors(spark, n)
        .withColumn("bucket",
          graft.functions.VectorFunctions.lsh_bucket($"embedding", Planes, Dim))
        .localCheckpoint() // one materialization serves every readout below

      val occ = e.groupBy($"bucket").count()
      val stats = occ.agg(
        count(lit(1)).as("n_buckets"),
        avg($"count").as("mean_occ"),
        max($"count").as("max_occ"),
        sum($"count" * ($"count" - 1) / 2).as("cand_pairs")).head()
      val nBuckets = stats.getAs[Long]("n_buckets")
      val expected = n.toDouble / (1L << Planes)
      println(f"[study-lsh] n=$n%-7d buckets=$nBuckets%-4d " +
        f"mean_occ=${stats.getAs[Double]("mean_occ")}%.1f " +
        f"expected=${expected}%.1f max_occ=${stats.getAs[Long]("max_occ")} " +
        f"cand_pairs=${stats.getAs[Long]("cand_pairs")} " +
        f"all_pairs=${n * (n - 1) / 2}")

      // planted-pair recall: single probe (same bucket) vs Hamming-1 MP
      val planted = e.filter($"vec_id" % 20 === 19)
        .select($"vec_id".as("dup_id"), $"base_id", $"bucket".as("db"))
        .join(e.select($"vec_id".as("base_id"), $"bucket".as("bb")), "base_id")
      val r = planted.agg(
        count(lit(1)).as("n_planted"),
        sum(when($"db" === $"bb", 1L).otherwise(0L)).as("hit1"),
        sum(when(bit_count($"db".bitwiseXOR($"bb")) <= 1, 1L).otherwise(0L))
          .as("hit_mp")).head()
      val np = r.getAs[Long]("n_planted")
      println(f"[study-lsh] n=$n%-7d planted=$np " +
        f"recall_single=${r.getAs[Long]("hit1").toDouble / np}%.3f " +
        f"recall_mp=${r.getAs[Long]("hit_mp").toDouble / np}%.3f")
    }
    spark.stop()
  }
}
