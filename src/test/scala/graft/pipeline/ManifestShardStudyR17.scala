package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 metadata-scalability tier for the versioned table — the
  * structural claim behind the TWO-LEVEL manifest (list → shards),
  * measured at 10k and 100k manifest entries:
  *
  *   sbt "Test/runMain graft.pipeline.ManifestShardStudyR17"
  *
  * A FLAT manifest rewrites the table's whole entry set on every
  * commit and parses all of it on every plan — O(F) both ways, which
  * at 100 TB / 128 MB files is ~800k entries, tens of MB, per append.
  * The manifest list bounds both: an append writes ONE shard (its own
  * entries) plus one list line per shard, and a box probe opens only
  * the shards whose AGGREGATE box it intersects. The fixtures
  * fabricate metadata only ([[VersionedTable.fabricateVersion]] —
  * synthetic entry names, real list/shard/publish machinery), shaped
  * as a maintained table: a constant 16-shard layout whose shard size
  * grows with the table (compaction's steady state — appends fold
  * runts, [[VersionedTable.ShardMergeFanIn]]), locality-correlated
  * boxes (consecutive entries cover consecutive user_id ranges, the
  * z-order/ingest-time reality).
  *
  * Asserted:
  *  1. flat and sharded PRUNE IDENTICALLY (same kept files) — the
  *     format changes cost, never answers;
  *  2. append commit metadata is table-size-INDEPENDENT for the
  *     sharded form (100k/10k bytes ratio ≤ 2) and table-linear for
  *     the flat form (ratio ≥ 5 — its first sharded append pays the
  *     O(F) migration the old format paid EVERY commit);
  *  3. at 100k entries the sharded append writes ≤ 1/20 the flat
  *     form's metadata bytes;
  *  4. a selective probe opens ≤ 3 of 17 shards (list-level pruning)
  *     and plans faster than the flat parse at 100k entries.
  */
object ManifestShardStudyR17 {

  private def dirBytes(p: String): Long = {
    val d = new java.io.File(p)
    if (!d.exists()) 0L
    else d.listFiles().filter(_.isFile).map(_.length()).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val statCols = Seq("user_id", "ts_us")
    val schemaJson = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_us",
        org.apache.spark.sql.types.LongType))).json

    def entriesFor(n: Int): Seq[(String, Long, Seq[(Long, Long)])] =
      (0 until n).map { i =>
        (f"fake-$i%07d.parquet", 1000L,
          Seq((i * 100L, i * 100L + 99L), (i * 1000L, i * 1000L + 999L)))
      }

    def appendDf = spark.range(0, 1000)
      .select(($"id" % 97).as("user_id"), ($"id" * 1000L).as("ts_us"))

    case class Point(n: Int, shardedAppend: Long, flatAppend: Long,
        shardedPlanMs: Double, flatPlanMs: Double)

    val points = Seq(10000, 100000).map { n =>
      val es = entriesFor(n)
      val sharded = java.nio.file.Files
        .createTempDirectory(s"graft-mss-s$n").resolve("t").toString
      val flat = java.nio.file.Files
        .createTempDirectory(s"graft-mss-f$n").resolve("t").toString
      // maintained layout: 16 shards whose size grows with the table
      VersionedTable.fabricateVersion(spark, sharded, 1L, statCols, es,
        entriesPerShard = n / 16, schemaJson = Some(schemaJson))
      VersionedTable.fabricateVersion(spark, flat, 1L, statCols, es,
        entriesPerShard = 0, schemaJson = Some(schemaJson))

      // 1. identical pruning answers, and the sharded probe opens only
      // the shards its aggregate boxes admit
      val probe = Seq(("user_id", n * 100L / 2, n * 100L / 2 + n))
      val (keptS, totS) = VersionedTable.prunedFileCount(spark, sharded, probe)
      val (keptF, totF) = VersionedTable.prunedFileCount(spark, flat, probe)
      assert(totS == n && totF == n)
      assert(keptS == keptF,
        s"flat and sharded pruning diverged: $keptS vs $keptF")
      val (opened, shards, _) = VersionedTable.boxProbeStats(spark, sharded, probe)
      assert(opened <= 3 && shards >= 16,
        s"selective probe must open <=3 of $shards shards, opened $opened")

      // 2. planning cost, best of 5 (fresh manifest resolve each time)
      def bestMs(f: => Unit): Double = {
        var best = Long.MaxValue
        (0 until 5).foreach { _ =>
          val t0 = System.nanoTime(); f
          best = math.min(best, System.nanoTime() - t0)
        }
        best / 1e6
      }
      val planS = bestMs(VersionedTable.prunedFileCount(spark, sharded, probe))
      val planF = bestMs(VersionedTable.prunedFileCount(spark, flat, probe))

      // 3. append commit metadata bytes (manifests dir growth)
      val beforeS = dirBytes(s"$sharded/manifests")
      VersionedTable.append(appendDf, sharded, statCols)
      val bytesS = dirBytes(s"$sharded/manifests") - beforeS
      val beforeF = dirBytes(s"$flat/manifests")
      VersionedTable.append(appendDf, flat, statCols) // pays the migration
      val bytesF = dirBytes(s"$flat/manifests") - beforeF
      // both still answer identically post-append
      assert(VersionedTable.fastCount(spark, sharded) ==
        VersionedTable.fastCount(spark, flat))
      println(f"$n%7d entries: append wrote $bytesS%9d B (sharded) vs " +
        f"$bytesF%9d B (flat migration = the old format's EVERY-commit " +
        f"cost); plan $planS%6.2f ms vs $planF%6.2f ms; " +
        f"probe opened $opened/$shards shards, kept $keptS files")
      Point(n, bytesS, bytesF, planS, planF)
    }

    val Seq(p10, p100) = points
    val shardedGrowth = p100.shardedAppend.toDouble / p10.shardedAppend
    val flatGrowth = p100.flatAppend.toDouble / p10.flatAppend
    assert(shardedGrowth <= 2.0,
      f"sharded append metadata must be table-size-independent: " +
        f"x$shardedGrowth%.1f over a 10x table")
    assert(flatGrowth >= 5.0,
      f"flat append metadata must scale with the table: x$flatGrowth%.1f")
    assert(p100.shardedAppend * 20 <= p100.flatAppend,
      s"sharded commit must write <=1/20 the flat bytes at 100k: " +
        s"${p100.shardedAppend} vs ${p100.flatAppend}")
    assert(p100.shardedPlanMs < p100.flatPlanMs,
      f"sharded planning must beat the flat parse at 100k: " +
        f"${p100.shardedPlanMs}%.2f vs ${p100.flatPlanMs}%.2f ms")

    spark.stop()
    println("MANIFEST-SHARD-STUDY-OK")
  }
}
