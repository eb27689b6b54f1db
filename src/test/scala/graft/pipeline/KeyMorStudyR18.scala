package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 EQUALITY-delete economics — the measured case for
  * [[VersionedTable.deleteKeysMor]], the GDPR / dedup-removal shape
  * (delete N ids from a big table):
  *
  *   sbt "Test/runMain graft.pipeline.KeyMorStudyR18"
  *
  * A 1M-row table z-ordered on (user_id, ts_us): the delete key column
  * (event_id) is NOT the clustering order, so per-file event_id boxes
  * span nearly the whole id space and EVERY file is a candidate — the
  * honest worst case for a key delete (a key-clustered layout is
  * measured as the second arm). 2000 keys spread uniformly:
  *
  *  - MARKER arm: `deleteKeysMor` pays one key-pruned counting scan
  *    plus a sidecar write plus a metadata CAS — zero data files;
  *  - COW arm: `materializeDeletes` afterwards pays the rewrite of
  *    every covered file (what an eager copy-on-write key delete
  *    would have paid at delete time).
  *
  * Asserted: exact deleted counts and identical visible rows; the
  * marker wrote ZERO data files and ONE sidecar while the COW arm
  * rewrote every covered file — the claim that scales is BYTES
  * WRITTEN, not local wall-clock: at this size the marker's exact
  * counting scan (the price of `fastCount` staying exact, several
  * small jobs) can cost as much as one 1M-row rewrite, but the
  * rewrite grows with covered bytes while the marker's scan grows
  * only with the count job — wall-clocks are REPORTED for the record,
  * with the files-written delta asserted; the marked table's full
  * read stays within 2.5× of clean (the anti-join tax the cap
  * bounds); and on the key-clustered layout the same delete covers a
  * strict subset of files (the sparse-key refinement pruning the
  * candidate set).
  */
object KeyMorStudyR18 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val stats = Seq("user_id", "ts_us", "event_id")
    val n = 1000000L
    def data = spark.range(0, n)
      .select($"id".as("event_id"), ($"id" % 97).as("user_id"),
        ($"id" * 1000L).as("ts_us"))
    val keys = (0L until n by (n / 2000)).toSeq
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def dataFiles(root: String): Int =
      new java.io.File(s"$root/files").listFiles()
        .count(f => f.isFile && !f.getName.startsWith("."))
    def sidecars(root: String): Int =
      new java.io.File(s"$root/manifests").listFiles()
        .count(_.getName.startsWith("k-"))

    // ——— arm 1: z-ordered on (user_id, ts_us) — key column unclustered
    val root = java.nio.file.Files
      .createTempDirectory("graft-keymor-z").resolve("t").toString
    VersionedTable.append(data, root, stats)
    VersionedTable.compactZorder(spark, root, nFiles = 64)
    val filesBefore = dataFiles(root)
    val (cleanCount, cleanRead) = timed(
      VersionedTable.read(spark, root).count())

    val ((_, matched), markerSecs) = timed(
      VersionedTable.deleteKeysMor(spark, root, "event_id",
        keys.toDF("event_id")))
    require(matched == keys.size.toLong, s"matched $matched")
    require(dataFiles(root) == filesBefore,
      "the marker must write ZERO data files")
    require(sidecars(root) == 1, "one parquet sidecar for 2000 keys")
    val (markedCount, markedRead) = timed(
      VersionedTable.read(spark, root).count())
    require(markedCount == n - keys.size)

    val (_, cowSecs) = timed(VersionedTable.materializeDeletes(spark, root))
    val afterCow = VersionedTable.read(spark, root).count()
    require(afterCow == markedCount, "materialize must not change rows")

    val filesAfterCow = dataFiles(root)
    println(f"unclustered key delete (2000 keys, $filesBefore files):")
    println(f"  marker commit  ${markerSecs}%7.2f s   (0 data files, 1 sidecar)")
    println(f"  COW rewrite    ${cowSecs}%7.2f s   " +
      f"(+${filesAfterCow - filesBefore} data files rewritten)")
    println(f"  full read      clean ${cleanRead}%5.2f s  marked " +
      f"${markedRead}%5.2f s (${markedRead / cleanRead}%.2fx)")
    require(filesAfterCow > filesBefore,
      "the COW arm must have rewritten covered files")
    require(markedRead <= 2.5 * cleanRead + 0.5,
      f"read tax out of band: $markedRead%.2f vs $cleanRead%.2f")
    require(cleanCount == n)

    // ——— arm 2: key-CLUSTERED layout — the sparse refinement prunes
    val root2 = java.nio.file.Files
      .createTempDirectory("graft-keymor-k").resolve("t").toString
    VersionedTable.append(
      data.repartitionByRange(64, $"event_id"), root2, stats)
    val total2 = dataFiles(root2)
    val few = keys.take(40) // ≤ SparseKeyProbeLimit: per-key file probes
    val (_, m2) = VersionedTable.deleteKeysMor(spark, root2, "event_id",
      few.toDF("event_id"))
    require(m2 == few.size.toLong)
    val v2 = VersionedTable.latestVersion(spark, root2).get
    val covered = VersionedTable.morDeleteCoveredFiles(spark, root2, v2)
    println(f"key-clustered delete (${few.size} keys): marker covers " +
      f"$covered/$total2 files")
    require(covered < total2,
      s"sparse keys must prune the candidate set: $covered/$total2")
    require(VersionedTable.read(spark, root2).count() == n - few.size)

    println("key-mor study: all bounds hold")
    spark.stop()
  }
}
