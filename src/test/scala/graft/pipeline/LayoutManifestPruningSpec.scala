package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footprint-manifest FILE pruning — the r15 verdict's #2: OSS Spark
  * prunes row groups inside the reader but still lists and
  * footer-opens every file (`LayoutScanPruningSpec` observes
  * `numFiles` staying at the full count). The persisted manifest lets
  * [[Layout.servingReadBox]] prune PATHS before the scan plan exists.
  * This spec proves the three load-bearing properties:
  *
  *  1. the path list actually SHRINKS (files, not just row groups) —
  *     observed via the scan's `numFiles` metric;
  *  2. the pruned result is EQUAL to the unpruned serving read under
  *     the same box filter — for both a compacted-only table and one
  *     with unmanifested post-compaction appends and streaming batch
  *     dirs (which must always be kept);
  *  3. a manifest describing DIFFERENT columns is ignored wholesale
  *     (pruning on mismatched stats would silently drop live rows).
  */
class LayoutManifestPruningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.length == 1, s"expected one file scan, got ${scans.length}")
    scans.head.metrics("numFiles").value
  }

  test("box probe prunes file paths against the manifest; results equal the unpruned read; unmanifested files always survive") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val Array(minU, maxU, minT, maxT) = ev
      .agg(min($"user_id"), max($"user_id"), min($"ts_us"), max($"ts_us"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray

    val root = java.nio.file.Files.createTempDirectory("graft-manifest")
      .resolve("table").toString
    Layout.appendGuarded(ev, root)
    Layout.compactZorderGuarded(spark, root, "user_id", "ts_us", nFiles = 64)
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(dataDir,
      Layout.ManifestFile)), "compaction must write the manifest")

    // a selective 2-D box: middle 25% per dimension
    def mid(lo: Long, hi: Long, p1: Long, p2: Long) =
      (lo + (hi - lo) * p1 / 100, lo + (hi - lo) * p2 / 100)
    val (loU, hiU) = mid(minU, maxU, 38, 62)
    val (loT, hiT) = mid(minT, maxT, 38, 62)

    // 1. the PATH list shrinks at planning time
    val (kept, total) = Layout.boxPrunedPaths(spark, dataDir,
      "user_id", loU, hiU, "ts_us", loT, hiT)
    assert(total == 64, s"fixture: expected 64 compacted files, got $total")
    assert(kept.size < total / 2,
      s"manifest pruned ${total - kept.size}/$total — expected a real shrink")
    info(s"box probe keeps ${kept.size}/$total files")

    // and the OBSERVED scan's numFiles is the pruned count, where the
    // plain serving read opens every file
    val boxCount = Layout.servingReadBox(spark, root, "user_id", loU, hiU,
      "ts_us", loT, hiT) { df => df.count() }
    var prunedFiles = 0L
    Layout.servingReadBox(spark, root, "user_id", loU, hiU,
      "ts_us", loT, hiT) { df => prunedFiles = scanFiles(df) }
    var fullFiles = 0L
    Layout.servingRead(spark, root) { df =>
      fullFiles = scanFiles(df.filter(
        $"user_id" >= loU && $"user_id" <= hiU &&
          $"ts_us" >= loT && $"ts_us" <= hiT))
    }
    assert(prunedFiles == kept.size,
      s"scan opened $prunedFiles files, path pruning kept ${kept.size}")
    assert(fullFiles == total,
      s"unpruned scan should list every file: $fullFiles vs $total")

    // 2. equality with the unpruned read under the same filter
    val fullRows = Layout.servingRead(spark, root) { df =>
      df.filter($"user_id" >= loU && $"user_id" <= hiU &&
          $"ts_us" >= loT && $"ts_us" <= hiT)
        .select($"event_id").collect().map(_.getLong(0)).toSeq.sorted
    }
    val prunedRows = Layout.servingReadBox(spark, root, "user_id", loU, hiU,
      "ts_us", loT, hiT) { df =>
      df.select($"event_id").collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(prunedRows == fullRows, "pruned read lost or invented rows")
    assert(boxCount == fullRows.size.toLong)

    // unmanifested additions: a guarded append (flat files) and a
    // streaming-style complete batch dir — both absent from the
    // manifest, both must be read by the box probe
    val extra = ev.filter($"event_id" % 997 === 0)
      .withColumn("user_id", lit((loU + hiU) / 2))
      .withColumn("ts_us", lit((loT + hiT) / 2))
      .withColumn("event_id", $"event_id" + 10000000L)
    Layout.appendGuarded(extra, root)
    val nExtra = extra.count()
    val batch = ev.filter($"event_id" % 991 === 0)
      .withColumn("user_id", lit((loU + hiU) / 2))
      .withColumn("ts_us", lit((loT + hiT) / 2))
      .withColumn("event_id", $"event_id" + 20000000L)
    batch.write.mode("overwrite").parquet(s"$dataDir/b7")
    val nBatch = batch.count()

    val withExtras = Layout.servingReadBox(spark, root, "user_id", loU, hiU,
      "ts_us", loT, hiT) { df => df.count() }
    assert(withExtras == boxCount + nExtra + nBatch,
      s"unmanifested rows missing from the box probe: $withExtras vs " +
        s"$boxCount + $nExtra + $nBatch")

    // re-compaction folds the extras and refreshes the manifest — the
    // probe stays equal to the filtered full read afterwards
    Layout.compactZorderGuarded(spark, root, "user_id", "ts_us", nFiles = 64)
    val afterCompact = Layout.servingReadBox(spark, root, "user_id", loU,
      hiU, "ts_us", loT, hiT) { df => df.count() }
    assert(afterCompact == withExtras, "re-compaction changed the box result")

    // 3. a manifest for the WRONG columns is ignored (no pruning, no loss)
    assert(Layout.readFootprintManifest(spark, dataDir,
      "event_id", "ts_us").isEmpty,
      "column-mismatched manifest must be ignored")
    val (keptMismatch, totalMismatch) = Layout.boxPrunedPaths(spark,
      dataDir, "event_id", 0L, Long.MaxValue, "ts_us", loT, hiT)
    assert(keptMismatch.size == totalMismatch,
      "mismatched manifest must prune nothing")
  }

  test("empty-box probe returns zero rows without inventing a schema failure") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val root = java.nio.file.Files.createTempDirectory("graft-manifest-e")
      .resolve("table").toString
    Layout.appendGuarded(ev, root)
    Layout.compactZorderGuarded(spark, root, "user_id", "ts_us", nFiles = 8)
    // a box disjoint from every footprint: all files pruned
    val n = Layout.servingReadBox(spark, root,
      "user_id", Long.MaxValue - 10, Long.MaxValue,
      "ts_us", Long.MaxValue - 10, Long.MaxValue) { df => df.count() }
    assert(n == 0L)
  }
}
