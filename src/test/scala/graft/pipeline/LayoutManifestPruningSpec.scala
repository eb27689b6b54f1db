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

    // 3. a probe on a column the manifest does not carry disables
    // pruning wholesale (no pruning, no loss)
    val (keptMismatch, totalMismatch) = Layout.boxPrunedPaths(spark,
      dataDir, "event_id", 0L, Long.MaxValue, "ts_us", loT, hiT)
    assert(keptMismatch.size == totalMismatch,
      "a probe on an unmanifested column must prune nothing")
    // and a SUBSET probe (1-D over a 2-col manifest) still prunes
    val (kept1d, total1d) = Layout.boxPrunedPaths(spark, dataDir,
      Seq(("user_id", loU, hiU)))
    assert(kept1d.size < total1d,
      "a 1-D subset probe over the 2-col manifest must still prune")
  }

  test("3-D layout: one manifest serves 3-D, 2-D and 1-D box probes; results equal the filtered full read") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
    val b = ev.agg(min($"user_id"), max($"user_id"), min($"ts_us"),
        max($"ts_us"), min($"cents"), max($"cents"))
      .head.toSeq.map(_.asInstanceOf[Long])
    def mid(i: Int): (Long, Long) =
      (b(2 * i) + (b(2 * i + 1) - b(2 * i)) * 30 / 100,
        b(2 * i) + (b(2 * i + 1) - b(2 * i)) * 70 / 100)
    val (loU, hiU) = mid(0); val (loT, hiT) = mid(1); val (loC, hiC) = mid(2)

    val root = java.nio.file.Files.createTempDirectory("graft-manifest3")
      .resolve("table").toString
    Layout.appendGuarded(ev, root)
    Layout.compactZorder3Guarded(spark, root, "user_id", "ts_us", "cents",
      nFiles = 64)
    val dataDir = Layout.tableDataDir(root)

    val probes3 = Seq(("user_id", loU, hiU), ("ts_us", loT, hiT),
      ("cents", loC, hiC))
    val (kept3, total3) = Layout.boxPrunedPaths(spark, dataDir, probes3)
    assert(total3 == 64)
    assert(kept3.size < total3 / 2,
      s"3-D probe kept ${kept3.size}/$total3 — expected a real shrink")
    info(s"3-D box keeps ${kept3.size}/$total3 files")
    // subset probes off the SAME manifest: 2-D and 1-D both prune
    val (kept2, _) = Layout.boxPrunedPaths(spark, dataDir, probes3.take(2))
    val (kept1, _) = Layout.boxPrunedPaths(spark, dataDir, probes3.take(1))
    assert(kept2.size < total3 && kept1.size < total3,
      s"subset probes must prune: 2-D ${kept2.size}, 1-D ${kept1.size}")
    // monotone: a wider probe can only keep more
    assert(kept3.size <= kept2.size && kept2.size <= kept1.size,
      "pruning must be monotone in probe dimensionality")

    // equality with the filtered full read, for all three probe widths
    for (probes <- Seq(probes3, probes3.take(2), probes3.take(1))) {
      val full = Layout.servingRead(spark, root) { df =>
        probes.foldLeft(df) { case (d, (c, lo, hi)) =>
          d.filter(col(c) >= lo && col(c) <= hi)
        }.select($"event_id").collect().map(_.getLong(0)).toSeq.sorted
      }
      val pruned = Layout.servingReadBoxes(spark, root, probes) { df =>
        df.select($"event_id").collect().map(_.getLong(0)).toSeq.sorted
      }
      assert(pruned == full,
        s"${probes.size}-D pruned read diverged from the filtered full read")
    }
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
