package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OBSERVED scan pruning for the z-order layout — the r14 verdict's #2:
  * the 2-D-box claim was previously asserted against the per-file
  * min/max footprint MODEL ([[Layout.fileFootprints]]); this spec runs
  * the real filtered reads and asserts the `FileSourceScanExec` runtime
  * metrics instead.
  *
  * What OSS Spark actually prunes with column min/max statistics is
  * parquet ROW GROUPS, inside the reader, via the pushed-down filters
  * (`spark.sql.parquet.filterPushdown`); file-level pruning at planning
  * time only happens for partition columns. The observable is therefore
  * the scan's `numOutputRows` — rows materialized from row groups whose
  * stats intersected the predicate, BEFORE the post-scan Filter — which
  * for this fixture (each range-partitioned file holds a single row
  * group) is exactly "rows in files touched". The footprint model is
  * kept in the loop as the predicted ceiling: observed rows must not
  * exceed the rows of model-intersecting files, proving the model was a
  * faithful stand-in, and the observed fractions are the SCALE.md
  * numbers.
  */
class LayoutScanPruningSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Execute `df` and return (numOutputRows, numFiles) of its single
    * parquet scan node, read from the EXECUTED plan's metrics.
    */
  private def scanMetrics(df: DataFrame): (Long, Long) = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    assert(scans.length == 1, s"expected one file scan, got ${scans.length}")
    (scans.head.metrics("numOutputRows").value,
      scans.head.metrics("numFiles").value)
  }

  test("observed row-group pruning: z-order serves a 2-D box reading a small fraction; linear reads everything off-dimension") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val Array(minU, maxU, minT, maxT) = ev
      .agg(min($"user_id"), max($"user_id"), min($"ts_us"), max($"ts_us"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    val total = ev.count()

    val base = java.nio.file.Files.createTempDirectory("graft-scanprune")
    val files = 64
    Layout.zorderWrite(ev, "user_id", "ts_us", s"$base/z", files)
    Layout.linearWrite(ev, "ts_us", s"$base/t", files)

    // the same ~10% box per dimension the footprint tests use
    def lo(mn: Long, mx: Long) = mn + (mx - mn) * 45 / 100
    def hi(mn: Long, mx: Long) = mn + (mx - mn) * 55 / 100
    val (u1, u2) = (lo(minU, maxU), hi(minU, maxU))
    val (t1, t2) = (lo(minT, maxT), hi(minT, maxT))
    val box = $"user_id" >= u1 && $"user_id" <= u2 &&
      $"ts_us" >= t1 && $"ts_us" <= t2
    val userOnly = $"user_id" >= u1 && $"user_id" <= u2

    // sanity: the range predicates actually reached the parquet scan
    val planStr = spark.read.parquet(s"$base/z").filter(box)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert(planStr.contains("PushedFilters") &&
      planStr.contains("GreaterThanOrEqual(user_id"),
      s"box predicate not pushed down:\n$planStr")

    // model ceiling: rows living in files whose footprint intersects the
    // box — what the r14 LayoutSpec counted; observed must stay under it
    val fps = spark.read.parquet(s"$base/z")
      .select(input_file_name().as("f"), $"user_id", $"ts_us")
      .groupBy($"f")
      .agg(count(lit(1)).as("rows"),
        min($"user_id").as("mnU"), max($"user_id").as("mxU"),
        min($"ts_us").as("mnT"), max($"ts_us").as("mxT"))
      .collect()
    val modelRows = fps.filter { r =>
      r.getAs[Long]("mxU") >= u1 && r.getAs[Long]("mnU") <= u2 &&
        r.getAs[Long]("mxT") >= t1 && r.getAs[Long]("mnT") <= t2
    }.map(_.getAs[Long]("rows")).sum

    val (zBoxRows, zFiles) = scanMetrics(
      spark.read.parquet(s"$base/z").filter(box))
    val (zUserRows, _) = scanMetrics(
      spark.read.parquet(s"$base/z").filter(userOnly))
    val (linBoxRows, _) = scanMetrics(
      spark.read.parquet(s"$base/t").filter(box))
    val (linUserRows, _) = scanMetrics(
      spark.read.parquet(s"$base/t").filter(userOnly))
    info(s"total=$total observed rows read: z[box]=$zBoxRows (model " +
      s"ceiling $modelRows) z[user]=$zUserRows linear[box]=$linBoxRows " +
      s"linear[user-only]=$linUserRows; scan numFiles=$zFiles")

    // numFiles is a LISTING metric: OSS Spark never drops files by
    // column stats at planning time, so all layouts list all 64 — the
    // pruning is row groups inside the reader, i.e. numOutputRows
    assert(zFiles == files)
    // observed == the mechanism the model predicted (each file is one
    // row group here, so footprint-intersecting files ARE the readable
    // unit): never above the model ceiling, and a small fraction overall
    assert(zBoxRows <= modelRows,
      s"observed $zBoxRows exceeds footprint-model ceiling $modelRows")
    assert(zBoxRows <= total / 4,
      s"z-order 2-D box must read a small fraction: $zBoxRows/$total")
    // z prunes the single-dimension probe too (coarser than the box)
    assert(zUserRows <= total * 6 / 10,
      s"z-order user-only probe must prune: $zUserRows/$total")
    // the time-sorted layout cannot skip anything for a user predicate:
    // every row group's user range straddles the probe
    assert(linUserRows >= total * 9 / 10,
      s"linear layout should read ~all rows off-dimension: $linUserRows/$total")
    // and its 2-D box only benefits from the time half of the predicate
    assert(zBoxRows < linBoxRows,
      s"z-order box read ($zBoxRows) must beat linear ($linBoxRows)")
  }
}
