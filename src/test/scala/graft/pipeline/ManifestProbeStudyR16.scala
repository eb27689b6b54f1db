package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Round-16 probe-cost study for the footprint manifest — the numbers
  * behind the claim that planning-time FILE pruning matters once a
  * table has many files:
  *
  *   sbt "Test/runMain graft.pipeline.ManifestProbeStudyR16"
  *
  * 1M rows z-ordered into 512 files, one guarded table, one selective
  * 2-D box (middle 25% per dimension ≈ 6% selectivity). Measured per
  * probe, best-of-2: files the scan OPENS (`numFiles` — each open is a
  * listing entry + a footer read, the per-file costs that dominate
  * selective probes at millions of files), rows materialized from row
  * groups, and wall. The manifest path must open only the
  * path-pruned subset and return the identical result; wall times
  * print for SCALE.md (local[32] over page-cached local files
  * understates the at-scale gap, where every footer is a remote
  * ranged read — the files-opened column is the durable observable).
  */
object ManifestProbeStudyR16 {

  /** Execute `df` (collect) and return (result rows, files opened,
    * rows materialized by the scan). The metrics must come from the
    * SAME query execution — a separate `.count()` builds its own plan
    * and leaves this one's metrics at zero.
    */
  private def scanStats(df: org.apache.spark.sql.DataFrame)
      : (Long, Long, Long) = {
    val nRows = df.collect().length.toLong
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect { case s: FileSourceScanExec => s }
    require(scans.length == 1, s"expected one scan, got ${scans.length}")
    (nRows, scans.head.metrics("numFiles").value,
      scans.head.metrics("numOutputRows").value)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("probe16")
    val root = s"$base/table"
    val n = 1000000L
    val files = 512
    val ev = spark.range(n)
      .select(col("id").as("event_id"),
        (col("id") % 9973).as("user_id"),
        (lit(1700000000000000L) + pmod(col("id") * 2654435761L,
          lit(86400000000L * 365))).as("ts_us"))
    Layout.appendGuarded(ev, root)
    Layout.compactZorderGuarded(spark, root, "user_id", "ts_us", files)

    val loU = 9973L * 38 / 100; val hiU = 9973L * 62 / 100
    val loT = 1700000000000000L + 86400000000L * 365 * 38 / 100
    val hiT = 1700000000000000L + 86400000000L * 365 * 62 / 100

    def timed[A](f: => A): (A, Double) = {
      System.gc()
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    var prunedStats = (0L, 0L, 0L); var fullStats = (0L, 0L, 0L)
    val prunedWall = (1 to 2).map { _ =>
      timed {
        Layout.servingReadBox(spark, root, "user_id", loU, hiU,
          "ts_us", loT, hiT) { df => prunedStats = scanStats(df) }
      }._2
    }.min
    val fullWall = (1 to 2).map { _ =>
      timed {
        Layout.servingRead(spark, root) { df0 =>
          fullStats = scanStats(
            df0.filter($"user_id" >= loU && $"user_id" <= hiU &&
              $"ts_us" >= loT && $"ts_us" <= hiT))
        }
      }._2
    }.min

    println(f"box probe over $files files: manifest opens ${prunedStats._2} " +
      f"files / materializes ${prunedStats._3} rows / $prunedWall%.2f s; " +
      f"plain opens ${fullStats._2} / ${fullStats._3} rows / $fullWall%.2f s " +
      f"(result ${prunedStats._1} rows both ways)")
    require(prunedStats._1 == fullStats._1,
      s"pruned probe changed the result: ${prunedStats._1} vs ${fullStats._1}")
    require(fullStats._2 == files,
      s"plain probe must open every file: ${fullStats._2}")
    require(prunedStats._2 <= files / 2,
      s"manifest must prune at least half the files: ${prunedStats._2}")
    // row-group pruning still runs after path pruning, so the pruned
    // scan must never materialize MORE rows than the plain one
    require(prunedStats._3 <= fullStats._3,
      s"pruned scan read more rows: ${prunedStats._3} vs ${fullStats._3}")
    spark.stop()
    println("MANIFEST-PROBE-STUDY-OK")
  }
}
