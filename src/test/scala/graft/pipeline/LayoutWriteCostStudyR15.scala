package graft.pipeline

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-15 write-cost study for the z-order layout — measuring the
  * SCALE.md claim that had only been argued: "the sort/write cost is
  * identical to any other write-ordering (one range exchange); only the
  * key expression changes."
  *
  *   sbt "Test/runMain graft.pipeline.LayoutWriteCostStudyR15"
  *
  * At 1M rows x 3 long columns, three writes of the SAME data:
  * unordered baseline (round-robin repartition — pays the same exchange
  * width without any ordering), linear (range by one column), z-order
  * 3-D (range by the 63-bit Morton key). Measured per write:
  * shuffle-write bytes (SparkListener task metrics) and best-of-2 wall.
  * Asserted: z-order's shuffle bytes within 15% of linear's (the
  * exchange rows are identical; z adds one computed Long per row at
  * most), and within 40% of the unordered baseline (range exchange vs
  * round-robin differ only in partitioner metadata). Wall times print
  * for SCALE.md but are not asserted (host noise).
  */
object LayoutWriteCostStudyR15 {

  private class WriteProbe extends SparkListener {
    val bytes = new java.util.concurrent.atomic.LongAdder
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null)
        bytes.add(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  private def measure(spark: SparkSession)(
      write: () => Unit): (Long, Double) = {
    val probe = new WriteProbe
    spark.sparkContext.addSparkListener(probe)
    val secs = (1 to 2).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      write()
      (System.nanoTime() - t0) / 1e9
    }.min
    val cur = graft.TestMetrics.settle(() => probe.bytes.sum())
    spark.sparkContext.removeSparkListener(probe)
    // two passes ran; halve to a per-write figure
    (cur / 2, secs)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val n = 1000000L
    val df: DataFrame = spark.range(n).select(
        col("id").as("event_id"),
        (abs(hash(col("id") * 2654435761L)) % 100000L).as("user_id"),
        (col("id") * 60000000L).as("ts_us"),
        (abs(hash(col("id") * 40503L)) % 10000L).as("cents"))
      .localCheckpoint() // freeze the source so each write pays ONLY its exchange
    val base = java.nio.file.Files.createTempDirectory("graft-wcost")
    val files = 64

    val (bPlain, tPlain) = measure(spark) { () =>
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$base/plain")
    }
    val (bLin, tLin) = measure(spark) { () =>
      Layout.linearWrite(df, "ts_us", s"$base/lin", files)
    }
    val (bZ, tZ) = measure(spark) { () =>
      Layout.zorderWrite3(df, "user_id", "ts_us", "cents", s"$base/z3", files)
    }
    println(f"write cost at $n rows x $files files: " +
      f"plain ${bPlain / 1048576.0}%.1f MiB/$tPlain%.1f s, " +
      f"linear ${bLin / 1048576.0}%.1f MiB/$tLin%.1f s, " +
      f"zorder3 ${bZ / 1048576.0}%.1f MiB/$tZ%.1f s")

    assert(bZ <= bLin * 1.15 && bZ >= bLin * 0.85,
      f"z-order shuffle must match linear's (same exchange rows): " +
        f"$bZ vs $bLin (x${bZ.toDouble / bLin}%.2f)")
    assert(bZ <= bPlain * 1.4,
      f"range exchange must stay near the round-robin baseline: " +
        f"$bZ vs $bPlain (x${bZ.toDouble / bPlain}%.2f)")
    // and the written layouts hold the same rows
    val rows = Seq("plain", "lin", "z3")
      .map(p => spark.read.parquet(s"$base/$p").count())
    assert(rows.forall(_ == n), s"writes lost rows: $rows")
    spark.stop()
    println("WRITE-COST-STUDY-OK")
  }
}
