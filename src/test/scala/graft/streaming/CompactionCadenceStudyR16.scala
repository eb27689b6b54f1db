package graft.streaming

import graft.pipeline.Layout
import org.apache.spark.sql.SparkSession

/** Round-16 compaction-cadence study for the streaming z-order table —
  * the numbers an operator needs to pick a fold cadence at ingest
  * scale, which r15 shipped the MECHANISM for (`compactCommitted`,
  * crash-safe and frontier-gated) without measuring:
  *
  *   sbt "Test/runMain graft.streaming.CompactionCadenceStudyR16"
  *
  * 1. **Fold cost vs pile size at CONSTANT total rows** (1M rows split
  *    into 16 / 64 / 256 committed batch dirs): the fold is one read +
  *    one z-order write of the same bytes, so its cost must be driven
  *    by ROWS, not by how many batch dirs the rows arrived in — the
  *    per-dir overhead is a listing entry, a `_SUCCESS` probe, and a
  *    scan-split seam. Asserted: best-of-2 wall of the 256-dir fold ≤
  *    4× the 16-dir fold (a 16× dir blowup must not cost anywhere near
  *    16×); the residual slope is the small-files tax that sets how
  *    LONG one can defer compaction, printed for SCALE.md.
  * 2. **Serving availability DURING a fold**: readers poll
  *    `Layout.servingRead` row counts throughout a live
  *    `compactCommitted` of the 256-dir pile. Asserted: every poll
  *    returns the exact row count (the swap never serves a hole or a
  *    partial fold), and no poll stalls for the fold's duration —
  *    serving latency is bounded by the swap's transient-retry window,
  *    not by fold length. Max observed poll latency prints for
  *    SCALE.md; the assertion bound is generous (5 s) because
  *    single-pass wall times on this host spike ~3×.
  *
  * Pile construction writes committed `b<id>` dirs and their
  * checkpoint commit markers directly — the study measures COMPACTION,
  * not ingest; `StreamingZorderIngestSpec` proves the ingest path
  * produces exactly this layout.
  */
object CompactionCadenceStudyR16 {

  private def buildPile(spark: SparkSession, root: String, ckpt: String,
      totalRows: Long, batches: Int): Unit = {
    import org.apache.spark.sql.functions._
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    // one job, every batch dir in one pass: partition by batch id and
    // write partitioned, then rename the key=value dirs to b<id> form
    // (a per-batch write loop would be 256 Spark jobs of setup noise).
    // integer DIV, not Column./ — double division would round the tail
    // ids into a (batches+1)th bucket the rename loop never moves
    val staged = s"$root/.pilestage"
    spark.range(totalRows)
      .select(col("id").as("event_id"),
        (col("id") % 9973).as("user_id"),
        (lit(1700000000000000L) + col("id") * 1000000L).as("ts_us"),
        expr(s"CAST(id * $batches DIV $totalRows AS INT)").as("b"))
      .repartition(col("b"))
      .write.partitionBy("b").mode("overwrite").parquet(staged)
    for (i <- 0 until batches) {
      val from = new org.apache.hadoop.fs.Path(s"$staged/b=$i")
      val to = new org.apache.hadoop.fs.Path(s"$dataDir/b$i")
      fs.mkdirs(to.getParent)
      require(fs.rename(from, to), s"pile build: rename $from failed")
      // partitioned writes put _SUCCESS at the root, not per dir
      fs.create(new org.apache.hadoop.fs.Path(to, "_SUCCESS"), true).close()
      val c = new org.apache.hadoop.fs.Path(s"$ckpt/commits/$i")
      fs.mkdirs(c.getParent)
      fs.create(c, true).close()
    }
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("cadence16")
    val totalRows = 1000000L

    // ——— 1. fold cost vs pile size, best-of-2 per tier
    val walls = Seq(16, 64, 256).map { batches =>
      val secs = (1 to 2).map { _ =>
        val root = s"$base/t$batches"
        val ckpt = s"$base/c$batches"
        buildPile(spark, root, ckpt, totalRows, batches)
        System.gc()
        val t0 = System.nanoTime()
        StreamingZorderIngest.compactCommitted(spark, root, ckpt,
          "user_id", "ts_us", nFiles = 32)
        val s = (System.nanoTime() - t0) / 1e9
        val n = Layout.servingRead(spark, root)(_.count())
        require(n == totalRows, s"fold lost rows: $n")
        s
      }.min
      println(f"fold $batches%3d dirs x ${totalRows / batches}%6d rows: " +
        f"$secs%.2f s (best of 2)")
      batches -> secs
    }.toMap
    assert(walls(256) <= walls(16) * 4,
      f"fold cost must be row-driven, not dir-driven: 16 dirs " +
        f"${walls(16)}%.2f s vs 256 dirs ${walls(256)}%.2f s")

    // ——— 2. serving availability while a fold runs (256-dir pile)
    val root = s"$base/live"
    val ckpt = s"$base/livec"
    buildPile(spark, root, ckpt, totalRows, 256)
    @volatile var foldDone = false
    @volatile var foldErr: Throwable = null
    val folder = new Thread(() => {
      try StreamingZorderIngest.compactCommitted(spark, root, ckpt,
        "user_id", "ts_us", nFiles = 32)
      catch { case t: Throwable => foldErr = t }
      finally foldDone = true
    }, "cadence16-folder")
    val t0 = System.nanoTime()
    folder.start()
    var polls = 0
    var maxPollSec = 0.0
    while (!foldDone) {
      val p0 = System.nanoTime()
      val n = Layout.servingRead(spark, root)(_.count())
      val sec = (System.nanoTime() - p0) / 1e9
      require(n == totalRows,
        s"poll $polls during fold saw $n rows (want $totalRows)")
      maxPollSec = math.max(maxPollSec, sec)
      polls += 1
    }
    folder.join()
    val foldSec = (System.nanoTime() - t0) / 1e9
    if (foldErr != null) throw foldErr
    println(f"live fold: $foldSec%.2f s, $polls consistent polls, " +
      f"max poll latency $maxPollSec%.2f s")
    assert(polls >= 3, s"fixture too fast to observe serving: $polls polls")
    assert(maxPollSec <= 5.0,
      f"a serving read stalled $maxPollSec%.2f s during the fold — " +
        "latency must be bounded by the swap retry window, not fold length")
    spark.stop()
    println("CADENCE-STUDY-R16-OK")
  }
}
