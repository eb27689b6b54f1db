package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import graft.TestSpark
import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[StreamingVersionedIngest]]: the replay hazard, proven absorbed by
  * the manifest's ingest frontier — a batch crashed AFTER its append
  * (version published) but BEFORE its checkpoint commit is
  * re-delivered on restart and must publish nothing the second time.
  */
class StreamingVersionedIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Stats = Seq("user_id", "ts_us")

  private def servedIds(root: String): Seq[Long] =
    VersionedTable.read(spark, root)
      .select($"event_id").collect().map(_.getLong(0)).toSeq.sorted

  test("batch replay after a post-append crash publishes nothing; compaction is safe mid-stream") {
    val base = java.nio.file.Files.createTempDirectory("graft-svi")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString,
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))

    // run 1: two files, one batch each
    TestSpark.writeEventsFile(src, "f0",
      (0L until 50L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    TestSpark.writeEventsFile(src, "f1",
      (50L until 100L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingVersionedIngest.ingestAvailable(stream(), root, ckpt, Stats)
    assert(servedIds(root) == (0L until 100L))
    assert(VersionedTable.versions(spark, root) == Seq(1L, 2L))

    // compaction mid-lifecycle: a pure layout change, new version only
    VersionedTable.compactZorder(spark, root, nFiles = 4)
    assert(servedIds(root) == (0L until 100L))
    assert(VersionedTable.latestVersion(spark, root).contains(3L))

    // run 2 with a forced replay: the batch's append PUBLISHES (a new
    // version exists), then the checkpoint commit is crashed — restart
    // re-delivers the SAME batch and the ingest frontier must skip it
    TestSpark.writeEventsFile(src, "f2",
      (100L until 150L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    val crashOnce = new AtomicBoolean(true)
    intercept[Exception] {
      StreamingVersionedIngest.ingestAvailable(stream(), root, ckpt, Stats,
        afterBatch = _ =>
          if (crashOnce.getAndSet(false))
            throw new RuntimeException("injected post-append crash"))
    }
    assert(!crashOnce.get(), "the injected crash must actually have fired")
    assert(servedIds(root) == (0L until 150L),
      "the crashed batch's version is already published and servable")
    val vAfterCrash = VersionedTable.latestVersion(spark, root).get

    StreamingVersionedIngest.ingestAvailable(stream(), root, ckpt, Stats)
    assert(servedIds(root) == (0L until 150L),
      "replay must publish nothing: rows exactly once")
    assert(VersionedTable.latestVersion(spark, root).contains(vAfterCrash),
      "replay must not even publish an empty version")

    // lease released by every writer
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root,
      graft.pipeline.WriterLease.LeaseFileName)))
  }

  test("pack cadence: every Nth batch folds the stream's runt files; rows exactly once; replay skips the pack too") {
    val base = java.nio.file.Files.createTempDirectory("graft-svi-pack")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString,
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))

    (0 until 6).foreach { k =>
      TestSpark.writeEventsFile(src, s"f$k",
        (k * 50L until (k + 1) * 50L).map(i =>
          (i, (i + 1) * 60000000000L, i % 7, "view")))
    }
    // every 2nd batch folds everything under 10k rows (i.e. all of it)
    StreamingVersionedIngest.ingestAvailable(stream(), root, ckpt, Stats,
      packEvery = 2, packMinRows = 10000L, packTargetRows = 100000L)
    assert(servedIds(root) == (0L until 300L),
      "pack maintenance must never change the rows")
    assert(VersionedTable.fastCount(spark, root) == 300L)
    val latest = VersionedTable.latestVersion(spark, root).get
    // the folds really ran: more versions than batches, compact kinds
    // interleaved, and the final file count is a handful, not 6+ runts
    val kinds = VersionedTable.history(spark, root).map(_._3)
    assert(kinds.count(_ == "compact") >= 2,
      s"pack cadence must have folded at least twice: $kinds")
    // change reads across packs: every streamed row exactly once
    assert(VersionedTable.readChanges(spark, root, 0, latest).count() == 300L)
    // after dropping history, the live file set is a few packed files,
    // not one runt set per batch
    VersionedTable.vacuum(spark, root, keepVersions = 1, graceMs = 0L)
    val liveFiles = new java.io.File(s"$root/files").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("."))
    assert(liveFiles < kinds.count(_ == "append"),
      s"the packed table must hold fewer files ($liveFiles) than " +
        s"batches appended (${kinds.count(_ == "append")})")
    assert(servedIds(root) == (0L until 300L), "vacuum must not touch live data")
  }
}
