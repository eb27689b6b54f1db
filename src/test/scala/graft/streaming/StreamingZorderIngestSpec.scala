package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import graft.TestSpark
import graft.pipeline.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[StreamingZorderIngest]]: a REAL Structured Streaming sink feeding
  * the guarded z-order table — micro-batch appends, a forced REPLAY of
  * a fully-appended batch (crash after append, before checkpoint
  * commit), guarded compaction between quiesced runs, and serving reads
  * over the mixed batch-dirs-plus-flat-files layout. The thread-based
  * `LayoutLiveWriterSpec` proves concurrency; this spec proves the
  * streaming-specific hazard: replay must not duplicate.
  */
class StreamingZorderIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def servedIds(root: String): Seq[Long] =
    Layout.servingRead(spark, root) { df =>
      df.select($"event_id").collect().map(_.getLong(0)).toSeq.sorted }

  test("streaming ingest: batch replay after a post-append crash does not duplicate; compaction folds between runs") {
    val base = java.nio.file.Files.createTempDirectory("graft-szi")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString,
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))

    // ——— run 1: two files, one batch each (maxFilesPerTrigger = 1)
    TestSpark.writeEventsFile(src, "f0",
      (0L until 50L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    TestSpark.writeEventsFile(src, "f1",
      (50L until 100L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)
    assert(servedIds(root) == (0L until 100L))

    // ——— quiesced-and-committed: the frontier-gated fold flattens both
    // committed batch dirs into the clustered layout
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == (0L until 100L),
      "compaction must be a pure layout change")
    val dataDir = Layout.tableDataDir(root)
    val flatFiles = spark.read.parquet(dataDir)
      .select(input_file_name()).distinct().count()
    assert(flatFiles == 4, s"expected 4 compacted files, got $flatFiles")

    // ——— run 2 with a forced replay: the batch's append completes, then
    // the commit is crashed — the restart re-delivers the SAME batch and
    // the deterministic-overwrite discipline must absorb it
    TestSpark.writeEventsFile(src, "f2",
      (100L until 150L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    val crashOnce = new AtomicBoolean(true)
    val crashed = intercept[Exception] {
      StreamingZorderIngest.ingestAvailable(stream(), root, ckpt,
        afterBatch = _ =>
          if (crashOnce.getAndSet(false))
            throw new RuntimeException("injected post-append crash"))
    }
    assert(crashed.getMessage != null)
    assert(!crashOnce.get(), "the injected crash must actually have fired")

    // ——— THE hazard the frontier gate exists for: the table is quiesced
    // with a complete-but-UNCOMMITTED b2 on disk; a fold that consumed
    // it would duplicate every row when the restart replays the batch.
    // compactCommitted must leave b2 untouched (nothing new to fold: the
    // committed prefix is already the 4-file snapshot).
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val b2 = new org.apache.hadoop.fs.Path(dataDir, "b2")
    assert(fs.exists(new org.apache.hadoop.fs.Path(b2, "_SUCCESS")),
      "fixture: the crashed batch must be complete on disk")
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(fs.exists(b2),
      "an uncommitted batch dir must survive compaction unfolded")
    assert(servedIds(root) == (0L until 150L),
      "a complete batch is servable pre-commit (replay rewrites it identically)")

    // the batch's data DID land before the crash — a naive mode-append
    // restart would now write it a second time
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)
    val afterReplay = servedIds(root)
    assert(afterReplay == (0L until 150L),
      s"replayed batch duplicated or lost rows: ${afterReplay.size} ids, " +
        s"${afterReplay.distinct.size} distinct")

    // ——— now committed: the final frontier-gated fold converges to the
    // clean clustered snapshot
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == (0L until 150L))
    assert(!fs.exists(b2), "committed batches must fold away")

    // ——— torn batch: a mid-job-commit crash leaves part files with NO
    // _SUCCESS — readers must not serve the torn subset, and compaction
    // must not fold it (the replay will rewrite the full batch)
    val torn = new org.apache.hadoop.fs.Path(dataDir, "b99")
    fs.mkdirs(torn)
    val donor = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .filter(_.isFile).head.getPath
    org.apache.hadoop.fs.FileUtil.copy(fs, donor, fs,
      new org.apache.hadoop.fs.Path(torn, donor.getName), false,
      spark.sparkContext.hadoopConfiguration)
    assert(servedIds(root) == (0L until 150L),
      "a torn (_SUCCESS-less) batch dir must be invisible to readers")
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(fs.exists(torn), "a torn batch dir must ride through the fold")
    assert(servedIds(root) == (0L until 150L))
    fs.delete(torn, true)

    assert(!fs.exists(new org.apache.hadoop.fs.Path(dataDir + ".staging")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(dataDir + ".old")),
      "compaction left swap debris")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root,
      graft.pipeline.WriterLease.LeaseFileName)),
      "ingest must release the lease")
  }

  test("compactCommitted on a mixed table: folds complete guarded appends, drops dead ones, carries foreign dirs") {
    val base = java.nio.file.Files.createTempDirectory("graft-szi-mixed")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    TestSpark.writeEventsFile(src, "f0",
      (0L until 50L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)

    // a guarded MANUAL append on the same table (lease-governed, not
    // checkpoint-governed): complete -> compactCommitted may fold it
    val extra = spark.range(1000, 1050)
      .select($"id".as("event_id"), ($"id" % 7).as("user_id"),
        ($"id" * 1000000L).as("ts_us"))
    Layout.appendGuarded(extra, root)
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a DEAD append: 'a' + 32 hex chars, no _SUCCESS — a crashed
    // appendGuarded whose caller never got an ack; must be dropped
    val dead = new org.apache.hadoop.fs.Path(dataDir,
      "a" + "0123456789abcdef0123456789abcdef")
    fs.mkdirs(dead)
    // a FOREIGN dir: not b<id>, not a<hex32>, no _SUCCESS — not ours
    // to reason about; must be carried through the swap untouched
    val foreign = new org.apache.hadoop.fs.Path(dataDir, "user_export")
    fs.mkdirs(foreign)

    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == ((0L until 50L) ++ (1000L until 1050L)),
      "the complete guarded append must fold in, losslessly")
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .map(_.getPath.getName).filterNot(n => n.startsWith("_")).toSet
    assert(!names.exists(_.startsWith("a0123456789")),
      "a dead (unacked) append must be dropped")
    assert(names.contains("user_export"),
      "a foreign dir must ride through the swap, never be deleted")
    assert(!names.exists(n => n.startsWith("a") && n.length == 33),
      "the complete append dir must have been folded away")
  }

  test("rescue: a batch dir stranded in .staging by a crashed compaction survives the next fold, even once committed") {
    val base = java.nio.file.Files.createTempDirectory("graft-szi-rescue")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString,
        maxFilesPerTrigger = Some(1))
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))

    // three committed batches (frontier = 2)
    for (f <- 0 to 2)
      TestSpark.writeEventsFile(src, s"f$f",
        (f * 50L until (f + 1) * 50L)
          .map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)
    assert(servedIds(root) == (0L until 150L))

    // ——— reconstruct the crash window the advisor flagged: a compaction
    // whose frontier read was STALE at 1 wrote its fold of {b0, b1} to
    // `.staging`, moved the then-pending b2 in after it, and crashed
    // before swapIn. Between that frontier read and the crash, b2's
    // checkpoint commit landed (commits/2 exists) — so no restart will
    // ever replay it, and the stranded copy is the ONLY copy.
    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagingPath = dataDir + ".staging"
    Layout.zorderWrite(
      spark.read.parquet(s"$dataDir/b0", s"$dataDir/b1"),
      "user_id", "ts_us", stagingPath, 2)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dataDir, "b2"),
      new org.apache.hadoop.fs.Path(stagingPath, "b2")),
      "fixture: moving b2 into staging must succeed")
    assert(servedIds(root) == (0L until 100L),
      "fixture: the stranded rows are invisible until rescued")

    // the next compaction must RESCUE staging/b2 before its own fold
    // overwrites staging — without the rescue, rows 100–149 are gone
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == (0L until 150L),
      "a committed batch stranded in .staging was lost by compaction")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dataDir, "b2")),
      "once rescued and committed, the batch folds into the flat layout")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(stagingPath)) &&
      !fs.exists(new org.apache.hadoop.fs.Path(dataDir + ".old")),
      "compaction left swap debris")

    // ——— redundant-copy branch: a stranded dir whose batch was replayed
    // (deterministic overwrite re-created data/b<id>) is simply dropped
    TestSpark.writeEventsFile(src, "f3",
      (150L until 200L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)
    val b3 = new org.apache.hadoop.fs.Path(dataDir, "b3")
    fs.mkdirs(new org.apache.hadoop.fs.Path(stagingPath))
    org.apache.hadoop.fs.FileUtil.copy(fs, b3, fs,
      new org.apache.hadoop.fs.Path(stagingPath, "b3"), false,
      spark.sparkContext.hadoopConfiguration)
    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == (0L until 200L),
      "a redundant stranded copy must not duplicate the batch's rows")
  }

  test("rescue: a FOREIGN dir stranded in .staging by a crashed compaction is moved back, never deleted") {
    val base = java.nio.file.Files.createTempDirectory("graft-szi-foreign")
    val src = java.nio.file.Files.createDirectory(base.resolve("src"))
    val root = base.resolve("table").toString
    val ckpt = s"$base/ckpt"
    def stream() = EventStreamPipeline.readEvents(spark, src.toString)
      .select($"event_id", $"user_id",
        expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    TestSpark.writeEventsFile(src, "f0",
      (0L until 50L).map(i => (i, (i + 1) * 60000000000L, i % 7, "view")))
    StreamingZorderIngest.ingestAvailable(stream(), root, ckpt)

    val dataDir = Layout.tableDataDir(root)
    val fs = new org.apache.hadoop.fs.Path(dataDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagingPath = dataDir + ".staging"

    // ——— the advisor's exact sequence: a compaction folded the flat
    // files into .staging, moved the foreign dir in as PENDING (the
    // carry-through-the-swap move), and crashed before swapIn. The
    // stranded foreign copy is the ONLY copy; the old rescue (b<id>
    // dirs only) left it in staging and the next fold's
    // mode=overwrite write deleted it permanently.
    Layout.zorderWrite(Layout.servingRead(spark, root)(identity),
      "user_id", "ts_us", stagingPath, 2)
    val foreignStranded =
      new org.apache.hadoop.fs.Path(stagingPath, "user_export")
    fs.mkdirs(foreignStranded)
    val payload = new org.apache.hadoop.fs.Path(foreignStranded, "keep.txt")
    val out = fs.create(payload, true)
    out.write("precious".getBytes("UTF-8")); out.close()
    // a crashed zorderWrite's job-internal dir must NOT be rescued
    fs.mkdirs(new org.apache.hadoop.fs.Path(stagingPath, "_temporary"))

    StreamingZorderIngest.compactCommitted(spark, root, ckpt,
      "user_id", "ts_us", nFiles = 4)
    assert(servedIds(root) == (0L until 50L), "fold must stay lossless")
    val rescued = new org.apache.hadoop.fs.Path(dataDir, "user_export")
    assert(fs.exists(new org.apache.hadoop.fs.Path(rescued, "keep.txt")),
      "the stranded foreign dir's content must survive the next fold")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dataDir, "_temporary")),
      "job-internal staging debris must not be rescued into the data dir")

    // and the collision case fails LOUDLY instead of guessing:
    // re-strand the foreign dir while a same-named dir exists in data
    Layout.zorderWrite(Layout.servingRead(spark, root)(identity),
      "user_id", "ts_us", stagingPath, 2)
    fs.mkdirs(new org.apache.hadoop.fs.Path(stagingPath, "user_export"))
    val boom = intercept[java.io.IOException] {
      StreamingZorderIngest.compactCommitted(spark, root, ckpt,
        "user_id", "ts_us", nFiles = 4)
    }
    assert(boom.getMessage.contains("refusing to guess"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(rescued, "keep.txt")),
      "the collision abort must leave both copies in place")
  }
}
