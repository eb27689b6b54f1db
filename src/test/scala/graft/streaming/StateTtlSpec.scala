package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The two wall-clock state-lifecycle guards `transformWithState` offers
  * beyond event-time watermarks — state TTL and PROCESSING-time timers —
  * proven on controlled fixtures: expired state really leaves the store
  * (row-count metric) and really resets the fold (output semantics),
  * while live state is untouched. Both are inherently
  * processing-time-dependent, so they are spec-verified here rather than
  * DuckDB-oracled (a deterministic SQL oracle cannot exist for wall-clock
  * expiry).
  */
class StateTtlSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocksDb[A](body: => A): A = {
    // checkpoint file checksums OFF for these drains: Spark 4.1's
    // ChecksumCheckpointFileManager runs a small fixed worker pool, and
    // 32 state partitions concurrently closing RocksDB snapshot zips can
    // starve it into a livelock (observed: every task parked in
    // ChecksumCancellableFSDataOutputStream.close awaiting a checksum
    // future). Local-FS test checkpoints don't need corruption detection;
    // 4 shuffle partitions also right-size the state stores for the
    // 3-row fixtures.
    //
    // no-data micro-batches OFF: under `TimeMode.ProcessingTime`,
    // `TransformWithStateExecBase.shouldRunAnotherBatch` returns true
    // unconditionally (processing time always advances), so with no-data
    // batches enabled the query constructs empty batch after empty batch
    // — `processAllAvailable()` never observes quiescence (measured:
    // 4000+ committed batches before this spec was killed), and
    // `Trigger.AvailableNow` never terminates for the same reason. With
    // them disabled, batches run only for data; every phase below writes
    // a file before asserting, and TTL sweeps / expired-timer firings
    // both happen on data batches (each batch runs every state
    // partition, so idle keys' partitions are swept too).
    val keys = Seq(ProviderKey,
      "spark.sql.streaming.checkpoint.fileChecksum.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.streaming.noDataMicroBatches.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(ProviderKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def writeEvents(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Long, Long, String)]): Unit =
    TestSpark.writeEventsFile(dir, name, rows)

  private def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.lastProgress.stateOperators.map(_.numRowsTotal).sum

  test("state TTL: idle users' state rows are evicted and their fold restarts") {
    withRocksDb {
      val srcDir = java.nio.file.Files.createTempDirectory("graft-ttl-src")
      // batch 1: user 1 has two events (types a, b), user 2 has one
      writeEvents(srcDir, "batch-0", Seq(
        (1L, 1000000000L, 1L, "a"), (2L, 2000000000L, 1L, "b"),
        (3L, 1500000000L, 2L, "a")))
      val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
      val q = EventStreamPipeline
        .runningDistinctTtl(stream, java.time.Duration.ofSeconds(2))
        .writeStream.outputMode("append")
        .format("memory").queryName("ttl_stream")
        .start()
      try {
        q.processAllAvailable()
        val afterB1 = spark.table("ttl_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(afterB1 == Set((1L, 1L, 1L, 1L), (1L, 2L, 2L, 2L), (2L, 3L, 1L, 1L)),
          s"batch-1 running fold wrong: $afterB1")
        val rowsB1 = stateRows(q)
        assert(rowsB1 > 0, "state must hold rows after batch 1")

        // let BOTH users' state expire (ttl 2 s, idle 5 s), then user 1
        // reappears: the fold must RESTART at (1, 1), not continue at
        // (3, 2) — proof the expired value is unreadable
        Thread.sleep(5000)
        writeEvents(srcDir, "batch-1", Seq((4L, 3000000000L, 1L, "a")))
        q.processAllAvailable()
        val afterB2 = spark.table("ttl_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(afterB2.contains((1L, 4L, 1L, 1L)),
          s"expired state must restart the fold at (1,1): $afterB2")
        assert(!afterB2.contains((1L, 4L, 3L, 2L)),
          "user 1's pre-TTL state survived expiry")
        // and the rows really LEFT the store: user 2 (no new input) was
        // cleaned by the TTL sweep, user 1 re-wrote fresh rows — the
        // store must hold no more than batch-1's footprint for one user
        val rowsB2 = stateRows(q)
        assert(rowsB2 < rowsB1,
          s"TTL eviction must shrink the store: batch1=$rowsB1 batch2=$rowsB2")
      } finally {
        q.stop()
        spark.catalog.dropTempView("ttl_stream")
      }
    }
  }

  test("state TTL: live (recently written) state is untouched by the TTL config") {
    withRocksDb {
      val srcDir = java.nio.file.Files.createTempDirectory("graft-ttl-live")
      writeEvents(srcDir, "batch-0", Seq(
        (1L, 1000000000L, 1L, "a"), (2L, 2000000000L, 1L, "b")))
      val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
      // generous TTL: nothing expires within the test
      val q = EventStreamPipeline
        .runningDistinctTtl(stream, java.time.Duration.ofMinutes(10))
        .writeStream.outputMode("append")
        .format("memory").queryName("ttl_live_stream")
        .start()
      try {
        q.processAllAvailable()
        writeEvents(srcDir, "batch-1", Seq((3L, 3000000000L, 1L, "a")))
        q.processAllAvailable()
        val got = spark.table("ttl_live_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        // the cross-batch fold CONTINUES — same semantics as the TTL-less
        // processor when no expiry happens
        assert(got == Set((1L, 1L, 1L, 1L), (1L, 2L, 2L, 2L), (1L, 3L, 3L, 2L)),
          s"live state must fold across batches unchanged: $got")
      } finally {
        q.stop()
        spark.catalog.dropTempView("ttl_live_stream")
      }
    }
  }

  test("state TTL is all-or-nothing per user: steady activity never deflates the distinct count") {
    withRocksDb {
      // a user active every ~3 s under a 6 s TTL, alternating types: the
      // FIRST type's last write ages past the TTL while the user never
      // idles. Per-ENTRY expiry (a MapState-with-TTL histogram) would
      // drop type 'a' while total kept counting — distinct deflating
      // mid-fold; the single-ValueState design anchors expiry on the
      // user's last write, so the fold stays consistent
      val srcDir = java.nio.file.Files.createTempDirectory("graft-ttl-mix")
      writeEvents(srcDir, "batch-0", Seq((1L, 1000000000L, 1L, "a")))
      val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
      // TTL 20 s against 8 s sleeps: a 2.5× margin over the trigger
      // cadence (a 6 s TTL vs 3 s sleeps flaked on a loaded host whose
      // inter-batch gap measured 6.1 s — Spark's TTL is anchored on
      // the LAST state update, so a gap beyond the TTL legitimately
      // expires the state and the test asserts nothing about TTL
      // design anymore)
      val ttlMs = 20000L
      val q = EventStreamPipeline
        .runningDistinctTtl(stream, java.time.Duration.ofMillis(ttlMs))
        .writeStream.outputMode("append")
        .format("memory").queryName("ttl_mix_stream")
        .start()
      try {
        q.processAllAvailable()
        Thread.sleep(8000)
        writeEvents(srcDir, "batch-1", Seq((2L, 2000000000L, 1L, "b")))
        q.processAllAvailable()
        Thread.sleep(8000) // type 'a' is now ~16 s old; user is not idle
        writeEvents(srcDir, "batch-2", Seq((3L, 3000000000L, 1L, "b")))
        q.processAllAvailable()
        // belt and braces: if THIS host still stalled past the TTL
        // between data batches, expiry was legitimate — skip, don't
        // fail (the design claim is only about gaps under the TTL)
        val dataBatchTs = q.recentProgress.toSeq
          .filter(_.numInputRows > 0)
          .map(p => java.time.Instant.parse(p.timestamp).toEpochMilli)
          .sorted
        val maxGap = dataBatchTs.zip(dataBatchTs.drop(1))
          .map { case (a, b) => b - a }.maxOption.getOrElse(0L)
        assume(maxGap < ttlMs,
          s"host stalled ${maxGap}ms between data batches (TTL " +
            s"${ttlMs}ms): expiry is legitimate here, nothing to assert")
        val got = spark.table("ttl_mix_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(got.contains((1L, 3L, 3L, 2L)),
          s"steadily-active user's fold must stay (n=3, distinct=2): $got")
        assert(!got.contains((1L, 3L, 3L, 1L)),
          "distinct count deflated under a live fold — per-entry TTL leak")
      } finally {
        q.stop()
        spark.catalog.dropTempView("ttl_mix_stream")
      }
    }
  }

  test("processing-time timers: idle users are flushed and their state cleared") {
    withRocksDb {
      val srcDir = java.nio.file.Files.createTempDirectory("graft-pt-src")
      writeEvents(srcDir, "batch-0", Seq(
        (1L, 1000000000L, 1L, "a"), (2L, 2000000000L, 1L, "b"),
        (3L, 1500000000L, 2L, "a")))
      val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
      val q = EventStreamPipeline.idleFlush(stream, idleMs = 800L)
        .writeStream.outputMode("append")
        .format("memory").queryName("ptt_stream")
        .start()
      try {
        q.processAllAvailable()
        val b1 = spark.table("ptt_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        assert(b1 == Set((1L, 2L, false), (2L, 1L, false)),
          s"batch 1 must report per-user counts, no flushes yet: $b1")

        // both deadlines (now + 800 ms) pass; the next DATA batch fires
        // the expired timers — flush rows carry the accumulated counts
        Thread.sleep(1500)
        writeEvents(srcDir, "batch-1", Seq((4L, 3000000000L, 3L, "a")))
        q.processAllAvailable()
        val b2 = spark.table("ptt_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        assert(b2.contains((1L, 2L, true)) && b2.contains((2L, 1L, true)),
          s"expired processing-time timers must flush both idle users: $b2")
        assert(b2.contains((3L, 1L, false)), s"user 3's arrival row missing: $b2")

        // the flush CLEARED state: user 1 reappearing restarts at 1, and
        // user 3's own idle flush fires on the same batch
        Thread.sleep(1500)
        writeEvents(srcDir, "batch-2", Seq((5L, 4000000000L, 1L, "a")))
        q.processAllAvailable()
        val b3 = spark.table("ptt_stream")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        assert(b3.contains((3L, 1L, true)),
          s"user 3's idle flush must fire once its deadline passes: $b3")
        assert(b3.contains((1L, 1L, false)),
          s"user 1 must restart from cleared state: $b3")
        assert(!b3.contains((1L, 3L, false)),
          "user 1's flushed state leaked into the new pending count")
      } finally {
        q.stop()
        spark.catalog.dropTempView("ptt_stream")
      }
    }
  }
}
