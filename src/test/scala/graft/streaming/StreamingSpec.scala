package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The streaming pipeline must produce the same totals as its batch twin
  * when fed the complete input (memory sink + processAllAvailable drives
  * the file stream synchronously).
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly agg equals batch hourly agg on the full input") {
    // file streams want a directory of arriving files, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val dir = streamDir.toString
    val stream = EventStreamPipeline.readEvents(spark, dir)
    val q = EventStreamPipeline.hourlyAgg(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("hourly_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_stream")
        .select($"window_start", $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet

      val batch = EventStreamPipeline.hourlyAgg(
        EventStreamPipeline.readEventsBatch(spark, dir).where($"ts".isNotNull))
        .collect().map(_.toSeq).toSet

      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("append-mode windowed dynamic aggregate emits closed windows and evicts their state") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream-wda")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    graft.adhesive.AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE AGGREGATE FUNCTION wda_spec_sum(BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveAggregate;
        |import org.apache.spark.sql.Row;
        |public class WdaSum extends AdhesiveAggregate {
        |  public Object zero() { return 0L; }
        |  public Object reduce(Object s, Row in) {
        |    return in.isNullAt(0) ? s : (Long) s + in.getLong(0);
        |  }
        |  public Object merge(Object a, Object b) { return (Long) a + (Long) b; }
        |}
        |'""".stripMargin)
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.windowedDynAgg(stream, "wda_spec_sum")
      .writeStream.outputMode("append")
      .format("memory").queryName("wda_stream")
      .start()
    try {
      q.processAllAvailable()
      // batch twin of the same fold, split by the final watermark:
      // wm = floor(max event-time ms) - 1 hour; closed ⟺ end <= wm
      val batchEv = EventStreamPipeline
        .readEventsBatch(spark, streamDir.toString)
      val wmUs = (batchEv.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.expr("ts div 1000 div 1000")))
        .head.getLong(0) - 3600000L) * 1000L
      val allWindows = batchEv
        .selectExpr("(ts div 1000 div 3600000000) * 3600000000 AS ws",
          "event_type",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .groupBy("ws", "event_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      val (closed, open) = allWindows.partition(_._1 + 3600000000L <= wmUs)
      assert(closed.nonEmpty && open.nonEmpty,
        s"fixture must straddle the watermark (closed=${closed.length}, open=${open.length})")
      val emitted = spark.table("wda_stream")
        .selectExpr("unix_micros(window_start)", "event_type", "n", "cents_sum")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      // 1) exactly the closed windows are emitted, with the exact fold
      assert(emitted.toSet == closed.toSet)
      // 2) state retains ONLY the open windows: the emitted groups'
      // rows were evicted from the store at emission
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == open.length,
        s"state holds $stateRows rows; expected only the ${open.length} open windows")
    } finally {
      q.stop()
      spark.catalog.dropTempView("wda_stream")
    }
  }

  test("update-mode dynamic aggregate: per-key emissions are monotone partial folds") {
    // the aq_stream_agg_update entry dedups to the LAST emission per
    // (window, type); this pins what the dedup relies on — across a
    // multi-batch drain each key's successive update-mode emissions carry
    // strictly growing n (so "max n" IS "last"), and the final emission
    // per key equals the batch aggregate
    graft.adhesive.AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE AGGREGATE FUNCTION upd_spec_sum(BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveAggregate;
        |import org.apache.spark.sql.Row;
        |public class UpdSum extends AdhesiveAggregate {
        |  public Object zero() { return 0L; }
        |  public Object reduce(Object s, Row in) {
        |    return in.isNullAt(0) ? s : (Long) s + in.getLong(0);
        |  }
        |  public Object merge(Object a, Object b) { return (Long) a + (Long) b; }
        |}
        |'""".stripMargin)
    // four part files fed one per trigger → a guaranteed multi-batch drain
    val streamDir = java.nio.file.Files.createTempDirectory("graft-upd")
    val tmp = java.nio.file.Files.createTempDirectory("graft-upd-w")
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .repartition(4).write.mode("overwrite").parquet(tmp.toString)
    java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && p.contains("part-"))
      .sorted.zipWithIndex.foreach { case (p, i) =>
        java.nio.file.Files.move(java.nio.file.Paths.get(p),
          streamDir.resolve(f"events-$i%03d.parquet"))
      }
    val emissions = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Long, Long)] // batchId, ws_us, type, n, cents
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString,
      maxFilesPerTrigger = Some(1))
    val q = EventStreamPipeline.windowedDynAgg(stream, "upd_spec_sum", "365 days")
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        val rows = df.selectExpr("unix_micros(window_start)", "event_type",
            "n", "cents_sum")
          .collect()
          .map(r => (id, r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        emissions.synchronized { emissions ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val byKey = emissions.groupBy(e => (e._2, e._3))
      assert(emissions.map(_._1).distinct.size >= 2,
        "drain must span multiple micro-batches or update mode is vacuous")
      // 1) monotone: within a key, later batches carry strictly larger n
      byKey.foreach { case (key, es) =>
        val ordered = es.sortBy(_._1).toVector
        ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
          assert(b._4 > a._4,
            s"$key: emission in batch ${b._1} (n=${b._4}) did not grow " +
              s"over batch ${a._1} (n=${a._4})")
        }
      }
      // 2) the final emission per key IS the batch aggregate
      val last = byKey.map { case (key, es) => key -> {
        val e = es.maxBy(_._1); (e._4, e._5)
      }}
      val batch = EventStreamPipeline
        .readEventsBatch(spark, streamDir.toString)
        .selectExpr("(ts div 1000 div 3600000000) * 3600000000 AS ws",
          "event_type",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .groupBy("ws", "event_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents_sum"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      assert(last == batch,
        s"final update per key must equal the batch fold; " +
          s"missing=${batch.keySet.diff(last.keySet).take(3)} " +
          s"extra=${last.keySet.diff(batch.keySet).take(3)}")
      assert(last.nonEmpty)
    } finally q.stop()
  }

  test("session-window dynamic aggregate emits watermark-closed sessions and evicts their state") {
    graft.adhesive.AdhesiveDdl.execute(spark,
      """CREATE OR REPLACE AGGREGATE FUNCTION sess_spec_sum(BIGINT) RETURNS BIGINT LANGUAGE JAVA AS '
        |import graft.adhesive.AdhesiveAggregate;
        |import org.apache.spark.sql.Row;
        |public class SessSum extends AdhesiveAggregate {
        |  public Object zero() { return 0L; }
        |  public Object reduce(Object s, Row in) {
        |    return in.isNullAt(0) ? s : (Long) s + in.getLong(0);
        |  }
        |  public Object merge(Object a, Object b) { return (Long) a + (Long) b; }
        |}
        |'""".stripMargin)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sda")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.sessionDynAgg(stream, "sess_spec_sum")
      .writeStream.outputMode("append")
      .format("memory").queryName("sda_stream")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("sda_stream")
        .select($"user_id", $"session_start_ms", $"n_events", $"cents_sum")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // batch twin: lag-flag-cumsum sessions + cents fold, closed ⟺
      // last_ms + gap <= floor(max event-time ms)
      val batchEv = EventStreamPipeline
        .readEventsBatch(spark, streamDir.toString)
      val wm = batchEv.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.expr("ts div 1000 div 1000")))
        .head.getLong(0)
      import org.apache.spark.sql.expressions.Window
      val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      val sessions = batchEv
        .selectExpr("user_id", "event_id", "ts div 1000000 AS ts_ms",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .withColumn("new_session",
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime).isNull ||
              $"ts_ms" - org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime) > 1800000L,
            1L).otherwise(0L))
        .withColumn("session_id", org.apache.spark.sql.functions.sum($"new_session")
          .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(org.apache.spark.sql.functions.min($"ts_ms").as("start_ms"),
          org.apache.spark.sql.functions.max($"ts_ms").as("last_ms"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      val (closed, open) =
        sessions.partition { case (_, _, last, _, _) => last + 1800000L <= wm }
      assert(got == closed.map { case (u, st, _, n, c) => (u, st, n, c) }.toSet)
      assert(open.nonEmpty, "fixture should leave some sessions open")
      assert(got.nonEmpty)
      // eviction: emitted sessions' state rows left the store — only the
      // watermark-open sessions remain
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows == open.length,
        s"state holds $stateRows rows; expected only ${open.length} open sessions")
    } finally {
      q.stop()
      spark.catalog.dropTempView("sda_stream")
    }
  }

  test("drainEvents-backed entries accept a directory-shaped events.parquet table") {
    // the driver's testdata ships events.parquet as ONE file; any real
    // writer produces a DIRECTORY of part files — the streaming entries
    // must feed every part to the stream, not silently copy one
    val d = java.nio.file.Files.createTempDirectory("graft-evdir").toString
    spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .repartition(3).write.parquet(s"$d/events.parquet")
    val got = graft.operators.EventWindows.streamDynamicAgg
      .build(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.sum($"cents").as("cents_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("event-time timers close idle sessions and evict their state") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamDir = java.nio.file.Files.createTempDirectory("graft-twst")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve("events-000.parquet"))
      val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
      val q = EventStreamPipeline.sessionizeTimers(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("twst_sessions")
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("twst_sessions")
          .select($"user_id", $"session_start_ms", $"n_events")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // batch twin: ALL sessions; emitted ⟺ last activity + gap <= wm
        val batchEv = EventStreamPipeline
          .readEventsBatch(spark, streamDir.toString)
        val wm = batchEv
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.expr("ts div 1000 div 1000")))
          .head.getLong(0)
        import org.apache.spark.sql.expressions.Window
        val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
        val sessions = batchEv
          .selectExpr("user_id", "event_id", "ts div 1000000 AS ts_ms")
          .withColumn("new_session",
            org.apache.spark.sql.functions.when(
              org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime).isNull ||
                $"ts_ms" - org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime) > 1800000L,
              1L).otherwise(0L))
          .withColumn("session_id", org.apache.spark.sql.functions.sum($"new_session")
            .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(org.apache.spark.sql.functions.min($"ts_ms").as("start_ms"),
            org.apache.spark.sql.functions.max($"ts_ms").as("last_ms"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
        val (closedByWm, stillOpen) =
          sessions.partition { case (_, _, last, _) => last + 1800000L <= wm }
        assert(got == closedByWm.map { case (u, st, _, n) => (u, st, n) }.toSet)
        assert(stillOpen.nonEmpty, "fixture should leave some sessions open")
        // the timer path must emit MORE than the closed-by-gap-only twin:
        // each user's final session that idles past the watermark now lands
        val closedByGapOnly = sessions.groupBy(_._1).values.flatMap { ss =>
          ss.sortBy(_._2).dropRight(1) // all but the user's last session
        }.toSet
        assert(closedByWm.toSet.size > closedByGapOnly.size,
          "timers should close idle tails the gap rule never could")
        // state eviction: only the still-open sessions' value rows remain
        val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(stateRows == stillOpen.length,
          s"state holds $stateRows rows; expected ${stillOpen.length} open sessions")
      } finally {
        q.stop()
        spark.catalog.dropTempView("twst_sessions")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("timer sessions across TWO micro-batches: re-armed deadlines supersede old timers") {
    // the deleteTimer-on-re-arm path only runs when a session EXTENDS
    // across batches — a single-file drain never exercises it. Split the
    // corpus at the time median (no late data), drain file 1, then file
    // 2: sessions spanning the split re-arm their deadline in batch 2,
    // and the final output must still be exactly the watermark predicate.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val batchEv = EventStreamPipeline
        .readEventsBatch(spark, s"${TestSpark.sfDir}/events.parquet")
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
        .cache()
      val median = batchEv.stat.approxQuantile("ts", Array(0.5), 0.0)(0).toLong
      val streamDir = java.nio.file.Files.createTempDirectory("graft-twst2")
      def writeHalf(cond: org.apache.spark.sql.Column, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory(s"graft-twst2-$name")
        batchEv.filter(cond).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
        java.nio.file.Files.move(java.nio.file.Paths.get(part),
          streamDir.resolve(s"$name.parquet"))
      }
      writeHalf($"ts" < median, "half-0")
      val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
      val q = EventStreamPipeline.sessionizeTimers(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("twst2_sessions")
        .start()
      try {
        q.processAllAvailable() // batch 1: first half only
        writeHalf($"ts" >= median, "half-1")
        q.processAllAvailable() // batch 2: sessions extend, timers re-arm
        val got = spark.table("twst2_sessions")
          .select($"user_id", $"session_start_ms", $"n_events")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // same expected set as the single-batch drain: batch boundaries
        // must not change WHICH sessions the watermark proves closed
        val wm = batchEv.agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.expr("ts div 1000 div 1000")))
          .head.getLong(0)
        import org.apache.spark.sql.expressions.Window
        val byTime = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
        val expected = batchEv
          .selectExpr("user_id", "event_id", "ts div 1000000 AS ts_ms")
          .withColumn("new_session",
            org.apache.spark.sql.functions.when(
              org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime).isNull ||
                $"ts_ms" - org.apache.spark.sql.functions.lag($"ts_ms", 1).over(byTime) > 1800000L,
              1L).otherwise(0L))
          .withColumn("session_id", org.apache.spark.sql.functions.sum($"new_session")
            .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(org.apache.spark.sql.functions.min($"ts_ms").as("start_ms"),
            org.apache.spark.sql.functions.max($"ts_ms").as("last_ms"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
          .filter($"last_ms" + 1800000L <= wm)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
        assert(got == expected,
          s"missing=${expected.diff(got).take(3)} extra=${got.diff(expected).take(3)}")
        assert(got.nonEmpty)
      } finally {
        q.stop()
        spark.catalog.dropTempView("twst2_sessions")
        batchEv.unpersist()
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("MapState running count-distinct equals a driver-side fold of the same order") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamDir = java.nio.file.Files.createTempDirectory("graft-rdist")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve("events-000.parquet"))
      val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
      val q = EventStreamPipeline.runningDistinct(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("rdist_stream")
        .start()
      try {
        q.processAllAvailable()
        val got = spark.table("rdist_stream")
          .select($"user_id", $"event_id", $"n_events", $"n_distinct_types")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
          .toMap
        // reference: an independent driver-side fold in (ts, event_id)
        // order per user — no shared code with the processor
        val events = EventStreamPipeline
          .readEventsBatch(spark, streamDir.toString)
          .selectExpr("user_id", "event_id", "ts div 1000000 AS ts_ms",
            "event_type")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        val expected = events.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
          var n = 0L
          val seen = scala.collection.mutable.Set[String]()
          es.sortBy(e => (e._3, e._2)).toSeq.map { e =>
            n += 1; seen += e._4
            (uid, e._2) -> (n, seen.size.toLong)
          }
        }.toMap
        assert(got.size == events.length)
        assert(got == expected)
      } finally {
        q.stop()
        spark.catalog.dropTempView("rdist_stream")
      }
    } finally {
      saved match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }

  test("a late event inside the gap must not rewind the open session's clock") {
    import EventStreamPipeline.{Event, foldSessions}
    // batch 1: two events, one open session ending at t=1,700,000
    val (o1, c1) = foldSessions(7L, None,
      Seq(Event(1, 0L, 7L), Event(2, 1700000L, 7L)))
    assert(c1.isEmpty && o1.get.lastMs == 1700000L && o1.get.n == 2)
    // batch 2: a LATE event at t=100,000 — merges (within gap of the
    // open session), but must not regress lastMs to 100,000
    val (o2, c2) = foldSessions(7L, o1, Seq(Event(3, 100000L, 7L)))
    assert(c2.isEmpty && o2.get.n == 3)
    assert(o2.get.lastMs == 1700000L,
      s"late merge rewound the session clock to ${o2.get.lastMs}")
    // batch 3: an on-time event at t=2,000,000 is 300,000 past the true
    // last activity — same session; a rewound clock would have seen a
    // 1,900,000 gap and spuriously split (diverging from the batch twin)
    val (o3, c3) = foldSessions(7L, o2, Seq(Event(4, 2000000L, 7L)))
    assert(c3.isEmpty, s"session spuriously split: $c3")
    assert(o3.get.n == 4 && o3.get.lastMs == 2000000L)
  }

  test("stream on an empty source dir starts and picks up files that arrive later") {
    // the physical-ts probe reads the dir at setup; with no files yet it
    // must fall back to the ns-long contract schema instead of throwing
    // "Unable to infer schema" — starting before data arrives is the
    // normal state of a file stream
    val streamDir = java.nio.file.Files.createTempDirectory("graft-empty")
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.hourlyAgg(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("empty_start_stream")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("empty_start_stream").isEmpty)
      // first file arrives after the stream started
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve("events-000.parquet"))
      q.processAllAvailable()
      // VALUES must be right, not just present: the empty-dir fallback
      // schema must read the late-arriving files with correct time units
      // (a long-schema read of timestamp-µs files would yield windows
      // 1000× off while still passing a count check)
      val streamed = spark.table("empty_start_stream")
        .select($"window_start", $"event_type", $"n", $"total_value")
        .collect().map(_.toSeq).toSet
      val batch = EventStreamPipeline.hourlyAgg(
        EventStreamPipeline.readEventsBatch(spark, streamDir.toString)
          .where($"ts".isNotNull))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch,
        "late-arriving files read with wrong units through the fallback schema")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join: streaming events enriched with a batch dimension") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ss")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    // static dimension computed in batch: each user's modal event type bucket
    val staticDim = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.count($"event_id").as("lifetime_events"))
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
      .join(staticDim, "user_id") // stream-static equi join
      .groupBy($"lifetime_events")
      .agg(org.apache.spark.sql.functions.count($"event_id").as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ss_join").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_join").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // every event joins its user's lifetime count, so each group's n
      // equals lifetime_events * (#users with that count)
      val expected = staticDim.groupBy($"lifetime_events")
        .agg(org.apache.spark.sql.functions.count($"user_id").as("nu"))
        .collect()
        .map(r => r.getLong(0) -> r.getLong(0) * r.getLong(1)).toMap
      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization: closed stream sessions = batch sessions minus open tails") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sess")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.sessionize(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("sessions_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_stream")
        .select($"user_id", $"session_start_ms", $"n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

      // Batch twin over the same data; the stream never closes each user's
      // final session (it stays in state), so drop the last session per user.
      val batchAll = graft.operators.EventWindows.sessionize
        .build(spark, TestSpark.sfDir)
        .select($"user_id", $"session_start_ms", $"n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
      val expected = batchAll.toSet -- lastPerUser

      assert(streamed == expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream interval join equals its batch twin on the full input") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.signupPurchaseJoin(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("ssj_stream")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_stream").collect()
        .map(_.toSeq).toSet
      val batch = EventStreamPipeline.signupPurchaseJoin(
        EventStreamPipeline.readEventsBatch(spark, streamDir.toString))
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("transformWithState sessionization matches the flatMapGroupsWithState twin") {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val streamDir = java.nio.file.Files.createTempDirectory("graft-tws")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve("events-000.parquet"))
      val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
      val q = EventStreamPipeline.sessionizeTws(stream)
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName("tws_sessions")
        .start()
      try {
        q.processAllAvailable()
        val tws = spark.table("tws_sessions")
          .select($"user_id", $"session_start_ms", $"n_events")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        // same closed-session semantics as the older state API: batch
        // sessions minus each user's never-closed tail
        val batchAll = graft.operators.EventWindows.sessionize
          .build(spark, TestSpark.sfDir)
          .select($"user_id", $"session_start_ms", $"n_events")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val lastPerUser = batchAll.groupBy(_._1).view.mapValues(_.maxBy(_._2)).values.toSet
        assert(tws == batchAll.toSet -- lastPerUser)
        assert(tws.nonEmpty)
      } finally q.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None    => spark.conf.unset(providerKey)
    }
  }

  test("foreachBatch + AvailableNow upsert converges to the batch totals and stops") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-upsert")
    // two arriving files: the upsert must merge across micro-batches
    for (i <- 0 to 1)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve(s"events-00$i.parquet"))
    val target = java.nio.file.Files.createTempDirectory("graft-upsert-t")
      .resolve("totals").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-upsert-c").toString

    // AvailableNow + awaitTermination: returns only once the backlog drains
    EventStreamPipeline.upsertTypeTotals(
      spark, streamDir.toString, target, ckpt)

    val served = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val expected = spark.read.parquet(streamDir.toString)
      .groupBy($"event_type")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"value".cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("total_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(served == expected)
    assert(served.nonEmpty)

    // restart with the same checkpoint: nothing new to process, totals stable
    EventStreamPipeline.upsertTypeTotals(
      spark, streamDir.toString, target, ckpt)
    val after = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(after == served)
  }

  test("streaming anomaly monitor converges to the batch ev_anomaly flags") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-anom")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val dailyDir = java.nio.file.Files.createTempDirectory("graft-anom-d")
      .resolve("daily").toString
    val flagsDir = java.nio.file.Files.createTempDirectory("graft-anom-f")
      .resolve("flags").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-anom-c").toString

    EventStreamPipeline.anomalyMonitor(
      spark, streamDir.toString, dailyDir, flagsDir, ckpt)

    val flags = spark.read.parquet(flagsDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.operators.EventWindows.anomaly
      .build(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(flags == batch,
      s"monitor flags != batch flags: ${flags.diff(batch)} / ${batch.diff(flags)}")
    assert(flags.nonEmpty)

    // a second identical delivery re-counts every key; flags must update
    // (counts double uniformly, so the z-test flags the SAME days)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-001.parquet"))
    EventStreamPipeline.anomalyMonitor(
      spark, streamDir.toString, dailyDir, flagsDir, ckpt)
    val after = spark.read.parquet(flagsDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after.map(t => (t._1, t._2)) == flags.map(t => (t._1, t._2)),
      "doubling every count must flag the same (type, day) set")
    assert(after.forall(t => flags.contains((t._1, t._2, t._3 / 2))))
  }

  test("streaming dedup collapses duplicate deliveries to one row per event_id") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup")
    // simulate at-least-once delivery: the same file arrives twice
    for (i <- 0 to 1)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
        streamDir.resolve(s"events-00$i.parquet"))
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.dedup(stream)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("dedup_stream")
      .start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select($"event_id")
        .collect().map(_.getLong(0))
      assert(ids.length === ids.distinct.length, "duplicates survived")
      val expected = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
        .select($"event_id").distinct().count()
      assert(ids.length === expected)
    } finally q.stop()
  }

  test("snapshot swap recovers from a crash between the two renames") {
    import org.apache.hadoop.fs.Path
    // build a snapshot, then simulate the two loss windows the swap has:
    // target retired but staging not yet promoted (survivor = .old with a
    // stale copy, or .staging with the complete new copy). The next batch
    // must promote the survivor instead of rebuilding from its own rows.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-crash")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val target = java.nio.file.Files.createTempDirectory("graft-crash-t")
      .resolve("totals").toString
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft-crash-c").toString
    EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt1)
    val healthy = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(healthy.nonEmpty)

    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // window A: crash after rename(target, .old), before rename(.staging,
    // target) — only .old survives (staging was consumed or incomplete)
    assert(fs.rename(new Path(target), new Path(target + ".old")))
    assert(!fs.exists(new Path(target)))
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-crash-c2").toString
    EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt2)
    val recovered = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    // the fresh checkpoint re-delivered the same full aggregates, so the
    // idempotent remerge over the promoted survivor converges to healthy
    assert(recovered == healthy, "recovery from .old lost merged keys")
    assert(!fs.exists(new Path(target + ".old")), "retired copy not cleaned up")

    // window B: crash when .staging was completely written (_SUCCESS
    // present) but target was already retired — staging is the freshest
    // complete snapshot and must win over .old
    assert(fs.rename(new Path(target), new Path(target + ".staging")))
    fs.mkdirs(new Path(target + ".old")) // stale leftover decoy
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft-crash-c3").toString
    EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt3)
    val recovered2 = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(recovered2 == healthy, "recovery from .staging lost merged keys")
  }

  test("fault-injected crash on the promote rename replays to the batch aggregate") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    // Unlike the hand-constructed windows above, this drives a REAL batch
    // into the crash: a faulty filesystem fails the promote rename of the
    // two-rename swap mid-run, leaving whatever state the production code
    // actually leaves, and the replay must converge to the batch twin.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.faulty.impl", classOf[FaultyRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])

    val streamDir = java.nio.file.Files.createTempDirectory("graft-fault")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val localTarget = java.nio.file.Files
      .createTempDirectory("graft-fault-t").resolve("totals").toString
    val target = s"faulty://$localTarget"

    // healthy first pass so the crash window has a target to retire
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft-fault-c1").toString
    EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt1)
    val fs = new Path(target).getFileSystem(hconf)
    assert(fs.exists(new Path(target)))

    // second pass with the fault armed: the merge retires the target,
    // then the promote rename fails — the query dies mid-swap
    FaultyRenameFs.failNextPromote.set(true)
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-fault-c2").toString
    val crash = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt2)
    }
    assert(!FaultyRenameFs.failNextPromote.get(), "fault must have fired")
    assert(crash.getCause.getMessage.contains("rename"),
      s"expected the checked-rename failure, got: ${crash.getCause}")
    // the real mid-swap state: no target, retired .old, complete .staging
    assert(!fs.exists(new Path(target)), "crash must land between the renames")
    assert(fs.exists(new Path(target + ".old")))
    assert(fs.exists(new Path(target + ".staging", "_SUCCESS")),
      "staging must be a complete write at the crash point")

    // replay: recovery promotes the survivor, the re-delivered batch
    // re-merges idempotently, and the snapshot equals the BATCH aggregate
    val ckpt3 = java.nio.file.Files.createTempDirectory("graft-fault-c3").toString
    EventStreamPipeline.upsertTypeTotals(spark, streamDir.toString, target, ckpt3)
    val recovered = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    val batchTwin = spark.read.parquet(streamDir.toString)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(DecimalType(18, 2))).cast(DecimalType(38, 2))
          .as("total_value"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
    assert(recovered == batchTwin,
      "post-crash replay must converge to the batch aggregate")
    assert(!fs.exists(new Path(target + ".old")) &&
      !fs.exists(new Path(target + ".staging")),
      "recovery must leave no orphan snapshot directories")
  }

  test("chained dedup+window agg runs two stateful operators in one query") {
    // ev_stream_dedup_window's oracle checks the VALUES; this pins the
    // structure the entry's scaladoc claims — one streaming query, two
    // stateful operators (dropDuplicatesWithinWatermark feeding a
    // windowed aggregate), the duplicate delivery collapsed before the
    // fold rather than double-counted by it.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-chain")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-000.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      streamDir.resolve("events-001.parquet")) // at-least-once redelivery
    val stream = EventStreamPipeline.readEvents(spark, streamDir.toString)
    val q = EventStreamPipeline.dedupThenHourlyAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("chain_stream")
      .start()
    try {
      q.processAllAvailable()
      val ops = q.lastProgress.stateOperators
      assert(ops.length == 2,
        s"expected dedup + aggregate state operators, got ${ops.map(_.operatorName).mkString(",")}")
      assert(ops.exists(_.operatorName.toLowerCase.contains("dedupe")),
        s"no dedup operator among ${ops.map(_.operatorName).mkString(",")}")
      // the fold saw each event ONCE: totals equal the single-copy batch
      // aggregate restricted to watermark-closed windows
      val batchEv = EventStreamPipeline.readEventsBatch(spark,
        s"${TestSpark.sfDir}/events.parquet")
      val wmUs = (batchEv.agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.expr("ts div 1000 div 1000")))
        .head.getLong(0) - 3600000L) * 1000L
      val closed = batchEv
        .selectExpr("(ts div 1000 div 3600000000) * 3600000000 AS ws",
          "event_type",
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents")
        .groupBy("ws", "event_type")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"cents").as("cents_sum"))
        .where(org.apache.spark.sql.functions.col("ws") + 3600000000L <= wmUs)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      val emitted = spark.table("chain_stream")
        .selectExpr("unix_micros(window_start)", "event_type", "n", "cents_sum")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(emitted == closed,
        s"chained result diverges from single-copy closed-window batch twin " +
          s"(emitted=${emitted.size}, expected=${closed.size})")
    } finally {
      q.stop()
      spark.catalog.dropTempView("chain_stream")
    }
  }

  test("stream-stream join state is evicted once the watermark clears the interval") {
    // ev_stream_join is hash-oracled for its OUTPUT; this pins the state
    // bound its scaladoc claims: the interval condition (purchase within
    // 7 days of signup, both sides 1 h watermark delay) lets Spark derive
    // per-side state watermarks, so rows the watermark can prove
    // unmatched-forever LEAVE the store — bounded state on an unbounded
    // stream. Fixture: batch 0 buffers three rows (two signups, one
    // purchase); batch 1 arrives 30 days later, so after its
    // watermark-advancing cleanup batch every batch-0 row is evictable
    // (signups: wm_right - 7 d passes t0; purchase: wm_left passes
    // t0 + 1 d) while both batch-1 rows stay (their own horizon is 1 h
    // behind them). Store shrinks even though batch 1 ADDED two rows.
    val day = 86400000000000L // ns
    val t0 = 10 * day
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ssjoin-src")
    def writeBatch(name: String, rows: Seq[(Long, Long, Long, String)]): Unit =
      TestSpark.writeEventsFile(srcDir, name, rows)
    writeBatch("batch-0", Seq(
      (1L, t0, 1L, "signup"), (2L, t0 + day, 1L, "purchase"),
      (3L, t0, 2L, "signup")))
    val stream = EventStreamPipeline.readEvents(spark, srcDir.toString)
    val q = EventStreamPipeline.signupPurchaseJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_stream")
      .start()
    try {
      q.processAllAvailable()
      val m0 = spark.table("ssjoin_stream").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
      assert(m0.map(_._1).toSeq == Seq(1L),
        s"batch 0 must emit exactly user 1's in-interval match: ${m0.toSeq}")
      val s0 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(s0 > 0, "join state must buffer batch-0 rows")

      val T = t0 + 30 * day
      writeBatch("batch-1", Seq(
        (4L, T, 3L, "signup"), (5L, T + 60000000000L, 3L, "purchase")))
      q.processAllAvailable() // incl. the watermark-advancing cleanup batch
      val matched = spark.table("ssjoin_stream").collect().map(_.getLong(0))
      assert(matched.sorted.toSeq == Seq(1L, 3L),
        s"batch 1 must add exactly user 3's match: ${matched.toSeq}")
      val s1 = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // 3 buffered rows shrank while 2 arrived: >= 3 evictions happened
      assert(s1 < s0,
        s"watermark must evict batch-0 join state: before=$s0 after=$s1")
      // and the bound is exact: 3 retained-rows' worth became 2's worth
      assert(s0 % 3 == 0 && s1 == (s0 / 3) * 2,
        s"state must hold exactly the 2 watermark-retained rows " +
          s"(per-row metric ${s0 / 3}): before=$s0 after=$s1")
    } finally {
      q.stop()
      spark.catalog.dropTempView("ssjoin_stream")
    }
  }
}
