package graft.streaming

import graft.TestSpark
import graft.pipeline.VersionedTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedCdcMirror]] — the CDC feed as an incremental source with
  * exactly-once downstream maintenance. The frontier lives in the
  * downstream table's OWN manifest (committed atomically with each
  * applied batch), so a crash anywhere between "applied" and the next
  * poll re-delivers the batch and changes nothing. Proven: the mirror
  * equals the source at EVERY version of a full DML history
  * (append/delete/upsert/mor-delete/compact), crash/replay idempotence
  * at both the batch and the poller level, and a maintained per-key
  * aggregate that equals the declarative aggregate at every step with
  * zero-count keys deleted.
  */
class VersionedCdcMirrorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(round: Int, n: Int) =
    spark.range(round.toLong * n, round.toLong * n + n)
      .select(col("id").as("event_id"), (col("id") % 7).as("user_id"),
        (col("id") * 1000L).as("ts_us"))

  private val Stats = Seq("user_id", "ts_us", "event_id")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  private def multisetEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** One full DML history on a fresh source root; returns the root. */
  private def stagedSource(tag: String): String = {
    val root = tmp(tag)
    VersionedTable.append(rows(0, 300), root, Stats)                  // v1
    VersionedTable.append(rows(1, 300), root, Stats)                  // v2
    VersionedTable.deleteRange(spark, root, Seq(("user_id", 0L, 1L))) // v3
    VersionedTable.upsertByKey(spark, root,
      rows(0, 300).filter($"event_id" % 5 === 0)
        .withColumn("user_id", $"user_id" + 100L), Seq("event_id"))   // v4
    VersionedTable.deleteKeysMor(spark, root, "event_id",
      (0L until 600L by 37L).toDF("event_id"))                        // v5
    VersionedTable.compactZorder(spark, root, nFiles = 4)             // v6
    root
  }

  test("the mirror equals the source at EVERY version of a full DML history") {
    val src = tmp("graft-cdcm-src")
    val mirror = tmp("graft-cdcm-mir")
    val cols = Seq($"event_id", $"user_id", $"ts_us")
    def check(v: Long): Unit = {
      val applied = VersionedCdcMirror.syncMirror(spark, src, mirror,
        Seq("event_id"))
      assert(VersionedCdcMirror.frontier(spark, mirror) == v)
      assert(multisetEqual(
        VersionedTable.read(spark, mirror).select(cols: _*),
        VersionedTable.read(spark, src).select(cols: _*)),
        s"mirror diverged after source v$v (applied $applied)")
    }
    VersionedTable.append(rows(0, 300), src, Stats); check(1L)
    VersionedTable.append(rows(1, 300), src, Stats); check(2L)
    VersionedTable.deleteRange(spark, src, Seq(("user_id", 0L, 1L)))
    check(3L)
    VersionedTable.upsertByKey(spark, src,
      rows(0, 300).filter($"event_id" % 5 === 0)
        .withColumn("user_id", $"user_id" + 100L), Seq("event_id"))
    check(4L)
    VersionedTable.deleteKeysMor(spark, src, "event_id",
      (0L until 600L by 37L).toDF("event_id"))
    check(5L)
    VersionedTable.compactZorder(spark, src, nFiles = 4); check(6L)
  }

  test("crash/replay idempotence: a re-delivered batch and a restarted poller both change nothing") {
    val src = stagedSource("graft-cdcm-src2")
    val mirror = tmp("graft-cdcm-mir2")
    // poller run 1: crashes after applying v1..v3 (simulated by only
    // syncing a prefix through direct batch applies)
    (1L to 3L).foreach { v =>
      val ch = VersionedTable.readChangesCdc(spark, src, v - 1, v)
      val data = Seq($"event_id", $"user_id", $"ts_us")
      val (_, applied) = VersionedTable.applyCdcBatch(spark, mirror,
        ch.filter($"_change_type" === "insert").select(data: _*),
        ch.filter($"_change_type" === "delete").select($"event_id")
          .distinct(),
        Seq("event_id"), v)
      assert(applied, s"v$v must apply")
    }
    val snapshotAfter3 = VersionedTable.read(spark, mirror)
      .select($"event_id", $"user_id").collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) =>
          (r.getLong(0), r.getLong(1))))
    // the CRASH REPLAY: v3's batch re-delivered verbatim
    val ch3 = VersionedTable.readChangesCdc(spark, src, 2L, 3L)
    val data = Seq($"event_id", $"user_id", $"ts_us")
    val (v, applied) = VersionedTable.applyCdcBatch(spark, mirror,
      ch3.filter($"_change_type" === "insert").select(data: _*),
      ch3.filter($"_change_type" === "delete").select($"event_id")
        .distinct(),
      Seq("event_id"), 3L)
    assert(!applied, "a replayed batch must be recognized and skipped")
    assert(v == VersionedTable.latestVersion(spark, mirror).get)
    val snapshotReplayed = VersionedTable.read(spark, mirror)
      .select($"event_id", $"user_id").collect().toSeq.sorted(
        Ordering.by((r: org.apache.spark.sql.Row) =>
          (r.getLong(0), r.getLong(1))))
    assert(snapshotReplayed == snapshotAfter3,
      "a replay must change NOTHING — not even publish a version")
    // the RESTARTED poller resumes at the frontier and finishes
    assert(VersionedCdcMirror.frontier(spark, mirror) == 3L)
    val applied2 = VersionedCdcMirror.syncMirror(spark, src, mirror,
      Seq("event_id"))
    assert(applied2 == 3, s"resume must apply exactly v4..v6: $applied2")
    assert(multisetEqual(
      VersionedTable.read(spark, mirror)
        .select($"event_id", $"user_id", $"ts_us"),
      VersionedTable.read(spark, src)
        .select($"event_id", $"user_id", $"ts_us")))
    // and a full re-sync after completion is a no-op
    assert(VersionedCdcMirror.syncMirror(spark, src, mirror,
      Seq("event_id")) == 0)
  }

  test("a maintained per-key aggregate equals the declarative aggregate at every version; zero-count keys are deleted") {
    val src = tmp("graft-cdcm-src3")
    val agg = tmp("graft-cdcm-agg")
    def check(): Unit = {
      VersionedCdcMirror.syncCountSum(spark, src, agg,
        "user_id", "event_id")
      val want = VersionedTable.read(spark, src)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_rows"), sum($"event_id").as("val_sum"))
      assert(multisetEqual(VersionedTable.read(spark, agg)
        .select($"user_id", $"n_rows", $"val_sum"), want),
        "maintained aggregate diverged from the declarative one")
    }
    VersionedTable.append(rows(0, 300), src, Stats); check()
    VersionedTable.append(rows(1, 300), src, Stats); check()
    // delete EVERY row of user_id 0 and 1: their keys must vanish from
    // the aggregate, not linger as zero rows
    VersionedTable.deleteRange(spark, src, Seq(("user_id", 0L, 1L)))
    check()
    assert(VersionedTable.read(spark, agg)
      .filter($"user_id" <= 1L).count() == 0L,
      "zero-count keys must be deleted from the maintained view")
    VersionedTable.upsertByKey(spark, src,
      rows(0, 300).filter($"event_id" % 5 === 0)
        .withColumn("user_id", $"user_id" + 100L), Seq("event_id"))
    check()
    VersionedTable.deleteKeysMor(spark, src, "event_id",
      (0L until 600L by 37L).toDF("event_id"))
    check()
    VersionedTable.compactZorder(spark, src, nFiles = 4)
    check()
  }
}
