package graft.streaming

import graft.TestSpark
import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The versioned table's CDC feed as a REAL `readStream` source
  * ([[VersionedCdcStreamProvider]]) — offsets are table versions,
  * batches are deterministic `readChangesCdc` ranges, so stateful
  * operators and watermarks compose downstream with exactly-once
  * semantics across restarts: the capability the poll-only
  * [[VersionedCdcMirror]] could not give.
  */
class VersionedCdcStreamSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val fmt = classOf[VersionedCdcStreamProvider].getName

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  private def stream(root: String, opts: (String, String)*) =
    opts.foldLeft(spark.readStream.format(fmt).option("root", root)) {
      case (r, (k, v)) => r.option(k, v)
    }.load()

  test("the stream serves the whole CDC feed exactly as readChangesCdc") {
    val root = tmp("graft-cdcstream-all")
    VersionedTable.append(
      spark.range(0, 1000).select($"id".as("k"), ($"id" % 5).as("grp"),
        ($"id" * 2).as("v")),
      root, Seq("k", "v"))
    VersionedTable.deleteRange(spark, root, Seq(("k", 0L, 99L)))
    VersionedTable.upsertByKey(spark, root,
      spark.range(100, 120).select($"id".as("k"), ($"id" % 5).as("grp"),
        lit(-1L).as("v")),
      Seq("k"))
    val q = stream(root)
      .writeStream.format("memory").queryName("cdc_all")
      .outputMode("append").start()
    try { q.processAllAvailable() } finally q.stop()
    val got = spark.table("cdc_all")
    val latest = VersionedTable.latestVersion(spark, root).get
    val want = VersionedTable.readChangesCdc(spark, root, 0L, latest)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed feed must equal the batch CDC read as a multiset")
    // startingVersion: changes strictly after v1 only (no initial load)
    val q2 = stream(root, "startingVersion" -> "1")
      .writeStream.format("memory").queryName("cdc_tail")
      .outputMode("append").start()
    try { q2.processAllAvailable() } finally q2.stop()
    val tail = spark.table("cdc_tail")
    val wantTail = VersionedTable.readChangesCdc(spark, root, 1L, latest)
    assert(tail.count() == wantTail.count())
    assert(tail.filter($"_commit_version" === 1L).count() == 0L)
  }

  test("stateful aggregate across a mid-stream restart: state preserved, versions exactly-once") {
    val root = tmp("graft-cdcstream-restart")
    val ckpt = tmp("graft-cdcstream-ckpt")
    VersionedTable.append(
      spark.range(0, 500).select($"id".as("k"), ($"id" % 5).as("grp"),
        $"id".as("v")),
      root, Seq("k", "v"))
    // net row count per group, maintained from the feed: insert +1,
    // delete -1 — the mirror-by-aggregation shape
    def start(qname: String) = stream(root)
      .groupBy($"grp")
      .agg(sum(when($"_change_type" === "insert", 1L)
        .otherwise(-1L)).as("net"))
      .writeStream.format("memory").queryName(qname)
      .outputMode("complete")
      .option("checkpointLocation", ckpt).start()
    val q1 = start("cdc_net_1")
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.table("cdc_net_1").collect()
      .forall(_.getLong(1) == 100L), "v1: 100 rows per group")
    // DML while the stream is DOWN: a box delete, an upsert replacing
    // 10 keys (net 0) and inserting 5 new ones
    VersionedTable.deleteRange(spark, root, Seq(("k", 0L, 99L)))
    VersionedTable.upsertByKey(spark, root,
      spark.range(100, 110).unionAll(spark.range(1000, 1005))
        .select($"id".as("k"), ($"id" % 5).as("grp"), lit(-7L).as("v")),
      Seq("k"))
    // restart from the SAME checkpoint: only the new versions replay,
    // the aggregate state carries — double-counting v1 (a broken
    // offset contract) or losing state would both break the mirror
    val q2 = start("cdc_net_2")
    try { q2.processAllAvailable() } finally q2.stop()
    val net = spark.table("cdc_net_2").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mirror = VersionedTable.read(spark, root)
      .groupBy($"grp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(net == mirror,
      s"net-from-stream $net must equal the table's own counts $mirror")
  }

  test("watermarks and windowed aggregates compose downstream of the feed") {
    val root = tmp("graft-cdcstream-window")
    val ckpt = tmp("graft-cdcstream-wckpt")
    // hour-0 batch
    VersionedTable.append(
      spark.range(0, 100).select($"id".as("k"),
        timestamp_micros($"id" * 1000000L).as("ts")),
      root, Seq("k"))
    val q = stream(root)
      .filter($"_change_type" === "insert")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour")).count()
      .writeStream.format("memory").queryName("cdc_win")
      .outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      // append-mode windows finalize only once the watermark passes:
      // nothing emitted yet
      assert(spark.table("cdc_win").isEmpty)
      // hour-2 batch pushes the watermark past hour 0
      VersionedTable.append(
        spark.range(0, 10).select(($"id" + 100000).as("k"),
          timestamp_micros(($"id" + 7200) * 1000000L).as("ts")),
        root, Seq("k"))
      q.processAllAvailable()
    } finally q.stop()
    val wins = spark.table("cdc_win")
      .select($"window.start".cast("long"), $"count").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wins == Map(0L -> 100L),
      s"hour-0 window must finalize with 100 inserts, got $wins")
  }
}
