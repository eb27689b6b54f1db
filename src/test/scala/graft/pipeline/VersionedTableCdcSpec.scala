package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedTable.readChangesCdc]] — full row-level change-data
  * capture from MANIFEST DIFFS alone (no change log is ever written):
  * every version's changes as (row, `_change_type` insert/delete,
  * `_commit_version`), with the Delta/Iceberg CDC contract proven the
  * only way that matters — a polling consumer that applies each
  * version's delete-then-insert batch to its mirror reproduces
  * `readVersion` EXACTLY at every step, across append, delete, upsert
  * (the MERGE decomposition: old self out, new self in), and
  * compaction (a pure rewrite — zero change rows).
  */
class VersionedTableCdcSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(round: Int, n: Int) =
    spark.range(round.toLong * n, round.toLong * n + n)
      .select(col("id").as("event_id"), (col("id") % 97).as("user_id"),
        (col("id") * 1000L).as("ts_us"))

  private val Stats = Seq("user_id", "ts_us", "event_id")

  private val CdcCols = Set("_change_type", "_commit_version")

  /** One polling step: mirror' = (mirror \ deletes) ∪ inserts, multiset
    * semantics, aligned to the batch's (evolved) schema — exactly what
    * an incremental consumer does with a CDC feed.
    */
  private def applyCdc(mirror: DataFrame, batch: DataFrame): DataFrame = {
    val cols = batch.columns.filterNot(CdcCols)
    val ins = batch.filter($"_change_type" === "insert")
      .select(cols.map(col).toSeq: _*)
    val del = batch.filter($"_change_type" === "delete")
      .select(cols.map(col).toSeq: _*)
    if (mirror == null) {
      assert(del.isEmpty, "first batch of a fresh table cannot delete")
      return ins
    }
    val aligned = cols.foldLeft(mirror) { (d, c) =>
      if (d.columns.contains(c)) d
      else d.withColumn(c, lit(null).cast(batch.schema(c).dataType))
    }.select(cols.map(col).toSeq: _*)
    aligned.exceptAll(del).unionAll(ins)
  }

  private def assertSameRows(a: DataFrame, b: DataFrame, msg: String): Unit = {
    val cols = a.columns.sorted.map(col).toSeq
    val x = a.select(cols: _*); val y = b.select(cols: _*)
    assert(x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty, msg)
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  test("a polling mirror equals readVersion at EVERY version across append/delete/upsert/compact/delete") {
    val root = tmp("graft-vt-cdc")
    VersionedTable.append(rows(0, 400), root, Stats)           // v1
    VersionedTable.append(rows(1, 400), root, Stats)           // v2
    val (v3, d3) =
      VersionedTable.deleteRange(spark, root, Seq(("user_id", 10L, 30L)))
    assert(v3 == 3L && d3 > 0)
    val updates = Seq(
      (5L, 500000L, 5000L),        // existing key (user 5, outside box)
      (100000L, 500001L, 1L),      // fresh key
      (100001L, 500002L, 2L))      // fresh key
      .toDF("event_id", "user_id", "ts_us")
    val (v4, replaced) =
      VersionedTable.upsertByKey(spark, root, updates, Seq("event_id"))
    assert(v4 == 4L && replaced == 1L,
      s"exactly the one existing key is replaced, got $replaced")
    val v5 = VersionedTable.compactZorder(spark, root, nFiles = 8)
    assert(v5 == 5L)
    val (v6, d6) =
      VersionedTable.deleteRange(spark, root, Seq(("event_id", 100000L, 100001L)))
    assert(v6 == 6L && d6 == 2L)

    var mirror: DataFrame = null
    VersionedTable.versions(spark, root).foreach { v =>
      val batch = VersionedTable.readChangesCdc(spark, root, v - 1, v)
      mirror = applyCdc(mirror, batch)
      assertSameRows(mirror, VersionedTable.readVersion(spark, root, v),
        s"CDC mirror diverged from the table at version $v")
    }
  }

  test("per-version change content is exact: MERGE decomposition, compaction silence, full-range replay") {
    val root = tmp("graft-vt-cdc2")
    VersionedTable.append(rows(0, 400), root, Stats)                  // v1
    VersionedTable.deleteRange(spark, root, Seq(("user_id", 10L, 30L))) // v2
    val updates = Seq(
      (5L, 500000L, 5000L), (100000L, 500001L, 1L))
      .toDF("event_id", "user_id", "ts_us")
    VersionedTable.upsertByKey(spark, root, updates, Seq("event_id"))   // v3
    VersionedTable.compactZorder(spark, root, nFiles = 8)               // v4

    // v2: deletes are exactly the in-box rows, no inserts
    val b2 = VersionedTable.readChangesCdc(spark, root, 1, 2)
    assert(b2.filter($"_change_type" === "insert").isEmpty)
    val gone = b2.filter($"_change_type" === "delete")
      .select($"event_id").as[Long].collect().toSet
    val expectGone = (0L until 400L).filter(id =>
      id % 97 >= 10 && id % 97 <= 30).toSet
    assert(gone == expectGone, "v2 delete events are not exact")

    // v3: the replaced key's OLD self out, both update rows in
    val b3 = VersionedTable.readChangesCdc(spark, root, 2, 3)
    val dels3 = b3.filter($"_change_type" === "delete")
      .select($"event_id", $"user_id", $"ts_us")
      .as[(Long, Long, Long)].collect().toSeq
    assert(dels3 == Seq((5L, 5L, 5000L)),
      s"upsert must emit the old self of the replaced key, got $dels3")
    val ins3 = b3.filter($"_change_type" === "insert")
      .select($"event_id", $"user_id", $"ts_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(ins3 == Set((5L, 500000L, 5000L), (100000L, 500001L, 1L)))

    // v4 (compaction): a pure rewrite — ZERO change rows
    assert(VersionedTable.readChangesCdc(spark, root, 3, 4).isEmpty,
      "compaction must contribute no CDC rows")

    // full-range replay from empty reproduces the latest table
    val full = VersionedTable.readChangesCdc(spark, root, 0, 4)
    var mirror: DataFrame = null
    (1L to 4L).foreach { v =>
      val batch = full.filter($"_commit_version" === v)
      if (!batch.isEmpty) mirror = applyCdc(mirror, batch)
    }
    assertSameRows(mirror, VersionedTable.read(spark, root),
      "full-range CDC replay diverged from the table")
    // version attribution is complete: every change row names a version
    assert(full.filter($"_commit_version".isNull ||
      $"_change_type".isNull).isEmpty)
  }

  test("schema evolution inside the range: earlier versions null-fill toV's added columns; mirror still exact") {
    val root = tmp("graft-vt-cdc3")
    VersionedTable.append(rows(0, 50), root, Stats)                   // v1
    VersionedTable.append(                                            // v2
      rows(1, 50).withColumn("lang", concat(lit("l"), $"event_id" % 3)),
      root, Stats)
    val updates = Seq((5L, 500000L, 5000L, "xx"))
      .toDF("event_id", "user_id", "ts_us", "lang")
    VersionedTable.upsertByKey(spark, root, updates, Seq("event_id"))  // v3

    val full = VersionedTable.readChangesCdc(spark, root, 0, 3)
    assert(full.columns.contains("lang"),
      "CDC rows must carry toV's evolved schema")
    // v1's inserts predate the column: null-filled
    assert(full.filter($"_commit_version" === 1 && $"lang".isNotNull).isEmpty)
    var mirror: DataFrame = null
    (1L to 3L).foreach { v =>
      mirror = applyCdc(mirror,
        VersionedTable.readChangesCdc(spark, root, v - 1, v))
    }
    assertSameRows(mirror, VersionedTable.read(spark, root),
      "mirror diverged under schema evolution")
  }

  test("refusals: vacuumed ranges and CDC column-name collisions fail loudly") {
    val root = tmp("graft-vt-cdc4")
    VersionedTable.append(rows(0, 50), root, Stats)
    VersionedTable.append(rows(1, 50), root, Stats)
    VersionedTable.append(rows(2, 50), root, Stats)
    VersionedTable.vacuum(spark, root, keepVersions = 1, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      VersionedTable.readChangesCdc(spark, root, 0, 3)
    }
    assert(e.getMessage.contains("vacuumed away"))

    val root2 = tmp("graft-vt-cdc5")
    VersionedTable.append(
      rows(0, 10).withColumn("_change_type", lit("x")),
      root2, Stats)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.readChangesCdc(spark, root2, 0, 1)
    }
    assert(e2.getMessage.contains("CDC column name"))
  }
}
