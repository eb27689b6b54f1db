package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit add-column schema evolution — the statement form
  * ([[VersionedTable.addColumns]], SQL `ALTER VERSIONED TABLE … ADD
  * COLUMNS (…)`) of the add-only evolution appends already do
  * implicitly: one metadata-only version, old files null-fill the new
  * columns, historical versions keep serving their own schema, and
  * the change feed treats the evolve version as the pure-metadata
  * no-op it is.
  */
class VersionedEvolveSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  test("ALTER ADD COLUMNS: metadata-only version, null-fill, per-version schemas, SQL round trip") {
    val root = tmp("graft-evolve")
    VersionedTable.append(
      spark.range(0, 100).select($"id".as("k"), ($"id" * 2).as("v")),
      root, Seq("k", "v"))                                          // v1
    spark.sql(s"CREATE VERSIONED TABLE vt_evolve LOCATION '$root' " +
      "KEYS(k)")
    val r = spark.sql(
      "ALTER VERSIONED TABLE vt_evolve ADD COLUMNS (tag STRING, " +
        "boost BIGINT)").head                                       // v2
    assert(r.getLong(0) == 2L)
    // metadata-only: no new data files, same row count, view refreshed
    assert(VersionedTable.entryNames(spark, root, 1L) ==
      VersionedTable.entryNames(spark, root, 2L))
    val t = spark.table("vt_evolve")
    assert(t.columns.toSeq == Seq("k", "v", "tag", "boost"))
    assert(t.count() == 100L)
    assert(t.filter($"tag".isNull && $"boost".isNull).count() == 100L)
    // historical version keeps ITS schema — no leakage backward
    assert(VersionedTable.readVersion(spark, root, 1L).columns.toSeq ==
      Seq("k", "v"))
    // an append can now carry the new columns; old rows stay null
    VersionedTable.append(
      spark.range(100, 120).select($"id".as("k"), ($"id" * 2).as("v"),
        lit("fresh").as("tag"), ($"id" % 5).as("boost")),
      root, Seq("k", "v"))                                          // v3
    VersionedSql.refreshView(spark, "vt_evolve")
    val t3 = spark.table("vt_evolve")
    assert(t3.count() == 120L)
    assert(t3.filter($"tag" === "fresh").count() == 20L)
    assert(t3.filter($"tag".isNull).count() == 100L)
    // SQL UPDATE can SET the evolved column
    val upd = spark.sql(
      "UPDATE vt_evolve SET tag = 'old' WHERE k < 10").head
    assert(upd.getLong(1) == 10L)
    assert(spark.table("vt_evolve")
      .filter($"tag" === "old").count() == 10L)
    // duplicates are rejected, evolution is add-only
    val e = intercept[IllegalArgumentException] {
      spark.sql("ALTER VERSIONED TABLE vt_evolve ADD COLUMNS (v BIGINT)")
    }
    assert(e.getMessage.contains("add-only"))
    // the change feeds treat the evolve version as a no-op
    assert(VersionedTable.readChanges(spark, root, 1L, 2L).count() == 0L)
    assert(VersionedTable.readChangesCdc(spark, root, 1L, 2L)
      .count() == 0L)
    val kinds = VersionedTable.history(spark, root).map(_._3)
    assert(kinds.contains("evolve"))
  }
}
