package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-column NULL counts in the versioned manifest — Iceberg's
  * null_value_counts: every entry (and shard aggregate) records how
  * many nulls each stat/typed column holds, so `WHERE c IS NULL`
  * keeps only files that HAVE nulls, `IS NOT NULL` (the conjunct
  * Catalyst pushes for nearly every filter) drops all-null files, and
  * `deleteWhere("c IS NULL")` bounds its rewrite to the files with
  * null rows. Unknown counts (-1: pre-upgrade entries, omitted footer
  * stats) never prune.
  */
class VersionedNullStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  /** 3 appends: one fully non-null, one with nulls in `note`, one with
    * `note` entirely null — per-append files so per-file counts differ.
    */
  private def build(root: String): Unit = {
    VersionedTable.append(
      spark.range(0, 1000).select($"id",
        concat(lit("n"), $"id").as("note")),
      root, Seq("id"), Seq("note"))
    VersionedTable.append(
      spark.range(1000, 2000).select($"id",
        when($"id" % 10 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("n"), $"id")).as("note")),
      root, Seq("id"), Seq("note"))
    VersionedTable.append(
      spark.range(2000, 3000).select($"id",
        lit(null).cast("string").as("note")),
      root, Seq("id"), Seq("note"))
  }

  test("IS NULL keeps only files with recorded nulls; IS NOT NULL drops all-null files; semantics exact") {
    val root = tmp("graft-nulls")
    build(root)
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_nulls")
    val all = VersionedTable.entryNames(spark, root,
      VersionedTable.latestVersion(spark, root).get).size
    val gotNull = spark.sql(
      "SELECT count(*) FROM vt_nulls WHERE note IS NULL").head.getLong(0)
    assert(gotNull == 100L + 1000L)
    val nullKept = index.lastKeptFiles
    info(s"IS NULL kept $nullKept/$all files")
    assert(nullKept < all,
      s"IS NULL must drop the zero-null append's files: $nullKept/$all")
    val gotNotNull = spark.sql(
      "SELECT count(*) FROM vt_nulls WHERE note IS NOT NULL")
      .head.getLong(0)
    assert(gotNotNull == 1000L + 900L)
    val notNullKept = index.lastKeptFiles
    info(s"IS NOT NULL kept $notNullKept/$all files")
    assert(notNullKept < all,
      s"IS NOT NULL must drop the all-null append's files: " +
        s"$notNullKept/$all")
    // a compound probe: range + null check both prune
    val both = spark.sql("""SELECT count(*) FROM vt_nulls
      WHERE id >= 2000 AND note IS NOT NULL""").head.getLong(0)
    assert(both == 0L)
  }

  test("deleteWhere('c IS NULL') bounds its rewrite to null-bearing files") {
    val root = tmp("graft-nulls-del")
    build(root)
    val v0 = VersionedTable.latestVersion(spark, root).get
    val before = VersionedTable.entryNames(spark, root, v0)
    val (_, deleted) = VersionedTable.deleteWhere(spark, root,
      "note IS NULL")
    assert(deleted == 1100L)
    val after = VersionedTable.entryNames(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val untouchedCarried = (before intersect after).size
    info(s"IS NULL delete rewrote ${(before -- after).size} of " +
      s"${before.size} files, carried $untouchedCarried")
    assert(untouchedCarried >= 1,
      "the zero-null append's files must carry by name, not rewrite")
    assert(VersionedTable.read(spark, root)
      .filter($"note".isNull).count() == 0L)
    assert(VersionedTable.fastCount(spark, root) == 3000L - 1100L)
    // survivors rewrote with fresh null counts: IS NULL now scans none
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_nulls_del")
    assert(spark.sql(
      "SELECT count(*) FROM vt_nulls_del WHERE note IS NULL")
      .head.getLong(0) == 0L)
    info(s"post-delete IS NULL kept ${index.lastKeptFiles} files")
    assert(index.lastKeptFiles == 0,
      "after deleting every null, IS NULL must plan an empty scan")
  }

  test("null counts aggregate through shard folds and survive DML; long stat columns count too") {
    val root = tmp("graft-nulls-long")
    // long stat column with PARTIAL nulls in a non-stat long column
    VersionedTable.append(
      spark.range(0, 500).select($"id",
        when($"id" < 100, lit(null).cast("long"))
          .otherwise($"id").as("maybe")),
      root, Seq("id"))
    VersionedTable.append(
      spark.range(500, 1000).select($"id", $"id".as("maybe")),
      root, Seq("id"))
    // `maybe` is NOT a stat column: no counts recorded for it — the
    // probe must keep everything (absence never prunes) and stay exact
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_nulls_long")
    assert(spark.sql(
      "SELECT count(*) FROM vt_nulls_long WHERE maybe IS NULL")
      .head.getLong(0) == 100L)
    // the STAT column id: IS NOT NULL prunes nothing away wrongly
    assert(spark.sql(
      "SELECT count(*) FROM vt_nulls_long WHERE id IS NOT NULL")
      .head.getLong(0) == 1000L)
  }
}
