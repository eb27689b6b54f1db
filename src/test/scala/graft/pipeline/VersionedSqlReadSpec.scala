package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedTable.sqlRead]] — the plain-SQL serving path: a custom
  * `FileIndex` (the Delta/Iceberg Spark-integration point) turns
  * Catalyst's PUSHED data filters into manifest box probes, so
  * `spark.sql(... WHERE ...)` over a temp view plans a scan over only
  * the pruned files with zero bespoke query API. Proven: exact results
  * against the brute filter for box, equality (bloom-staged), and
  * unprunable OR shapes; the pruning observable per query; version
  * pinning; schema-evolution null-fill through SQL; and the
  * marker-fallback's correctness.
  */
class VersionedSqlReadSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(round: Int, n: Int) =
    spark.range(round.toLong * n, round.toLong * n + n)
      .select(col("id").as("event_id"), (col("id") % 97).as("user_id"),
        (col("id") * 1000L).as("ts_us"))

  private val Stats = Seq("user_id", "ts_us", "event_id")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  test("pushed SQL filters prune files through the manifest; every shape stays exact") {
    val root = tmp("graft-vt-sql")
    VersionedTable.append(rows(0, 50000), root, Stats)
    VersionedTable.compactZorder(spark, root, nFiles = 32)
    val (df, index) = VersionedTable.sqlReadIndexed(spark, root, None)
    df.createOrReplaceTempView("vt_sql")

    // full scan: nothing to prove, nothing pruned
    assert(spark.sql("SELECT count(*) FROM vt_sql").head.getLong(0) == 50000L)
    assert(index.lastKeptFiles == 32)

    // a selective 2-D box in PLAIN SQL prunes files before the scan
    val got = spark.sql(
      """SELECT event_id FROM vt_sql
         WHERE user_id >= 10 AND user_id <= 30
           AND ts_us >= 2000000 AND ts_us <= 12000000""")
      .as[Long].collect().toSet
    val expect = (0L until 50000L).filter { id =>
      val u = id % 97; val t = id * 1000L
      u >= 10 && u <= 30 && t >= 2000000L && t <= 12000000L
    }.toSet
    assert(got == expect, "pruned SQL result diverged from the exact filter")
    val boxKept = index.lastKeptFiles
    info(s"2-D box query kept $boxKept/32 files")
    assert(boxKept < 32, "a selective box must prune files")

    // equality probe: the footer-bloom stage cuts past the box
    val probe = 25000L
    val got1 = spark.sql(
      s"SELECT user_id FROM vt_sql WHERE event_id = $probe")
      .as[Long].collect().toSeq
    assert(got1 == Seq(probe % 97))
    val eqKept = index.lastKeptFiles
    info(s"equality probe kept $eqKept/32 files (box + bloom)")
    assert(eqKept < 32)

    // strict operators narrow by one: a half-open range stays exact
    val strict = spark.sql(
      "SELECT count(*) FROM vt_sql WHERE user_id > 94").head.getLong(0)
    assert(strict == (0L until 50000L).count(_ % 97 > 94))

    // OR offers no per-conjunct proof: pruning backs off, result exact
    val or = spark.sql(
      "SELECT count(*) FROM vt_sql WHERE user_id <= 5 OR user_id >= 90")
      .head.getLong(0)
    assert(or == (0L until 50000L).count(id => id % 97 <= 5 || id % 97 >= 90))
    assert(index.lastKeptFiles == 32, "OR must disable pruning, not break it")
  }

  test("version pinning, schema-evolution null-fill, and the mor-marker fallback through SQL") {
    val root = tmp("graft-vt-sql2")
    VersionedTable.append(rows(0, 1000), root, Stats)             // v1
    VersionedTable.append(                                        // v2
      rows(1, 1000).withColumn("lang", concat(lit("l"), $"event_id" % 3)),
      root, Stats)

    // pin v1: its own schema (no lang), its own rows
    val v1 = VersionedTable.sqlRead(spark, root, Some(1L))
    assert(v1.count() == 1000 && !v1.columns.contains("lang"))

    // latest: evolved schema, v1 files null-fill lang — through SQL
    VersionedTable.sqlRead(spark, root).createOrReplaceTempView("vt_evo")
    assert(spark.sql("SELECT count(*) FROM vt_evo WHERE lang IS NULL")
      .head.getLong(0) == 1000L)
    assert(spark.sql("SELECT count(*) FROM vt_evo").head.getLong(0) == 2000L)

    // a mor marker makes sqlRead fall back to the marker-aware reader:
    // identical rows, still SQL-queryable
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 10L, 30L)))
    val fb = VersionedTable.sqlRead(spark, root)
    fb.createOrReplaceTempView("vt_mor")
    val viaSql = spark.sql("SELECT count(*) FROM vt_mor").head.getLong(0)
    assert(viaSql == VersionedTable.read(spark, root).count())
    assert(viaSql == VersionedTable.fastCount(spark, root))
  }
}
