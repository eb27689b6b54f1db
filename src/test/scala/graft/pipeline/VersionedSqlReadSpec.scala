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
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_sql")

    // full scan: nothing to prove, nothing pruned
    assert(spark.sql("SELECT count(*) FROM vt_sql").head.getLong(0) == 50000L)
    assert(index.lastKeptFiles == 32)

    // size accounting comes from MANIFEST-recorded bytes (planning
    // never lists files/): it must equal the files' real lengths
    val realBytes = index.inputFiles
      .map(p => new java.io.File(p.stripPrefix("file:")).length()).sum
    assert(index.sizeInBytes == realBytes,
      s"manifest bytes ${index.sizeInBytes} != on-disk $realBytes")

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

    // mor markers: SQL serving splits into one pruned relation per
    // marker-coverage group — marker semantics exact AND the pushed
    // filters still prune each group's files. The marker and the probe
    // key on ts_us (monotone in id), so per-file ranges are narrow at
    // ANY write parallelism and both coverage grouping and pruning
    // have something to bite on.
    VersionedTable.deleteRangeMor(spark, root,
      Seq(("ts_us", 100000L, 300000L)))
    val (fb, indexes) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    assert(indexes.size >= 2,
      "a partially-covered snapshot must split into coverage groups")
    fb.createOrReplaceTempView("vt_mor")
    val viaSql = spark.sql("SELECT count(*) FROM vt_mor").head.getLong(0)
    assert(viaSql == VersionedTable.read(spark, root).count())
    assert(viaSql == VersionedTable.fastCount(spark, root))
    // a selective box through SQL: correct under the marker AND pruned
    val boxSql = spark.sql(
      "SELECT count(*) FROM vt_mor WHERE ts_us >= 1500000 AND ts_us <= 1600000")
      .head.getLong(0)
    val brute = VersionedTable.read(spark, root)
      .filter($"ts_us" >= 1500000L && $"ts_us" <= 1600000L).count()
    assert(boxSql == brute && boxSql > 0)
    val kept = indexes.map(ix => math.max(0, ix.lastKeptFiles)).sum
    val total = indexes.map(_.inputFiles.length).sum
    assert(kept < total,
      s"marker groups must still prune on pushed filters: $kept/$total")
  }
}
