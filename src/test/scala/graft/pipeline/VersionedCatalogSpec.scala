package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSourceV2 [[VersionedCatalog]]: standard SQL (`CREATE TABLE
  * vt.t … PARTITIONED BY … TBLPROPERTIES`, `INSERT INTO`, `SELECT`,
  * `VERSION AS OF`, `TIMESTAMP AS OF`, `ALTER TABLE ADD COLUMNS`,
  * `DROP TABLE`) and the DataFrame API (`spark.read.table`,
  * `df.writeTo(...).append()`) over versioned tables with NO regex
  * parser front-end — the reads re-enter the pruning `sqlRead` plan,
  * the writes the optimistic append (cluster shape included).
  */
class VersionedCatalogSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft-catalog")
      .toString
    spark.conf.set("spark.sql.catalog.vt",
      "graft.pipeline.VersionedCatalog")
    spark.conf.set("spark.sql.catalog.vt.warehouse", w)
    w
  }

  test("CREATE TABLE + INSERT INTO + SELECT round-trips through the catalog; partitioning becomes the cluster spec") {
    warehouse
    spark.sql("""CREATE TABLE vt.docs (id BIGINT, lang STRING, n BIGINT)
      PARTITIONED BY (identity(lang)) TBLPROPERTIES ('stats'='id,n')""")
    // creation is v1: an empty versioned append fixing the contract
    assert(VersionedTable.latestVersion(spark, s"$warehouse/docs")
      .contains(1L))
    assert(VersionedTable.clusterSpecOf(spark, s"$warehouse/docs") ==
      Seq("lang"))
    spark.sql("""INSERT INTO vt.docs
      SELECT id, concat('lang_', id % 3) AS lang, id * 2 AS n
      FROM range(0, 300)""")
    assert(spark.sql("SELECT count(*) FROM vt.docs").head.getLong(0)
      == 300L)
    // filters + projection through the V1 bridge stay exact
    val got = spark.sql(
      """SELECT lang, count(*) AS c, sum(n) AS s FROM vt.docs
         WHERE id >= 100 AND id < 200 AND lang = 'lang_1'
         GROUP BY lang""").head
    assert(got.getString(0) == "lang_1")
    assert(got.getLong(1) == (100 until 200).count(_ % 3 == 1))
    // DataFrame write API appends a new version
    spark.range(300, 320)
      .select($"id", concat(lit("lang_"), $"id" % 3).as("lang"),
        ($"id" * 2).as("n"))
      .writeTo("vt.docs").append()
    assert(spark.read.table("vt.docs").count() == 320L)
    // a second INSERT is a third data version
    val versions = VersionedTable.versions(spark, s"$warehouse/docs")
    assert(versions.size == 3, s"versions: $versions")
  }

  test("VERSION AS OF / TIMESTAMP AS OF serve pinned snapshots") {
    warehouse
    spark.sql("""CREATE TABLE vt.tt (k BIGINT, v BIGINT)
      TBLPROPERTIES ('stats'='k')""")
    spark.sql("INSERT INTO vt.tt SELECT id, id FROM range(0, 10)")
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(15)
    spark.sql("INSERT INTO vt.tt SELECT id, id FROM range(10, 30)")
    assert(spark.sql("SELECT count(*) FROM vt.tt").head.getLong(0) == 30L)
    assert(spark.sql("SELECT count(*) FROM vt.tt VERSION AS OF 2")
      .head.getLong(0) == 10L)
    val ts = java.time.Instant.ofEpochMilli(betweenMs).toString
    assert(spark.sql(
      s"SELECT count(*) FROM vt.tt TIMESTAMP AS OF '$ts'")
      .head.getLong(0) == 10L)
    // a time-travel snapshot refuses writes
    val e = intercept[Exception] {
      spark.sql("INSERT INTO vt.tt VERSION AS OF 2 VALUES (99, 99)")
    }
    assert(e != null)
  }

  test("ALTER TABLE ADD COLUMNS evolves; DROP TABLE removes; duplicates refused") {
    warehouse
    spark.sql("""CREATE TABLE vt.ev (k BIGINT)
      TBLPROPERTIES ('stats'='k')""")
    spark.sql("INSERT INTO vt.ev SELECT id FROM range(0, 5)")
    spark.sql("ALTER TABLE vt.ev ADD COLUMNS (tag STRING)")
    assert(spark.read.table("vt.ev").columns.toSeq == Seq("k", "tag"))
    assert(spark.sql("SELECT count(*) FROM vt.ev WHERE tag IS NULL")
      .head.getLong(0) == 5L)
    spark.sql("INSERT INTO vt.ev VALUES (100, 'fresh')")
    assert(spark.sql(
      "SELECT count(*) FROM vt.ev WHERE tag = 'fresh'")
      .head.getLong(0) == 1L)
    // Spark's analyzer rejects the duplicate before our add-only
    // check can (FIELD_ALREADY_EXISTS) — either way, loudly
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE vt.ev ADD COLUMNS (k BIGINT)")
    }
    assert(e.getMessage.contains("add-only") ||
      e.getMessage.contains("already exists"))
    spark.sql("DROP TABLE vt.ev")
    assert(!new java.io.File(s"$warehouse/ev").exists())
  }

  test("INSERT OVERWRITE and RENAME are refused loudly; stats default to the BIGINT columns") {
    warehouse
    // no TBLPROPERTIES: stats default to the long columns, typed to
    // the string columns
    spark.sql("CREATE TABLE vt.defs (k BIGINT, s STRING)")
    spark.sql("INSERT INTO vt.defs VALUES (1, 'a'), (2, 'b')")
    assert(VersionedTable.statColumnsOf(spark, s"$warehouse/defs") ==
      ((Seq("k"), Seq("s"))))
    // the table declares no TRUNCATE capability, so Spark itself
    // refuses the overwrite before planning a write
    val e = intercept[Exception] {
      spark.sql("INSERT OVERWRITE vt.defs VALUES (9, 'z')")
    }
    assert(e.getMessage.contains("truncate") ||
      e.getMessage.contains("INSERT OVERWRITE"))
  }

  test("a string-only table needs no synthetic BIGINT: typed bounds carry the pruning alone") {
    warehouse
    // raw-text corpus shape: not one numeric column
    spark.sql("CREATE TABLE vt.corpus (doc STRING, lang STRING)")
    assert(VersionedTable.statColumnsOf(spark, s"$warehouse/corpus") ==
      ((Seq.empty[String], Seq("doc", "lang"))))
    // per-INSERT disjoint languages: each version's files carry
    // disjoint typed bounds, so a lang probe can drop whole files
    (0 until 4).foreach { g =>
      spark.sql(s"""INSERT INTO vt.corpus
        SELECT concat('text ', id) AS doc, 'lang_$g' AS lang
        FROM range(${g * 100}, ${g * 100 + 100})""")
    }
    assert(spark.sql("SELECT count(*) FROM vt.corpus").head.getLong(0)
      == 400L)
    assert(spark.sql(
      "SELECT count(*) FROM vt.corpus WHERE lang = 'lang_2'")
      .head.getLong(0) == 100L)
    // the probe must PRUNE on the typed bounds, not scan everything
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(
      spark, s"$warehouse/corpus", None)
    df.createOrReplaceTempView("corpus_probe")
    val all = index.inputFiles.length
    assert(spark.sql(
      "SELECT count(*) FROM corpus_probe WHERE lang = 'lang_1'")
      .head.getLong(0) == 100L)
    assert(index.lastKeptFiles < all,
      s"typed-only table: lang probe kept ${index.lastKeptFiles}/$all")
    // and the lifecycle verbs still work without a long stat column
    spark.sql("ALTER TABLE vt.corpus ADD COLUMNS (note STRING)")
    assert(spark.read.table("vt.corpus").columns.contains("note"))
  }
}
