package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** STRING keys for keyed DML — the promotion real corpora need:
  * documents key on doc ids / URLs / user GUIDs, all strings, while
  * the manifest's box algebra is Long. [[VersionedTable.upsertByKey]],
  * [[VersionedTable.deleteKeysMor]] and [[VersionedTable.applyCdcBatch]]
  * accept a key column that is a STRING typed stat column: candidate
  * files resolve through the typed truncated bounds (sparse key sets
  * against the actual encoded values), equality-delete markers carry
  * string keys inline (hex-encoded) or in a typed parquet sidecar,
  * and the SQL MERGE/UPDATE surface inherits all of it through
  * `KEYS(<string col>)`.
  */
class VersionedTypedKeySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  /** n docs keyed by a string sid ("doc_000123"), lang derived, a long
    * payload; sid-clustered so string bounds are narrow per file.
    */
  private def docs(n: Long, files: Int = 8) =
    spark.range(0, n)
      .select($"id",
        format_string("doc_%06d", $"id").as("sid"),
        concat(lit("lang_"), $"id" % 5).as("lang"),
        ($"id" * 10L).as("chars"))
      .repartitionByRange(files, $"sid")

  private def build(root: String, n: Long, files: Int = 8): Unit =
    VersionedTable.append(docs(n, files), root, Seq("id", "chars"),
      Seq("sid", "lang"))

  test("string-keyed upsertByKey replaces and inserts; typed bounds bound the rewrite") {
    val root = tmp("graft-strkey-upsert")
    val n = 20000L
    build(root, n)
    val v1 = VersionedTable.latestVersion(spark, root).get
    val before = VersionedTable.entryNames(spark, root, v1)
    // replace 10 existing docs (narrow sid band) + insert 3 new ones
    val updates = spark.range(100, 110)
      .select($"id", format_string("doc_%06d", $"id").as("sid"),
        lit("lang_zz").as("lang"), lit(-1L).as("chars"))
      .unionByName(spark.range(0, 3)
        .select(($"id" + n).as("id"),
          format_string("new_%06d", $"id").as("sid"),
          lit("lang_new").as("lang"), lit(-2L).as("chars")))
    val (_, replaced) = VersionedTable.upsertByKey(spark, root, updates,
      Seq("sid"))
    assert(replaced == 10L)
    val v2 = VersionedTable.latestVersion(spark, root).get
    val after = VersionedTable.entryNames(spark, root, v2)
    val rewritten = (before -- after).size
    info(s"string-keyed upsert rewrote $rewritten of ${before.size} files")
    assert(rewritten <= 2,
      s"sparse string keys in one sid band must rewrite ~1 file, " +
        s"not $rewritten of ${before.size}")
    val t = VersionedTable.read(spark, root)
    assert(t.count() == n + 3)
    assert(t.filter($"lang" === "lang_zz").count() == 10L)
    assert(t.filter($"sid" === "doc_000105").select($"chars")
      .head.getLong(0) == -1L)
    assert(t.filter($"lang" === "lang_new").count() == 3L)
  }

  test("mixed long+string keys upsert exactly") {
    val root = tmp("graft-mixkey-upsert")
    val n = 5000L
    build(root, n)
    // key on (id, sid) — both must match for a replace
    val updates = spark.range(40, 44)
      .select($"id", format_string("doc_%06d", $"id").as("sid"),
        lit("lang_mix").as("lang"), lit(-7L).as("chars"))
    val (_, replaced) = VersionedTable.upsertByKey(spark, root, updates,
      Seq("id", "sid"))
    assert(replaced == 4L)
    assert(VersionedTable.read(spark, root).count() == n)
    assert(VersionedTable.read(spark, root)
      .filter($"lang" === "lang_mix").count() == 4L)
  }

  test("string-keyed deleteKeysMor: inline tier marks, scopes by file, fastCount exact") {
    val root = tmp("graft-strkey-inline")
    val n = 10000L
    build(root, n)
    val dataFiles = new java.io.File(s"$root/files").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("."))
    val keys = Seq("doc_000010", "doc_004000", "doc_009999", "doc_nope")
    val (v2, matched) = VersionedTable.deleteKeysMor(spark, root, "sid",
      keys.toDF("sid"))
    assert(matched == 3L) // doc_nope matches nothing
    // metadata-only: no data file written or removed
    val dataFiles2 = new java.io.File(s"$root/files").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("."))
    assert(dataFiles2 == dataFiles, "equality delete must write no data")
    assert(VersionedTable.fastCount(spark, root) == n - 3)
    val t = VersionedTable.read(spark, root)
    assert(t.count() == n - 3)
    assert(t.filter($"sid".isin(keys: _*)).count() == 0L)
    // file scoping: re-append one of the deleted sids — it SURVIVES
    // (the marker covers only the files that existed at commit)
    VersionedTable.append(
      Seq((10L, "doc_000010", "lang_back", 1L))
        .toDF("id", "sid", "lang", "chars"),
      root, Seq("id", "chars"), Seq("sid", "lang"))
    assert(VersionedTable.read(spark, root)
      .filter($"sid" === "doc_000010").count() == 1L)
    assert(VersionedTable.fastCount(spark, root) == n - 3 + 1)
    // time travel still serves the marked version
    assert(VersionedTable.readVersion(spark, root, v2).count() == n - 3)
  }

  test("string-keyed deleteKeysMor: sidecar tier anti-joins; materialize folds it away") {
    val root = tmp("graft-strkey-side")
    val n = 10000L
    build(root, n)
    // > InlineKeyCap keys → parquet sidecar of strings
    val keys = (0L until 200L).map(i => f"doc_${i * 50}%06d")
    val (_, matched) = VersionedTable.deleteKeysMor(spark, root, "sid",
      keys.toDF("sid"))
    assert(matched == 200L)
    val sidecars = new java.io.File(s"$root/manifests").listFiles()
      .count(_.getName.startsWith("k-"))
    assert(sidecars == 1, s"expected one string sidecar, got $sidecars")
    assert(VersionedTable.read(spark, root).count() == n - 200)
    assert(VersionedTable.fastCount(spark, root) == n - 200)
    // overlapping second marker counts only still-visible rows
    val (_, m2) = VersionedTable.deleteKeysMor(spark, root, "sid",
      Seq("doc_000000", "doc_000001").toDF("sid")) // 000000 already gone
    assert(m2 == 1L)
    assert(VersionedTable.fastCount(spark, root) == n - 201)
    // materialization folds both markers into the data, rows unchanged
    VersionedTable.materializeDeletes(spark, root)
    val t = VersionedTable.read(spark, root)
    assert(t.count() == n - 201)
    assert(t.filter($"sid".isin(keys.take(5) :+ "doc_000001": _*))
      .count() == 0L)
    assert(VersionedTable.morDeleteCount(spark, root,
      VersionedTable.latestVersion(spark, root).get) == 0)
  }

  test("string-keyed CDC batch applies atomically and replays as a no-op") {
    val root = tmp("graft-strkey-cdc")
    val n = 3000L
    build(root, n)
    val ups = Seq((7L, "doc_000007", "lang_cdc", -1L),
      (999999L, "brand_new", "lang_cdc", -2L))
      .toDF("id", "sid", "lang", "chars")
    val dels = Seq("doc_000008").toDF("sid")
    val (v, applied) = VersionedTable.applyCdcBatch(spark, root, ups, dels,
      Seq("sid"), sourceVersion = 1L)
    assert(applied)
    val t = VersionedTable.read(spark, root)
    assert(t.count() == n + 1 - 1)
    assert(t.filter($"sid" === "doc_000008").count() == 0L)
    assert(t.filter($"lang" === "lang_cdc").count() == 2L)
    // replay: same source version → nothing changes
    val (v2, applied2) = VersionedTable.applyCdcBatch(spark, root, ups,
      dels, Seq("sid"), sourceVersion = 1L)
    assert(!applied2 && v2 == v)
    // a string-keyed feed cannot auto-create its mirror
    val e = intercept[IllegalArgumentException] {
      VersionedTable.applyCdcBatch(spark, tmp("graft-strkey-new"), ups,
        Seq.empty[String].toDF("sid"), Seq("sid"), 1L)
    }
    assert(e.getMessage.contains("typed stat columns"))
  }

  test("SQL MERGE and UPDATE work over a string-keyed registration") {
    val root = tmp("graft-strkey-sql")
    val n = 4000L
    build(root, n)
    spark.sql(s"CREATE VERSIONED TABLE strkey_sql LOCATION '$root' " +
      "KEYS(sid)")
    spark.range(10, 15)
      .select($"id", format_string("doc_%06d", $"id").as("sid"),
        lit("lang_m").as("lang"), lit(-5L).as("chars"))
      .createOrReplaceTempView("strkey_updates")
    val mrg = spark.sql(
      """MERGE INTO strkey_sql USING strkey_updates
         ON strkey_sql.sid = strkey_updates.sid
         WHEN MATCHED THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *""").head
    assert(mrg.getLong(1) == 5L)
    val upd = spark.sql(
      "UPDATE strkey_sql SET chars = 0 WHERE lang = 'lang_m'").head
    assert(upd.getLong(1) == 5L)
    val t = spark.table("strkey_sql")
    assert(t.filter($"lang" === "lang_m" && $"chars" === 0).count() == 5L)
    assert(t.count() == n)
  }

  test("wrong key types and kinds are rejected loudly") {
    val root = tmp("graft-strkey-errs")
    VersionedTable.append(
      spark.range(0, 100).select($"id",
        format_string("d%03d", $"id").as("sid"),
        to_date(lit("2020-01-01")).as("day")),
      root, Seq("id"), Seq("sid", "day"))
    // long frame probing a string column
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.deleteKeysMor(spark, root, "sid",
        Seq(1L, 2L).toDF("sid"))
    }
    assert(e1.getMessage.contains("string typed column"))
    // a date-kind typed key is rejected (encode as long instead)
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.upsertByKey(spark, root,
        spark.range(0, 1).select($"id", lit("x").as("sid"),
          to_date(lit("2020-01-01")).as("day")),
        Seq("day"))
    }
    assert(e2.getMessage.contains("'l'-kind"))
    // an unmanifested key column
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.deleteKeysMor(spark, root, "nope",
        Seq("x").toDF("nope"))
    }
    assert(e3.getMessage.contains("must be a manifested"))
  }

  test("a string-keyed upsert racing an append that lands one of its keys restarts, not clobbers") {
    val root = tmp("graft-strkey-race")
    val n = 2000L
    build(root, n, files = 4)
    // inject a competing append INSIDE the upsert's publish window:
    // it lands a fresh row for one of the upsert's keys — the upsert
    // must detect it (typed-bound candidate test on the new entry)
    // and restart against the new base, replacing BOTH copies' key
    VersionedTable.beforePublishHook.set(() =>
      VersionedTable.append(
        Seq((5L, "doc_000005", "lang_raced", 123L))
          .toDF("id", "sid", "lang", "chars"),
        root, Seq("id", "chars"), Seq("sid", "lang")))
    val updates = Seq((5L, "doc_000005", "lang_won", -9L))
      .toDF("id", "sid", "lang", "chars")
    val (_, replaced) = VersionedTable.upsertByKey(spark, root, updates,
      Seq("sid"))
    // the raced append added a duplicate sid; the restarted upsert
    // replaced both copies with ONE update row
    assert(replaced == 2L,
      s"expected the restart to replace both copies, replaced=$replaced")
    val t = VersionedTable.read(spark, root)
    assert(t.filter($"sid" === "doc_000005").count() == 1L)
    assert(t.filter($"sid" === "doc_000005").select($"lang")
      .head.getString(0) == "lang_won")
  }
}
