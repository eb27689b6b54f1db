package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TYPED column statistics in the versioned manifest — the Iceberg
  * idea the Long-only boxes couldn't reach: string / date / timestamp
  * / decimal min-max bounds per file (strings truncated: prefix min,
  * truncate-incremented max), aggregated per shard, translated from
  * the SQL path's pushed filters in [[VersionedTable.sqlRead]]'s
  * FileIndex. Real corpora filter on exactly these columns (language,
  * source, date), so without typed bounds every such query scans the
  * table. Also pins the `IN`-list translation — THE point-lookup batch
  * shape — for both long and typed columns, with the cap fallback.
  */
class VersionedTypedStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  /** 20k docs: id, lang (10 values), day (date), ts (timestamp),
    * price (decimal(12,2)) — lang-clustered so typed bounds are narrow
    * per file, ids spread within each lang file.
    */
  private def docs(n: Long) =
    spark.range(0, n)
      .select($"id",
        concat(lit("lang_"), format_string("%02d", $"id" % 10))
          .as("lang"),
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          ($"id" % 300).cast("int")).as("day"),
        timestamp_micros($"id" * 1000000L).as("ts"),
        ($"id" % 1000).cast("decimal(12,2)").as("price"))
      .repartitionByRange(16, $"lang", $"id")

  test("string/date/timestamp/decimal bounds prune SQL scans; every shape stays exact") {
    val root = tmp("graft-vt-typed")
    val n = 20000L
    VersionedTable.append(docs(n), root, Seq("id"),
      Seq("lang", "day", "ts", "price"))
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_typed")
    val total = spark.sql("SELECT count(*) FROM vt_typed").head.getLong(0)
    assert(total == n)
    val all = index.lastKeptFiles
    assert(all == 16, s"fixture: 16 files expected, got $all")

    // string equality: a lang-clustered layout keeps ~1/10 of files
    val eq = spark.sql(
      "SELECT count(*) FROM vt_typed WHERE lang = 'lang_03'")
      .head.getLong(0)
    assert(eq == (0L until n).count(_ % 10 == 3))
    val eqKept = index.lastKeptFiles
    info(s"lang equality kept $eqKept/$all files")
    assert(eqKept < all / 2, s"string equality must prune: $eqKept/$all")

    // string range
    val rg = spark.sql("""SELECT count(*) FROM vt_typed
        WHERE lang >= 'lang_02' AND lang <= 'lang_04'""").head.getLong(0)
    assert(rg == (0L until n).count(id => id % 10 >= 2 && id % 10 <= 4))
    assert(index.lastKeptFiles < all, "string range must prune")

    // string IN-list
    val inL = spark.sql(
      "SELECT count(*) FROM vt_typed WHERE lang IN ('lang_01', 'lang_07')")
      .head.getLong(0)
    assert(inL == (0L until n).count(id => id % 10 == 1 || id % 10 == 7))
    val inKept = index.lastKeptFiles
    info(s"lang IN(2) kept $inKept/$all files")
    assert(inKept < all, "a string IN-list must prune")

    // date range (DateType literal = epoch-day Int)
    val dt = spark.sql("""SELECT count(*) FROM vt_typed
        WHERE day >= DATE'2020-09-27'""").head.getLong(0)
    assert(dt == (0L until n).count(_ % 300 >= 270))
    assert(index.lastKeptFiles <= all)

    // timestamp range (micros literal via timestamp_micros, folded)
    val ts = spark.sql(s"""SELECT count(*) FROM vt_typed
        WHERE ts < timestamp_micros(${5000L * 1000000L})""").head.getLong(0)
    assert(ts == 5000L)
    val tsKept = index.lastKeptFiles
    info(s"timestamp range kept $tsKept/$all files")

    // decimal equality at the exact stored scale
    val dec = spark.sql("""SELECT count(*) FROM vt_typed
        WHERE price = CAST(137.00 AS DECIMAL(12,2))""").head.getLong(0)
    assert(dec == (0L until n).count(_ % 1000 == 137))

    // OR gives no per-conjunct proof: no pruning, result exact
    val or = spark.sql("""SELECT count(*) FROM vt_typed
        WHERE lang = 'lang_00' OR lang = 'lang_09'""").head.getLong(0)
    assert(or == (0L until n).count(id => id % 10 == 0 || id % 10 == 9))
    assert(index.lastKeptFiles == all, "OR must disable pruning, not break it")

    // the DataFrame-API spelling prunes identically: a plain .filter on
    // the sqlRead frame IS the typed boxRead (same pushdown, same index)
    val viaApi = df.filter($"lang" === "lang_03").count()
    assert(viaApi == eq)
    assert(index.lastKeptFiles == eqKept,
      "DataFrame .filter must prune exactly like the SQL spelling")
  }

  test("date/timestamp/decimal ranges prune on a time-clustered layout") {
    val root = tmp("graft-vt-time")
    val n = 10000L
    // all three typed columns monotone in id, id-range-clustered: every
    // range probe has narrow per-file bounds to bite on
    val rows = spark.range(0, n)
      .select($"id",
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          ($"id" / 100L).cast("int")).as("day"),
        timestamp_micros($"id" * 1000000L).as("ts"),
        $"id".cast("decimal(12,2)").as("price"))
      .repartitionByRange(10, $"id")
    VersionedTable.append(rows, root, Seq("id"), Seq("day", "ts", "price"))
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_time")

    val dt = spark.sql("""SELECT count(*) FROM vt_time
        WHERE day >= DATE'2020-01-01' AND day < DATE'2020-01-11'""")
      .head.getLong(0)
    assert(dt == 1000L)
    val dayKept = index.lastKeptFiles
    info(s"date range kept $dayKept/10 files")
    assert(dayKept <= 3, s"a 10% date range must prune: $dayKept/10")

    val ts = spark.sql(s"""SELECT count(*) FROM vt_time
        WHERE ts >= timestamp_micros(${8000L * 1000000L})""").head.getLong(0)
    assert(ts == 2000L)
    val tsKept = index.lastKeptFiles
    info(s"timestamp range kept $tsKept/10 files")
    assert(tsKept <= 4, s"a 20% timestamp range must prune: $tsKept/10")

    val dec = spark.sql("""SELECT count(*) FROM vt_time
        WHERE price <= CAST(499.00 AS DECIMAL(12,2))""").head.getLong(0)
    assert(dec == 500L)
    val decKept = index.lastKeptFiles
    info(s"decimal range kept $decKept/10 files")
    assert(decKept <= 2, s"a 5% decimal range must prune: $decKept/10")
  }

  test("long IN-lists prune as a union of point probes, bloom-staged; above the cap pruning backs off") {
    val root = tmp("graft-vt-in")
    val n = 20000L
    val base = spark.range(0, n)
      .select($"id".as("event_id"), ($"id" % 97).as("user_id"),
        ($"id" * 1000L).as("ts_us"))
      .repartitionByRange(16, $"event_id")
    VersionedTable.append(base, root, Seq("event_id", "user_id"))
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_in")

    val vals = Seq(3L, 9999L, 19998L)
    val got = spark.sql(
      s"SELECT event_id FROM vt_in WHERE event_id IN (${vals.mkString(",")})")
      .as[Long].collect().toSet
    assert(got == vals.toSet)
    val kept = index.lastKeptFiles
    info(s"IN(${vals.size}) kept $kept/16 files")
    assert(kept <= vals.size,
      s"an IN-list over a range-clustered column must keep at most one " +
        s"file per value: $kept")

    // above the cap: exact result, pruning off (never a wrong plan)
    val big = (0L until n by (n / 100)).take(80)
    val gotBig = spark.sql(
      s"SELECT count(*) FROM vt_in WHERE event_id IN (${big.mkString(",")})")
      .head.getLong(0)
    assert(gotBig == big.size.toLong)
    assert(index.lastKeptFiles == 16,
      "an over-cap IN-list must fall back to no pruning")

    // IN composes with a conjunctive box on another column
    val mix = spark.sql(
      s"""SELECT count(*) FROM vt_in
          WHERE event_id IN (${vals.mkString(",")}) AND user_id <= 10""")
      .head.getLong(0)
    assert(mix == vals.count(_ % 97 <= 10))
  }

  test("truncated string bounds stay sound: 32-byte-plus strings lose no rows and still prune") {
    val root = tmp("graft-vt-trunc")
    // two groups of long strings (shared 40-byte prefixes, distinct
    // tails) — bounds must truncate yet keep every row findable
    val pfxA = "a" * 40
    val pfxB = "b" * 40
    val rows = spark.range(0, 2000)
      .select($"id",
        when($"id" % 2 === 0, concat(lit(pfxA), format_string("%06d", $"id")))
          .otherwise(concat(lit(pfxB), format_string("%06d", $"id")))
          .as("url"))
      .repartitionByRange(8, $"url")
    VersionedTable.append(rows, root, Seq("id"), Seq("url"))
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_trunc")
    // a point lookup on a full long string: found despite truncation
    val needle = pfxB + "%06d".format(1001)
    val hit = spark.sql(
      s"SELECT id FROM vt_trunc WHERE url = '$needle'")
      .as[Long].collect().toSeq
    assert(hit == Seq(1001L), "truncated bounds must never lose a row")
    // and the a-prefix files were pruned away for a b-prefix probe
    assert(index.lastKeptFiles < 8,
      s"prefix-distinct files must prune: ${index.lastKeptFiles}/8")
    // range over one prefix group
    val cnt = spark.sql(
      s"SELECT count(*) FROM vt_trunc WHERE url >= '$pfxB'").head.getLong(0)
    assert(cnt == 1000L)
  }

  test("all-NULL typed column yields unknown bounds: kept for every probe, semantics exact") {
    val root = tmp("graft-vt-null")
    val withLang = spark.range(0, 500)
      .select($"id", concat(lit("x_"), $"id" % 5).as("lang"))
    VersionedTable.append(withLang, root, Seq("id"), Seq("lang"))    // v1
    val nullLang = spark.range(500, 1000)
      .select($"id", lit(null).cast("string").as("lang"))
    VersionedTable.append(nullLang, root, Seq("id"), Seq("lang"))    // v2
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_null")
    val got = spark.sql(
      "SELECT count(*) FROM vt_null WHERE lang = 'x_3'").head.getLong(0)
    assert(got == 100L)
    // the null-lang files have unknown bounds: never pruned (sound),
    // and their NULL rows never match an equality anyway
    assert(spark.sql("SELECT count(*) FROM vt_null WHERE lang IS NULL")
      .head.getLong(0) == 500L)
    assert(index.inputFiles.nonEmpty)
  }

  test("typed bounds survive runt-shard folds: the folded shard re-aggregates them and pruning keeps biting") {
    val root = tmp("graft-vt-fold-typed")
    // one language per append: ShardMergeFanIn runts, then the
    // FanIn+1-th append folds them — the fold must carry and
    // re-aggregate the typed bounds, not drop them
    (0 until VersionedTable.ShardMergeFanIn + 1).foreach { g =>
      val part = spark.range(g * 1000L, g * 1000L + 1000L)
        .select($"id", lit(f"lang_$g%02d").as("lang"))
      VersionedTable.append(part, root, Seq("id"), Seq("lang"))
    }
    val v = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.shardCount(spark, root, v) <
      VersionedTable.ShardMergeFanIn + 1,
      "fixture: the fold must have fired")
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_fold_typed")
    val total = spark.sql("SELECT count(*) FROM vt_fold_typed")
      .head.getLong(0)
    assert(total == (VersionedTable.ShardMergeFanIn + 1) * 1000L)
    val all = index.lastKeptFiles
    val one = spark.sql(
      "SELECT count(*) FROM vt_fold_typed WHERE lang = 'lang_02'")
      .head.getLong(0)
    assert(one == 1000L)
    info(s"post-fold lang probe kept ${index.lastKeptFiles}/$all files")
    assert(index.lastKeptFiles < all / 2,
      "typed bounds must survive the fold and keep pruning")
  }

  test("deleteWhere rewrites ONLY the typed-candidate files; the exact predicate decides rows") {
    val root = tmp("graft-vt-delwhere")
    val n = 10000L
    VersionedTable.append(docs(n), root, Seq("id"),
      Seq("lang", "day", "ts", "price"))
    val v1 = VersionedTable.latestVersion(spark, root).get
    val before = VersionedTable.entryNames(spark, root, v1)
    val (_, deleted) = VersionedTable.deleteWhere(spark, root,
      "lang = 'lang_03'")
    assert(deleted == n / 10)
    val v2 = VersionedTable.latestVersion(spark, root).get
    val after = VersionedTable.entryNames(spark, root, v2)
    val untouchedCarried = (before intersect after).size
    val rewritten = (before -- after).size
    info(s"deleteWhere rewrote $rewritten of ${before.size} files")
    assert(rewritten <= before.size / 2,
      s"typed pruning must bound the rewrite: $rewritten/${before.size}")
    assert(untouchedCarried == before.size - rewritten,
      "untouched files carry by name")
    assert(VersionedTable.read(spark, root)
      .filter($"lang" === "lang_03").count() == 0L)
    assert(VersionedTable.fastCount(spark, root) == n - deleted)
    // a COMPOUND predicate: typed conjunct prunes, full predicate
    // (including the untranslatable modulus) decides rows exactly
    val (_, d2) = VersionedTable.deleteWhere(spark, root,
      "lang = 'lang_05' AND id % 2 = 0")
    assert(d2 == (0L until n).count(id => id % 10 == 5 && id % 2 == 0))
    // date retention through the API
    val (_, d3) = VersionedTable.deleteWhere(spark, root,
      "day < DATE'2020-01-31'")
    assert(d3 == (0L until n).count(id => id % 10 != 3 &&
      !(id % 10 == 5 && id % 2 == 0) && id % 300 < 30))
    // a predicate with NO stats-checkable conjunct is refused
    val e = intercept[IllegalArgumentException] {
      VersionedTable.deleteWhere(spark, root, "id % 7 = 0")
    }
    assert(e.getMessage.contains("stats-checkable"))
  }

  test("typed bounds survive DML rewrites and folds; typed columns are fixed at creation") {
    val root = tmp("graft-vt-dml")
    val n = 10000L
    VersionedTable.append(docs(n), root, Seq("id"),
      Seq("lang", "day", "ts", "price"))
    // COW delete on the LONG stat column rewrites files — the rewrite
    // must re-derive typed bounds for the survivors (the narrow
    // filter-only rewrite keeps each input file's lang band, so the
    // probe must still prune afterwards)
    val (_, deleted) = VersionedTable.deleteRange(spark, root,
      Seq(("id", 0L, 999L)))
    assert(deleted == 1000L)
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_dml")
    val total = spark.sql("SELECT count(*) FROM vt_dml").head.getLong(0)
    assert(total == n - 1000L)
    val all = index.lastKeptFiles
    val got = spark.sql(
      "SELECT count(*) FROM vt_dml WHERE lang = 'lang_04'").head.getLong(0)
    assert(got == (1000L until n).count(_ % 10 == 4))
    info(s"post-DML lang probe kept ${index.lastKeptFiles}/$all files")
    assert(index.lastKeptFiles < all,
      "rewritten files must carry re-derived typed bounds that prune")
    // compactClustered restores a typed layout the DML scrambled:
    // cluster by (lang, id) and the lang probe prunes hard again
    VersionedTable.compactClustered(spark, root, nFiles = 10,
      Seq("lang", "id"))
    val (df2, Seq(index2)) =
      VersionedTable.sqlReadWithIndexes(spark, root, None)
    df2.createOrReplaceTempView("vt_dml2")
    val got2 = spark.sql(
      "SELECT count(*) FROM vt_dml2 WHERE lang = 'lang_04'").head.getLong(0)
    assert(got2 == got)
    info(s"post-compactClustered lang probe kept " +
      s"${index2.lastKeptFiles}/10 files")
    // ≤3, not ≤2: repartitionByRange samples with an RDD-id-seeded
    // RNG, so a lang boundary can straddle one extra file depending
    // on session history — the design claim is "a handful, not all"
    assert(index2.lastKeptFiles <= 3,
      s"a lang-clustered rewrite must restore tight pruning: " +
        s"${index2.lastKeptFiles}/10")
    // typed columns are fixed at creation
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(docs(100), root, Seq("id"), Seq("lang"))
    }
    assert(e.getMessage.contains("typed stat columns are fixed"))
    // and an append whose schema lacks a declared typed column fails
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.append(
        spark.range(0, 10).select($"id", lit("x").as("nope")),
        tmp("graft-vt-miss"), Seq("id"), Seq("lang"))
    }
    assert(e2.getMessage.contains("not in the append schema"))
  }

  test("TIMESTAMP_MILLIS-written files normalize footer bounds to micros: no row lost to unit-mismatched pruning") {
    // the writer only forces TIMESTAMP_MICROS when the session conf is
    // INT96 — under TIMESTAMP_MILLIS the footer LongStatistics are in
    // MILLIS while every probe literal is MICROS; without logical-type
    // unit normalization the bounds look 1000x too small and a ts
    // range probe silently prunes files that HOLD matching rows
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    val root = tmp("graft-vt-millis")
    val n = 8000L
    try {
      spark.conf.set(key, "TIMESTAMP_MILLIS")
      VersionedTable.append(
        spark.range(0, n).select($"id",
          timestamp_millis($"id" * 1000L).as("ts"))
          .repartitionByRange(8, $"id"),
        root, Seq("id"), Seq("ts"))
    } finally spark.conf.set(key, prev)
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_millis")
    // probe the top quarter: every row has ts = id seconds
    val cut = java.time.Instant.ofEpochSecond(n * 3 / 4).toString
      .replace("T", " ").replace("Z", "")
    val got = spark.sql(
      s"SELECT count(*) FROM vt_millis WHERE ts >= TIMESTAMP'$cut'")
      .head.getLong(0)
    assert(got == n / 4,
      s"unit-mismatched pruning lost rows: got $got of ${n / 4}")
    info(s"millis-written ts probe kept ${index.lastKeptFiles}/8 files")
    assert(index.lastKeptFiles < 8,
      "normalized millis bounds must still prune")
    // deleteWhere's candidate test shares the translation: the delete
    // must find its rows inside millis-written files
    val (_, deleted) = VersionedTable.deleteWhere(spark, root,
      s"ts >= TIMESTAMP'$cut'")
    assert(deleted == n / 4,
      s"deleteWhere lost rows to unit-mismatched candidacy: $deleted")
    assert(VersionedTable.fastCount(spark, root) == n - n / 4)
  }

  test("string equality probes get the footer-bloom stage where truncated bounds cannot prune") {
    val root = tmp("graft-vt-strbloom")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    // HASH-scattered sids: every file's [min,max] string band spans
    // the whole sid space, so the bounds stage keeps everything — the
    // per-file parquet BLOOM is the only footer stage that can prune
    // the point lookup (each sid lives in exactly one file)
    try {
      spark.conf.set(coalesceKey, "false")
      VersionedTable.append(
        spark.range(0, 20000)
          .select($"id", format_string("doc_%05d", $"id").as("sid"))
          .repartition(8, pmod(hash($"sid"), lit(8))),
        root, Seq("id"), Seq("sid"))
    } finally spark.conf.set(coalesceKey, prev)
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_strbloom")
    val all = VersionedTable.entryNames(spark, root, 1L).size
    assert(all >= 4, s"fixture needs several files, got $all")
    val got = spark.sql(
      "SELECT id FROM vt_strbloom WHERE sid = 'doc_00042'")
      .head.getLong(0)
    assert(got == 42L)
    info(s"string bloom probe kept ${index.lastKeptFiles}/$all files")
    assert(index.lastKeptFiles < all,
      s"the bloom stage must prune where bounds cannot: " +
        s"${index.lastKeptFiles}/$all")
    // a value that exists nowhere: blooms prove absence (modulo FPs)
    assert(spark.sql(
      "SELECT count(*) FROM vt_strbloom WHERE sid = 'doc_99999x'")
      .head.getLong(0) == 0L)
    assert(index.lastKeptFiles < all)
  }

  test("concurrent typed-timestamp appends under INT96: the conf flip is refcounted, both writers get usable bounds") {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    val roots = Seq(tmp("graft-vt-int96-a"), tmp("graft-vt-int96-b"))
    try {
      spark.conf.set(key, "INT96")
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val fs = roots.map(root => Future {
        (0 until 3).foreach { _ =>
          VersionedTable.append(
            spark.range(0, 2000).select($"id",
              timestamp_micros($"id" * 1000000L).as("ts"))
              .repartitionByRange(4, $"id"),
            root, Seq("id"), Seq("ts"))
        }
      })
      fs.foreach(Await.result(_, 120.seconds))
      // the LAST writer out restored the session conf
      assert(spark.conf.get(key) == "INT96",
        s"conf not restored: ${spark.conf.get(key)}")
    } finally spark.conf.set(key, prev)
    // an interleaved naive restore would have left one writer on
    // INT96 — its files then carry NO usable ts stats and the probe
    // keeps everything; with the refcount both tables prune
    roots.foreach { root =>
      val (df, Seq(index)) =
        VersionedTable.sqlReadWithIndexes(spark, root, None)
      df.createOrReplaceTempView("vt_int96")
      val got = spark.sql(
        """SELECT count(*) FROM vt_int96
           WHERE ts >= TIMESTAMP'1970-01-01 00:25:00'""").head.getLong(0)
      assert(got == 3 * 500L)
      val all = VersionedTable.entryNames(spark, root,
        VersionedTable.latestVersion(spark, root).get).size
      info(s"ts probe kept ${index.lastKeptFiles}/$all files")
      assert(index.lastKeptFiles < all,
        s"typed ts bounds unusable (INT96 leaked into a write): " +
          s"${index.lastKeptFiles}/$all")
    }
  }
}
