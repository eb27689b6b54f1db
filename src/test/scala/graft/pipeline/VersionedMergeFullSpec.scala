package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full SQL MERGE grammar over the versioned table — conditional
  * matched clauses, the DELETE action, and column-list INSERT, all in
  * ONE atomic version: the CDC-upsert-with-tombstones statement
  * (`WHEN MATCHED AND s.op='d' THEN DELETE …`) that the star-only
  * grammar could not express. Clause order is SQL's: a row is claimed
  * by the FIRST clause whose condition holds. Also pins the parser
  * hardening: a subquery source containing its own `JOIN … ON` finds
  * the top-level ON; quoted strings with commas/equals survive both
  * scanners; cardinality violations fail loudly.
  */
class VersionedMergeFullSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  private def freshTable(tag: String, n: Long): (String, String) = {
    val root = tmp(tag)
    VersionedTable.append(
      spark.range(0, n).select($"id".as("k"), ($"id" % 100).as("v"),
        concat(lit("g"), $"id" % 3).as("grp")),
      root, Seq("k", "v"), Seq("grp"))
    val name = tag.replace("-", "_")
    spark.sql(s"CREATE VERSIONED TABLE $name LOCATION '$root' KEYS(k)")
    (name, root)
  }

  test("tombstone MERGE: conditional DELETE + conditional UPDATE + column-list INSERT in one version") {
    val (name, root) = freshTable("graft-merge-full", 1000L)
    Seq((5L, 50L, "del"), (10L, 60L, "del"), (7L, 70L, "upd"),
      (14L, 80L, "upd"), (5000L, 90L, "ins"), (5001L, 91L, "del"))
      .toDF("k", "v", "op")
      .createOrReplaceTempView("merge_src")
    val r = spark.sql(
      s"""MERGE INTO $name USING merge_src AS s ON $name.k = s.k
          WHEN MATCHED AND s.op = 'del' THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = s.v + 1000
          WHEN NOT MATCHED AND s.op <> 'del' THEN
            INSERT (k, v) VALUES (s.k, s.v + 5)""").head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 2L, 1L)),
      s"updated/deleted/inserted = $r")
    // exactly ONE new version: all three actions landed atomically
    val t = spark.table(name)
    assert(t.count() == 1000L - 2 + 1)
    assert(t.filter($"k".isin(5L, 10L)).count() == 0L)
    assert(t.filter($"k" === 7L).select($"v").head.getLong(0) == 1070L)
    assert(t.filter($"k" === 14L).select($"v").head.getLong(0) == 1080L)
    // the unmatched 'del' row (k=5001) was claimed by NO insert clause
    assert(t.filter($"k" === 5001L).count() == 0L)
    val ins = t.filter($"k" === 5000L)
    assert(ins.select($"v").head.getLong(0) == 95L)
    // grp was not in the INSERT column list: null-filled
    assert(ins.select($"grp").head.isNullAt(0))
    // history: the whole statement is one upsert version
    val kinds = VersionedTable.history(spark, root).map(_._3)
    assert(kinds.count(_ == "upsert") == 1, s"kinds: $kinds")
  }

  test("clause ORDER claims rows first-match-wins") {
    val (name, _) = freshTable("graft-merge-order", 100L)
    Seq((3L, 1L, "x"), (4L, 2L, "y")).toDF("k", "v", "op")
      .createOrReplaceTempView("merge_order_src")
    // first clause (v < 2) claims k=3; the later unconditional update
    // claims k=4 — if order were violated both would take the first
    spark.sql(
      s"""MERGE INTO $name USING merge_order_src AS s ON $name.k = s.k
          WHEN MATCHED AND s.v < 2 THEN UPDATE SET v = 111
          WHEN MATCHED THEN UPDATE SET v = 222
          WHEN NOT MATCHED THEN INSERT *""")
    val t = spark.table(name)
    assert(t.filter($"k" === 3L).select($"v").head.getLong(0) == 111L)
    assert(t.filter($"k" === 4L).select($"v").head.getLong(0) == 222L)
  }

  test("USING subquery with an inner JOIN ... ON finds the top-level ON; quoted strings survive the scanners") {
    val (name, _) = freshTable("graft-merge-sub", 50L)
    spark.range(0, 5).select($"id".as("k"), lit(7L).as("w"))
      .createOrReplaceTempView("merge_sub_a")
    spark.range(0, 5).select($"id".as("k"), lit(3L).as("u"))
      .createOrReplaceTempView("merge_sub_b")
    val r = spark.sql(
      s"""MERGE INTO $name USING (
            SELECT a.k, a.w + b.u AS v,
                   'g=0, (raw)' AS grp
            FROM merge_sub_a a JOIN merge_sub_b b ON a.k = b.k) AS s
          ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v, grp = 'x, ''y'' = z'
          WHEN NOT MATCHED THEN INSERT *""").head
    assert(r.getLong(1) == 5L && r.getLong(3) == 0L)
    val t = spark.table(name)
    assert(t.filter($"k" < 5).select($"v").collect()
      .forall(_.getLong(0) == 10L))
    assert(t.filter($"k" === 1L).select($"grp").head.getString(0) ==
      "x, 'y' = z")
  }

  test("cardinality violation (two source rows per target key) fails loudly; NULL key fails loudly") {
    val (name, _) = freshTable("graft-merge-card", 20L)
    Seq((3L, 1L), (3L, 2L)).toDF("k", "v")
      .createOrReplaceTempView("merge_dup_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING merge_dup_src AS s
        ON $name.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e.getMessage.contains("cardinality"))
    Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
      .toDF("k", "v").createOrReplaceTempView("merge_null_src")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING merge_null_src AS s
        ON $name.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT *""")
    }
    assert(e2.getMessage.contains("NULL source key"))
  }

  test("unsupported clause shapes are rejected loudly, not misparsed") {
    val (name, _) = freshTable("graft-merge-errs", 10L)
    spark.range(0, 2).select($"id".as("k"), $"id".as("v"))
      .createOrReplaceTempView("merge_err_src")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name USING merge_err_src AS s
        ON $name.k = s.k
        WHEN MATCHED THEN INSERT *""")
    }
    assert(e1.getMessage.contains("WHEN MATCHED supports"))
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name USING merge_err_src AS s
        ON $name.k = s.k
        WHEN NOT MATCHED THEN DELETE""")
    }
    assert(e2.getMessage.contains("WHEN NOT MATCHED supports"))
    val e3 = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name USING merge_err_src AS s
        ON $name.k = s.k OR s.v = 1
        WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(e3.getMessage.contains("conjunction of key"))
  }

  test("WHEN NOT MATCHED BY SOURCE: the full-sync MERGE makes target == source in one statement") {
    val (name, root) = freshTable("graft-merge-sync", 100L)
    // desired state: keys 50..119 with v = k*10, grp 'sync'
    spark.range(50, 120)
      .select($"id".as("k"), ($"id" * 10).as("v"), lit("sync").as("grp"))
      .createOrReplaceTempView("merge_sync_src")
    val r = spark.sql(
      s"""MERGE INTO $name USING merge_sync_src AS s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE THEN DELETE""").head
    // 50 matched updates, 20 inserts, 50 by-source deletes
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((50L, 50L, 20L)),
      s"updated/deleted/inserted = $r")
    val t = spark.table(name)
    assert(t.count() == 70L)
    val want = spark.table("merge_sync_src")
    assert(t.exceptAll(want).isEmpty && want.exceptAll(t).isEmpty,
      "after the sync MERGE the table must equal the source exactly")
    // one atomic version for the whole sync
    assert(VersionedTable.history(spark, root).map(_._3)
      .count(_ == "upsert") == 1)
    // conditional BY SOURCE UPDATE (archive instead of delete)
    val (name2, _) = freshTable("graft-merge-sync2", 20L)
    spark.range(0, 5)
      .select($"id".as("k"), $"id".as("v"), lit("keep").as("grp"))
      .createOrReplaceTempView("merge_sync2_src")
    spark.sql(
      s"""MERGE INTO $name2 USING merge_sync2_src AS s ON $name2.k = s.k
          WHEN MATCHED THEN UPDATE SET grp = 'live'
          WHEN NOT MATCHED BY SOURCE AND $name2.v >= 10 THEN DELETE
          WHEN NOT MATCHED BY SOURCE THEN UPDATE SET grp = 'stale'""")
    val t2 = spark.table(name2)
    assert(t2.count() == 10L) // 5 live + 5 stale (v 5..9), v>=10 deleted
    assert(t2.filter($"grp" === "live").count() == 5L)
    assert(t2.filter($"grp" === "stale").count() == 5L)
    // UPDATE SET * is meaningless without a source row
    val e = intercept[Exception] {
      spark.sql(s"""MERGE INTO $name2 USING merge_sync2_src AS s
        ON $name2.k = s.k
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *""")
    }
    assert(e.getMessage.contains("no source row"))
  }

  test("a MERGE with DELETE racing an append restarts from a fresh read, not a stale one") {
    val (name, root) = freshTable("graft-merge-race", 200L)
    // the racing append lands a NEW row for a key this MERGE deletes:
    // the pinned-base conflict must force a statement restart whose
    // fresh read sees (and deletes) the raced copy too
    VersionedTable.beforePublishHook.set(() =>
      VersionedTable.append(
        Seq((9L, 999L, "raced")).toDF("k", "v", "grp"),
        root, Seq("k", "v"), Seq("grp")))
    Seq((9L, 0L, "del"), (11L, 5L, "upd")).toDF("k", "v", "op")
      .createOrReplaceTempView("merge_race_src")
    spark.sql(
      s"""MERGE INTO $name USING merge_race_src AS s ON $name.k = s.k
          WHEN MATCHED AND s.op = 'del' THEN DELETE
          WHEN MATCHED THEN UPDATE SET v = 777
          WHEN NOT MATCHED THEN INSERT *""")
    val t = spark.table(name)
    assert(t.filter($"k" === 9L).count() == 0L,
      "the raced duplicate of k=9 must be deleted by the restart")
    assert(t.filter($"k" === 11L).select($"v").head.getLong(0) == 777L)
    assert(t.count() == 200L - 1)
  }

  test("a NULL-key target row claimed by NOT MATCHED BY SOURCE DELETE fails loudly, never silently survives while counted") {
    val root = tmp("graft-merge-nullkey")
    VersionedTable.append(
      Seq[(java.lang.Long, Long, String)]((1L, 1L, "a"), (2L, 2L, "b"),
        (null, 3L, "c")).toDF("k", "v", "grp").coalesce(1),
      root, Seq("k", "v"), Seq("grp"))
    spark.sql(s"CREATE VERSIONED TABLE graft_merge_nullkey LOCATION " +
      s"'$root' KEYS(k)")
    Seq((1L, 10L)).toDF("k", "v")
      .createOrReplaceTempView("merge_nullkey_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql("""MERGE INTO graft_merge_nullkey USING
          merge_nullkey_src AS s ON graft_merge_nullkey.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    assert(e.getMessage.contains("NULL target key"))
    // nothing landed: the statement failed whole, not partially
    assert(spark.table("graft_merge_nullkey").count() == 3L)
  }

  test("two source rows claiming one target key with DELETE is a cardinality violation, not a silent dedup") {
    val (name, _) = freshTable("graft-merge-deldup", 10L)
    Seq((3L, 1L), (3L, 2L)).toDF("k", "v")
      .createOrReplaceTempView("merge_deldup_src")
    val e = intercept[IllegalArgumentException] {
      spark.sql(s"""MERGE INTO $name USING merge_deldup_src AS s
        ON $name.k = s.k
        WHEN MATCHED THEN DELETE""")
    }
    assert(e.getMessage.contains("cardinality"))
    assert(spark.table(name).count() == 10L)
  }

  test("unparenthesized CASE WHEN ... THEN ... END in clause conditions and backticked identifiers parse correctly") {
    val (name, _) = freshTable("graft-merge-case", 20L)
    Seq((3L, 7L), (9999L, 1L)).toDF("k", "v")
      .createOrReplaceTempView("merge_case_src")
    spark.sql(
      s"""MERGE INTO $name USING merge_case_src AS s ON $name.k = s.k
          WHEN MATCHED AND CASE WHEN s.v = 7 THEN true ELSE false END
            THEN UPDATE SET `v` = s.v + 1,
              grp = CASE WHEN s.v = 7 THEN 'hi' ELSE 'lo' END
          WHEN NOT MATCHED THEN INSERT (k, `v`) VALUES (s.k,
            CASE WHEN s.v = 1 THEN 42 ELSE 0 END)""")
    val t = spark.table(name)
    assert(t.filter($"k" === 3L).select($"v", $"grp").head ==
      org.apache.spark.sql.Row(8L, "hi"))
    assert(t.filter($"k" === 9999L).select($"v").head.getLong(0) == 42L)
  }

  test("the USING source is planned ONCE: guards, counts and the committed rows all read one pinned snapshot") {
    val (name, _) = freshTable("graft-merge-once", 10L)
    MergeSourceEvalCounter.n.set(0L)
    val tick = udf((k: Long) => {
      MergeSourceEvalCounter.n.incrementAndGet(); k
    }).asNondeterministic()
    spark.range(0, 5).repartition(1)
      .select(($"id" + 10000L).as("k"), tick($"id").as("v"))
      .createOrReplaceTempView("merge_once_src")
    val r = spark.sql(
      s"""MERGE INTO $name USING merge_once_src AS s ON $name.k = s.k
          WHEN MATCHED THEN UPDATE SET v = s.v
          WHEN MATCHED AND s.v < 0 THEN DELETE
          WHEN NOT MATCHED THEN INSERT *""").head
    assert(r.getLong(3) == 5L)
    assert(spark.table(name).filter($"k" >= 10000L).count() == 5L)
    // one evaluation of the 5-row source — the old per-clause-count
    // replanning evaluated it once per count and once for the commit
    assert(MergeSourceEvalCounter.n.get() == 5L,
      s"source evaluated ${MergeSourceEvalCounter.n.get()} row-times " +
        "for a 5-row source: the claims frame is not pinned")
  }
}

/** JVM-wide so the executor-side UDF closure and the driver-side
  * assertion see one counter (local-mode tests share the JVM).
  */
object MergeSourceEvalCounter {
  val n = new java.util.concurrent.atomic.AtomicLong(0L)
}
