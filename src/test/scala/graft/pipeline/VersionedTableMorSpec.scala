package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ deletes ([[VersionedTable.deleteRangeMor]]) — the
  * Iceberg-v2 delete-file idea in range form: a delete publishes ONE
  * metadata marker (box + exact matched count + the file set it
  * applies to) instead of rewriting O(√F) data files, readers apply
  * `NOT box` to rows from the marker's files, and compaction / COW DML
  * / [[VersionedTable.materializeDeletes]] fold markers into the data.
  * Proven here: exact visible semantics on every read path, ZERO data
  * files written by the delete itself, file-scoping (rows appended
  * later inside the box survive), exact `fastCount` under overlapping
  * markers, the auto-materialization cap, never-resurrect under COW
  * DML, and a CDC mirror that stays exact across
  * mordelete/materialize versions.
  */
class VersionedTableMorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(round: Int, n: Int) =
    spark.range(round.toLong * n, round.toLong * n + n)
      .select(col("id").as("event_id"), (col("id") % 97).as("user_id"),
        (col("id") * 1000L).as("ts_us"))

  private val Stats = Seq("user_id", "ts_us", "event_id")

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  private def dataFiles(root: String): Int =
    new java.io.File(s"$root/files").listFiles()
      .count(f => f.isFile && !f.getName.startsWith("."))

  private def ids(df: DataFrame): Set[Long] =
    df.select($"event_id").as[Long].collect().toSet

  test("a mor delete is metadata-only: exact visible rows on every read path, zero data files written, exact fastCount, time travel intact") {
    val root = tmp("graft-vt-mor")
    VersionedTable.append(rows(0, 2000), root, Stats)
    VersionedTable.compactZorder(spark, root, nFiles = 8) // v2
    val before = ids(VersionedTable.read(spark, root))
    val filesBefore = dataFiles(root)

    val (v3, matched) = VersionedTable.deleteRangeMor(spark, root,
      Seq(("user_id", 10L, 30L)))
    val expectGone = before.filter(id => id % 97 >= 10 && id % 97 <= 30)
    assert(v3 == 3L && matched == expectGone.size.toLong)
    assert(dataFiles(root) == filesBefore,
      "a mor delete must write NO data files")
    assert(VersionedTable.morDeleteCount(spark, root, 3L) == 1)
    assert(VersionedTable.history(spark, root).last._3 == "mordelete")

    // every read path agrees
    val visible = before -- expectGone
    assert(ids(VersionedTable.read(spark, root)) == visible)
    assert(VersionedTable.fastCount(spark, root) == visible.size.toLong)
    assert(ids(VersionedTable.boxRead(spark, root,
      Seq(("user_id", 0L, 96L)))) == visible)
    // a point probe for a logically deleted row finds nothing;
    // for a surviving row finds it
    val gone = expectGone.head
    val kept = visible.head
    assert(VersionedTable.pointRead(spark, root, "event_id", gone).isEmpty)
    assert(ids(VersionedTable.pointRead(spark, root, "event_id", kept)) ==
      Set(kept))
    // time travel: v2 still shows everything
    assert(ids(VersionedTable.readVersion(spark, root, 2L)) == before)
    assert(VersionedTable.fastCount(spark, root, Some(2L)) == 2000L)
  }

  test("markers are FILE-scoped: rows appended after the delete survive even inside the box") {
    val root = tmp("graft-vt-mor-scope")
    VersionedTable.append(rows(0, 1000), root, Stats)
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 10L, 30L)))
    // re-append 200 rows, many with user_id INSIDE the deleted box
    VersionedTable.append(rows(0, 200), root, Stats)
    val got = VersionedTable.read(spark, root)
    val oldSurvivors = (0L until 1000L).filterNot(id =>
      id % 97 >= 10 && id % 97 <= 30)
    assert(got.count() == oldSurvivors.size + 200L,
      "appended rows inside the box must SURVIVE a prior marker")
    assert(VersionedTable.fastCount(spark, root) == got.count(),
      "fastCount must stay exact across post-marker appends")
    // in-box appended rows really are there
    val inBoxAppended = (0L until 200L).filter(id =>
      id % 97 >= 10 && id % 97 <= 30)
    assert(got.filter($"event_id" === inBoxAppended.head).count() == 1)
  }

  test("overlapping markers count once; the cap auto-materializes; materialize rewrites ONLY covered files") {
    val root = tmp("graft-vt-mor-cap")
    VersionedTable.append(rows(0, 2000), root, Stats)
    VersionedTable.compactZorder(spark, root, nFiles = 8)
    // two OVERLAPPING boxes: 10..30 then 20..40 — the second marker's
    // matched count must exclude what the first already removed
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 10L, 30L)))
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 20L, 40L)))
    val expect = (0L until 2000L).filterNot(id =>
      id % 97 >= 10 && id % 97 <= 40).toSet
    assert(ids(VersionedTable.read(spark, root)) == expect)
    assert(VersionedTable.fastCount(spark, root) == expect.size.toLong,
      "overlapping markers must never double-subtract")

    // materialize: same visible rows, markers gone, uncovered files
    // carried BY NAME
    val namesBefore = VersionedTable.entryNames(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    val mv = VersionedTable.materializeDeletes(spark, root)
    assert(VersionedTable.morDeleteCount(spark, root, mv) == 0)
    assert(VersionedTable.history(spark, root).last._3 == "materialize")
    assert(ids(VersionedTable.read(spark, root)) == expect)
    assert(VersionedTable.fastCount(spark, root) == expect.size.toLong)
    val namesAfter = VersionedTable.entryNames(spark, root, mv)
    assert(namesBefore.intersect(namesAfter).nonEmpty,
      "files no marker covered must carry by name through materialization")

    // the cap: MaxMorDeletes markers pile up, the next one triggers
    // auto-materialization first, then lands alone on the clean base.
    // Target VISIBLE event ids — a marker matching nothing publishes
    // nothing and would never fill the cap.
    val alive = expect.toSeq.sorted
    (0 until VersionedTable.MaxMorDeletes).foreach { k =>
      VersionedTable.deleteRangeMor(spark, root,
        Seq(("event_id", alive(k), alive(k))))
    }
    val latest0 = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.morDeleteCount(spark, root, latest0) ==
      VersionedTable.MaxMorDeletes)
    VersionedTable.deleteRangeMor(spark, root,
      Seq(("event_id", alive(VersionedTable.MaxMorDeletes),
        alive(VersionedTable.MaxMorDeletes))))
    val latest = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.morDeleteCount(spark, root, latest) == 1,
      "the cap must auto-materialize before the new marker lands")
    assert(VersionedTable.history(spark, root)
      .map(_._3).contains("materialize"))
  }

  test("COW delete/upsert and compaction on a marked table materialize first — logically deleted rows never resurrect") {
    val root = tmp("graft-vt-mor-cow")
    VersionedTable.append(rows(0, 1000), root, Stats)
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 10L, 30L)))
    val afterMor = ids(VersionedTable.read(spark, root))

    // COW delete of a DIFFERENT box: both deletes must hold afterwards
    val (_, d) = VersionedTable.deleteRange(spark, root,
      Seq(("user_id", 50L, 60L)))
    assert(d > 0)
    val expect = afterMor.filterNot(id => id % 97 >= 50 && id % 97 <= 60)
    assert(ids(VersionedTable.read(spark, root)) == expect,
      "the COW delete resurrected mor-deleted rows")
    val lv = VersionedTable.latestVersion(spark, root).get
    assert(VersionedTable.morDeleteCount(spark, root, lv) == 0,
      "COW DML must leave no markers behind")

    // upsert touching a mor-deleted key: the key was logically gone,
    // so the update row lands as a fresh insert (replaced == 0)
    val root2 = tmp("graft-vt-mor-ups")
    VersionedTable.append(rows(0, 1000), root2, Stats)
    val victim = (0L until 1000L).find(id => id % 97 == 15).get
    VersionedTable.deleteRangeMor(spark, root2, Seq(("user_id", 15L, 15L)))
    val updates = Seq((victim, 500000L, 1L)).toDF("event_id", "user_id", "ts_us")
    val (_, replaced) =
      VersionedTable.upsertByKey(spark, root2, updates, Seq("event_id"))
    assert(replaced == 0L,
      "upserting a mor-deleted key must insert, not replace a ghost")
    val got = VersionedTable.read(spark, root2)
      .filter($"event_id" === victim).collect()
    assert(got.length == 1 && got.head.getAs[Long]("user_id") == 500000L)

    // compaction alone also materializes
    val root3 = tmp("graft-vt-mor-cmp")
    VersionedTable.append(rows(0, 1000), root3, Stats)
    VersionedTable.deleteRangeMor(spark, root3, Seq(("user_id", 10L, 30L)))
    val visible3 = ids(VersionedTable.read(spark, root3))
    val cv = VersionedTable.compactZorder(spark, root3, nFiles = 4)
    assert(VersionedTable.morDeleteCount(spark, root3, cv) == 0)
    assert(ids(VersionedTable.read(spark, root3)) == visible3)
    assert(VersionedTable.fastCount(spark, root3) == visible3.size.toLong)
  }

  test("CDC across mordelete and materialize: the polling mirror equals readVersion at every step") {
    val root = tmp("graft-vt-mor-cdc")
    VersionedTable.append(rows(0, 500), root, Stats)                  // v1
    VersionedTable.deleteRangeMor(spark, root, Seq(("user_id", 10L, 30L))) // v2
    VersionedTable.append(rows(0, 100), root, Stats)                  // v3 (in-box rows!)
    VersionedTable.materializeDeletes(spark, root)                    // v4
    VersionedTable.deleteRangeMor(spark, root, Seq(("event_id", 0L, 5L))) // v5
    VersionedTable.compactZorder(spark, root, nFiles = 4)             // v6

    val cols = Seq($"event_id", $"user_id", $"ts_us")
    var mirror: DataFrame = null
    VersionedTable.versions(spark, root).foreach { v =>
      val batch = VersionedTable.readChangesCdc(spark, root, v - 1, v)
      val ins = batch.filter($"_change_type" === "insert").select(cols: _*)
      val del = batch.filter($"_change_type" === "delete").select(cols: _*)
      mirror = if (mirror == null) { assert(del.isEmpty); ins }
        else mirror.exceptAll(del).unionAll(ins)
      val table = VersionedTable.readVersion(spark, root, v).select(cols: _*)
      assert(mirror.exceptAll(table).isEmpty && table.exceptAll(mirror).isEmpty,
        s"CDC mirror diverged at version $v")
      // materialize and compact versions contribute NOTHING
      val kind = VersionedTable.history(spark, root).find(_._1 == v).get._3
      if (kind == "materialize" || kind == "compact")
        assert(batch.isEmpty, s"$kind at v$v must emit no CDC rows")
    }
  }

  test("equality-delete markers: inline and sidecar key sets, zero rewrites, no resurrection, exact fastCount under overlapping key+box markers") {
    val root = tmp("graft-vt-morkey")
    VersionedTable.append(rows(0, 4000), root, Stats)
    VersionedTable.compactZorder(spark, root, nFiles = 8)           // v2
    val filesBefore = dataFiles(root)
    val before = ids(VersionedTable.read(spark, root))

    // INLINE tier: a small key set rides in the manifest line
    val smallKeys = (0L until 4000L by 173L).toSeq
    val (v3, m3) = VersionedTable.deleteKeysMor(spark, root, "event_id",
      smallKeys.toDF("event_id"))
    assert(m3 == smallKeys.size.toLong)
    assert(dataFiles(root) == filesBefore,
      "an equality mor delete must write NO data files")
    assert(new java.io.File(s"$root/manifests").listFiles()
      .count(_.getName.startsWith("k-")) == 0,
      "an inline key set must not spill a sidecar")
    val afterSmall = before -- smallKeys.toSet
    assert(ids(VersionedTable.read(spark, root)) == afterSmall)
    assert(VersionedTable.fastCount(spark, root) == afterSmall.size.toLong)

    // SIDECAR tier: a key set past InlineKeyCap spills to parquet
    val bigKeys = (0L until 4000L).filter(_ % 7 == 0)
      .filterNot(smallKeys.contains)
    assert(bigKeys.size > VersionedTable.InlineKeyCap)
    val (_, mBig) = VersionedTable.deleteKeysMor(spark, root, "event_id",
      bigKeys.toDF("event_id"))
    assert(mBig == bigKeys.size.toLong)
    assert(new java.io.File(s"$root/manifests").listFiles()
      .count(_.getName.startsWith("k-")) == 1,
      "a big key set must spill exactly one sidecar")
    val afterBig = afterSmall -- bigKeys.toSet
    assert(ids(VersionedTable.read(spark, root)) == afterBig)
    assert(VersionedTable.fastCount(spark, root) == afterBig.size.toLong)

    // OVERLAPPING box marker on rows some of which the key markers
    // already deleted: matched counts only VISIBLE rows — fastCount
    // stays exact under key+box markers together
    val (_, mBox) = VersionedTable.deleteRangeMor(spark, root,
      Seq(("user_id", 0L, 20L)))
    val boxGone = afterBig.filter(_ % 97 <= 20)
    assert(mBox == boxGone.size.toLong)
    val afterBox = afterBig -- boxGone
    assert(ids(VersionedTable.read(spark, root)) == afterBox)
    assert(VersionedTable.fastCount(spark, root) == afterBox.size.toLong)

    // file-scoping: a re-append of already-deleted keys SURVIVES (the
    // markers cover only their files)
    VersionedTable.append(rows(0, 4000)
      .filter($"event_id".isin(smallKeys.take(5): _*)), root, Stats)
    val afterApp = afterBox ++ smallKeys.take(5)
    assert(ids(VersionedTable.read(spark, root)) == afterApp,
      "key markers are file-scoped: later appends survive")
    assert(VersionedTable.fastCount(spark, root) == afterApp.size.toLong)

    // materialization folds key+box markers away; nothing resurrects
    VersionedTable.materializeDeletes(spark, root)
    assert(VersionedTable.morDeleteCount(spark, root,
      VersionedTable.latestVersion(spark, root).get) == 0)
    assert(ids(VersionedTable.read(spark, root)) == afterApp,
      "materialization must not change visible rows")
    assert(VersionedTable.fastCount(spark, root) == afterApp.size.toLong)
    // a vacuum then reclaims the now-unreferenced sidecar
    VersionedTable.vacuum(spark, root, keepVersions = 1, graceMs = 0L)
    assert(new java.io.File(s"$root/manifests").listFiles()
      .count(_.getName.startsWith("k-")) == 0,
      "materialized-away sidecars must vacuum")
    // COW delete after the fold: still exact (no hidden marker state)
    val (_, cow) = VersionedTable.deleteRange(spark, root,
      Seq(("user_id", 90L, 96L)))
    assert(cow == afterApp.count(_ % 97 >= 90).toLong)
  }

  test("pointRead skips a key marker its bloom proves irrelevant; bloom positives keep it applied") {
    val root = tmp("graft-vt-morbloom")
    VersionedTable.append(rows(0, 3000), root, Stats)
    VersionedTable.compactZorder(spark, root, nFiles = 8)
    val keys = (100L until 200L).toSeq // sidecar tier (> InlineKeyCap)
    VersionedTable.deleteKeysMor(spark, root, "event_id",
      keys.toDF("event_id"))
    // a deleted key: empty result (marker applied — bloom hit)
    assert(VersionedTable.pointRead(spark, root, "event_id", 150L)
      .count() == 0L)
    // an undeleted key: found (whether the marker was skipped or
    // applied, the answer is identical — the skip is latency-only)
    assert(ids(VersionedTable.pointRead(spark, root, "event_id", 2500L))
      == Set(2500L))
    // a point read on a DIFFERENT column can never skip the marker
    assert(VersionedTable.pointRead(spark, root, "user_id", 150L % 97)
      .filter($"event_id" === 150L).count() == 0L)
    // CDC emits the key marker's rows as ordinary deletes: a replayed
    // mirror from empty equals the table
    val latest = VersionedTable.latestVersion(spark, root).get
    val cdc = VersionedTable.readChangesCdc(spark, root, 0L, latest)
    val cols = Seq($"event_id", $"user_id", $"ts_us")
    val mirror = cdc.filter($"_change_type" === "insert").select(cols: _*)
      .exceptAll(cdc.filter($"_change_type" === "delete").select(cols: _*))
    val table = VersionedTable.read(spark, root).select(cols: _*)
    assert(mirror.exceptAll(table).isEmpty && table.exceptAll(mirror).isEmpty,
      "CDC mirror must equal read() across an equality-delete version")
  }
}
