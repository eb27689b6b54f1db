package graft.pipeline

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout ([[Layout]]): bit-level unit pins plus the claim the
  * operator exists for — a 2-D box predicate over a z-ordered write
  * prunes files in BOTH dimensions, where a single-column sort layout
  * prunes only its own. "Prunable" is computed from per-file min/max
  * footprints, the exact statistics parquet row-group pruning consults.
  */
class LayoutSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("spread16/zvalue16 match the reference Morton interleave bit-for-bit") {
    def spreadRef(x: Long): Long = {
      var v = x & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      (v | (v << 1)) & 0x55555555L
    }
    val cases = Seq(0L, 1L, 2L, 3L, 255L, 256L, 4095L, 65535L, 12345L)
    val got = cases.toDF("a")
      .select(Layout.spread16($"a").as("s"),
        Layout.zvalue16($"a", $"a").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cases.zip(got).foreach { case (a, (s, z)) =>
      assert(s == spreadRef(a), s"spread16($a)")
      // interleaving a value with itself sets bit pairs: z = 3 * spread
      assert(z == (spreadRef(a) | (spreadRef(a) << 1)), s"zvalue16($a,$a)")
    }
    // adjacency: z is monotone along each axis when the other is fixed
    val axis = (0L to 64L).toDF("a")
      .select(Layout.zvalue16($"a", org.apache.spark.sql.functions.lit(7L)))
      .collect().map(_.getLong(0))
    assert(axis.sliding(2).forall { case Array(p, q) => p < q })
  }

  test("spread21/zvalue21 match the reference 3-D Morton interleave bit-for-bit") {
    def spreadRef(x: Long): Long = {
      var v = x & 0x1FFFFFL
      v = (v | (v << 32)) & 0x1F00000000FFFFL
      v = (v | (v << 16)) & 0x1F0000FF0000FFL
      v = (v | (v << 8)) & 0x100F00F00F00F00FL
      v = (v | (v << 4)) & 0x10C30C30C30C30C3L
      (v | (v << 2)) & 0x1249249249249249L
    }
    val cases = Seq(0L, 1L, 2L, 7L, 255L, 4095L, 65535L, 1048575L, 2097151L)
    val got = cases.toDF("a")
      .select(Layout.spread21($"a").as("s"),
        Layout.zvalue21($"a", $"a", $"a").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    cases.zip(got).foreach { case (a, (s, z)) =>
      assert(s == spreadRef(a), s"spread21($a)")
      // interleaving a value with itself three ways sets bit triples
      assert(z == (spreadRef(a) | (spreadRef(a) << 1) | (spreadRef(a) << 2)),
        s"zvalue21($a,$a,$a)")
    }
    // 63-bit budget: the max key stays positive and uses the top triple
    val zmax = Seq(2097151L).toDF("a")
      .select(Layout.zvalue21($"a", $"a", $"a")).head.getLong(0)
    assert(zmax == 0x7FFFFFFFFFFFFFFFL && zmax > 0)
  }

  test("3-D z-order layout prunes selective probes on any of the three dimensions") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions
          .expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"),
        org.apache.spark.sql.functions
          .expr("CAST(value * 100 AS BIGINT)").as("cents"))
    val base = java.nio.file.Files.createTempDirectory("graft-layout3")
    val files = 64
    Layout.zorderWrite3(ev, "user_id", "ts_us", "cents",
      s"$base/z3", files)

    val dims = Seq("user_id", "ts_us", "cents")
    val bounds = ev.agg(
        org.apache.spark.sql.functions.min($"user_id"),
        org.apache.spark.sql.functions.max($"user_id"),
        org.apache.spark.sql.functions.min($"ts_us"),
        org.apache.spark.sql.functions.max($"ts_us"),
        org.apache.spark.sql.functions.min($"cents"),
        org.apache.spark.sql.functions.max($"cents"))
      .head.toSeq.map(_.asInstanceOf[Long])
    // ~10% box per dimension
    val boxes = dims.indices.map { i =>
      val (mn, mx) = (bounds(2 * i), bounds(2 * i + 1))
      (mn + (mx - mn) * 45 / 100, mn + (mx - mn) * 55 / 100)
    }
    // per-file joint min/max footprint over all three dims
    val fps = spark.read.parquet(s"$base/z3")
      .select(org.apache.spark.sql.functions.input_file_name().as("f"),
        $"user_id", $"ts_us", $"cents")
      .groupBy($"f")
      .agg(
        org.apache.spark.sql.functions.min($"user_id"),
        org.apache.spark.sql.functions.max($"user_id"),
        org.apache.spark.sql.functions.min($"ts_us"),
        org.apache.spark.sql.functions.max($"ts_us"),
        org.apache.spark.sql.functions.min($"cents"),
        org.apache.spark.sql.functions.max($"cents"))
      .collect()
      .map(r => (1 to 6).map(r.getLong).toSeq)
    assert(fps.length == files)
    def prunable(use: Set[Int]): Int = fps.count { fp =>
      use.forall { i =>
        fp(2 * i + 1) >= boxes(i)._1 && fp(2 * i) <= boxes(i)._2
      }
    }
    val singles = dims.indices.map(i => prunable(Set(i)))
    val box3 = prunable(Set(0, 1, 2))
    info(s"3-D z of $files files: singles=${dims.zip(singles)} box=$box3")
    singles.zip(dims).foreach { case (n, d) =>
      assert(n <= files * 6 / 10, s"3-D z layout must prune on $d alone: $n/$files")
    }
    assert(box3 <= files / 6,
      s"3-D box must prune to a small fraction: $box3/$files")
  }

  test("compactZorder folds a small-file pile into a pruned snapshot, losslessly") {
    val ev = graft.queries.Tables.events(spark, TestSpark.sfDir)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions
          .expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("events").toString
    // the ingest shape: many small, arrival-ordered (unclustered) files
    ev.repartition(200).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir)
    val beforeRows = before.count()
    val beforeFiles = before
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(beforeFiles >= 150, s"fixture must be a small-file pile: $beforeFiles")

    Layout.compactZorder(spark, dir, "user_id", "ts_us", nFiles = 16)

    val after = spark.read.parquet(dir)
    assert(after.count() == beforeRows)
    assert(after.exceptAll(ev).isEmpty && ev.exceptAll(after).isEmpty,
      "compaction must be a pure layout change")
    val afterFiles = after
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count()
    assert(afterFiles == 16, s"expected 16 compacted files, got $afterFiles")
    // the compacted snapshot prunes a 2-D box (same footprint test as the
    // direct-write case) and leaves no swap debris
    val fps = Layout.fileFootprints(spark, dir, "user_id", "ts_us")
    val bounds = ev.agg(
        org.apache.spark.sql.functions.min($"user_id"),
        org.apache.spark.sql.functions.max($"user_id"),
        org.apache.spark.sql.functions.min($"ts_us"),
        org.apache.spark.sql.functions.max($"ts_us"))
      .head.toSeq.map(_.asInstanceOf[Long])
    def box(mn: Long, mx: Long) =
      (mn + (mx - mn) * 45 / 100, mn + (mx - mn) * 55 / 100)
    val (u1, u2) = box(bounds(0), bounds(1))
    val (t1, t2) = box(bounds(2), bounds(3))
    val touched = fps.count { case (_, mnU, mxU, mnT, mxT) =>
      mxU >= u1 && mnU <= u2 && mxT >= t1 && mnT <= t2
    }
    // 16 files = 2 z-bits/dimension: a 10% box can straddle a cell border
    // in both dims plus range-partition edges — measured 6/16 (vs 5/64 at
    // 64 files in the direct-write test, where 3 bits/dim cut finer)
    assert(touched <= 16 / 2,
      s"compacted 2-D box must prune: touched $touched/16")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".staging")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(dir + ".old")),
      "compaction left swap debris")
  }

  test("compaction crashed on the promote rename recovers and converges on re-run") {
    // the same fault seam the streaming sinks are tested under: the
    // promote rename (.staging -> target) fails mid-swap, leaving no
    // target, a retired .old, and a complete .staging — recover() must
    // prefer the finished .staging and a re-run must converge
    import org.apache.hadoop.fs.Path
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.faulty.impl",
      classOf[graft.streaming.FaultyRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val ev = graft.queries.Tables.events(spark, TestSpark.sfDir)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions
          .expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val localDir = java.nio.file.Files.createTempDirectory("graft-compact-f")
      .resolve("events").toString
    val dir = s"faulty://$localDir"
    ev.repartition(40).write.mode("overwrite").parquet(dir)
    val want = ev.collect().map(_.toSeq).toSet

    graft.streaming.FaultyRenameFs.failNextPromote.set(true)
    val crash = intercept[java.io.IOException] {
      Layout.compactZorder(spark, dir, "user_id", "ts_us", nFiles = 8)
    }
    assert(crash.getMessage.contains("rename"), s"wrong failure: $crash")
    val fs = new Path(dir).getFileSystem(hconf)
    assert(!fs.exists(new Path(dir)), "crash must land between the renames")
    assert(fs.exists(new Path(dir + ".staging", "_SUCCESS")))
    assert(fs.exists(new Path(dir + ".old")))

    // re-run: recover() promotes the finished staging, then compaction
    // rewrites it again — same rows, compacted layout, no debris
    Layout.compactZorder(spark, dir, "user_id", "ts_us", nFiles = 8)
    val got = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(got == want, "post-crash re-run lost or duplicated rows")
    assert(!fs.exists(new Path(dir + ".staging")) &&
      !fs.exists(new Path(dir + ".old")), "re-run left swap debris")
  }

  test("z-order layout prunes a 2-D box in both dimensions; linear only in one") {
    val sf = TestSpark.sfDir
    val ev = graft.queries.Tables.events(spark, sf)
      .select($"event_id", $"user_id",
        org.apache.spark.sql.functions
          .expr(graft.queries.Tables.fldivExpr("ts", 1000L)).as("ts_us"))
    val Array(minU, maxU, minT, maxT) = ev
      .agg(org.apache.spark.sql.functions.min($"user_id"),
        org.apache.spark.sql.functions.max($"user_id"),
        org.apache.spark.sql.functions.min($"ts_us"),
        org.apache.spark.sql.functions.max($"ts_us"))
      .head.toSeq.map(_.asInstanceOf[Long]).toArray

    val base = java.nio.file.Files.createTempDirectory("graft-layout")
    val files = 64
    Layout.zorderWrite(ev, "user_id", "ts_us", s"$base/z", files)
    Layout.linearWrite(ev, "ts_us", s"$base/t", files)

    // a ~10% box in each dimension
    def lo(min: Long, max: Long) = min + (max - min) * 45 / 100
    def hi(min: Long, max: Long) = min + (max - min) * 55 / 100
    val (u1, u2) = (lo(minU, maxU), hi(minU, maxU))
    val (t1, t2) = (lo(minT, maxT), hi(minT, maxT))

    def prunable(dir: String, uBox: Boolean, tBox: Boolean): Int = {
      val fps = Layout.fileFootprints(spark, dir, "user_id", "ts_us")
      assert(fps.length == files, s"$dir wrote ${fps.length} files")
      fps.count { case (_, mnU, mxU, mnT, mxT) =>
        (!uBox || (mxU >= u1 && mnU <= u2)) &&
          (!tBox || (mxT >= t1 && mnT <= t2))
      }
    }

    // linear-by-time: perfect on time, hopeless on user
    val linT = prunable(s"$base/t", uBox = false, tBox = true)
    val linU = prunable(s"$base/t", uBox = true, tBox = false)
    assert(linT <= files / 4, s"time-sorted layout must prune time: $linT")
    assert(linU >= files * 9 / 10,
      s"time-sorted layout cannot prune user — expected ~all files, got $linU")

    // z-order: BOTH single-dimension probes prune meaningfully, and the
    // 2-D box touches a small fraction of files
    val zU = prunable(s"$base/z", uBox = true, tBox = false)
    val zT = prunable(s"$base/z", uBox = false, tBox = true)
    val zBox = prunable(s"$base/z", uBox = true, tBox = true)
    info(s"files touched of $files: linear(time)=[t:$linT u:$linU] " +
      s"z=[t:$zT u:$zU box:$zBox]")
    assert(zU <= files / 2, s"z layout must prune on user alone: $zU/$files")
    assert(zT <= files / 2, s"z layout must prune on time alone: $zT/$files")
    assert(zBox <= files / 4,
      s"z layout must prune the 2-D box to a small fraction: $zBox/$files")
    // and the box really needed z-ordering: the linear layout's 2-D box
    // count is its time-only count (user adds nothing)
    val linBox = prunable(s"$base/t", uBox = true, tBox = true)
    assert(zBox < linBox || linBox <= files / 16,
      s"z-order box pruning ($zBox) must beat linear ($linBox)")
  }
}
