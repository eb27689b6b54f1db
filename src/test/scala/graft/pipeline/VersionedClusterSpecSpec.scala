package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DECLARED cluster transforms (hidden partitioning) — Iceberg's
  * partition-spec idea: `append(df, root, statCols, typedStatCols,
  * clusterBy = Seq("days(ts)", "truncate(8, sid)"))` fixes a layout
  * shape the table applies on EVERY append, so fresh data prunes
  * through the manifest bounds without waiting for a manual
  * [[VersionedTable.compactClustered]]. The spec is stored in the
  * manifest, carried by every publish, restated-or-inherited by later
  * appends, and validated by the SQL CREATE's CLUSTER BY.
  */
class VersionedClusterSpecSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).resolve("t").toString

  test("plain appends under days(ts) prune a time probe with no compaction step") {
    val root = tmp("graft-cluster-days")
    // three plain appends, each covering 30 days, UNSORTED on ts —
    // without the spec each append's files would span its whole range
    (0 until 3).foreach { k =>
      VersionedTable.append(
        spark.range(0, 30000)
          // scramble row order so only the declared shape can cluster
          .select(pmod(hash($"id"), lit(30000)).as("h"), $"id")
          .select($"id".as("k"),
            timestamp_micros(($"id" % 30 + k * 30) * 86400L * 1000000L +
              $"h" * 1000L).as("ts")),
        root, Seq("k"), Seq("ts"), Seq("days(ts)"))
    }
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_days")
    val all = VersionedTable.entryNames(spark, root,
      VersionedTable.latestVersion(spark, root).get).size
    // probe one week inside the second append's range
    val got = spark.sql("""SELECT count(*) FROM vt_days
      WHERE ts >= TIMESTAMP'1970-02-10 00:00:00'
        AND ts < TIMESTAMP'1970-02-17 00:00:00'""").head.getLong(0)
    assert(got == 7000L, s"got $got")
    info(s"week probe kept ${index.lastKeptFiles}/$all files")
    assert(index.lastKeptFiles <= all / 2,
      s"days(ts)-clustered appends must prune a week probe: " +
        s"${index.lastKeptFiles}/$all")
  }

  test("truncate(8, sid) clusters string keys: probes prune and keyed DML touches few files") {
    val root = tmp("graft-cluster-trunc")
    // keep AQE from coalescing the tiny test appends into one file:
    // the observable is per-file bounds, which need >1 file per append
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      (0 until 2).foreach { _ =>
        VersionedTable.append(
          spark.range(0, 20000)
            .select(pmod(hash($"id"), lit(97)).as("scramble"), $"id")
            .select($"id".as("k"),
              format_string("doc_%05d", $"id").as("sid"),
              $"scramble".cast("long").as("v")),
          root, Seq("k", "v"), Seq("sid"), Seq("truncate(8, sid)"))
      }
    } finally spark.conf.set(coalesceKey, prev)
    val (df, Seq(index)) = VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("vt_trunc")
    val all = VersionedTable.entryNames(spark, root,
      VersionedTable.latestVersion(spark, root).get).size
    val got = spark.sql(
      "SELECT count(*) FROM vt_trunc WHERE sid = 'doc_00042'")
      .head.getLong(0)
    assert(got == 2L)
    info(s"sid point probe kept ${index.lastKeptFiles}/$all files")
    assert(index.lastKeptFiles <= math.max(2, all / 4),
      s"truncate-clustered sid probe must prune: " +
        s"${index.lastKeptFiles}/$all")
    // a banded string-key delete covers few files on FRESH appends
    val (_, matched) = VersionedTable.deleteKeysMor(spark, root, "sid",
      (100L until 150L).map(i => f"doc_$i%05d").toDF("sid"))
    assert(matched == 100L) // two appends, same sid space
    val covered = VersionedTable.morDeleteCoveredFiles(spark, root,
      VersionedTable.latestVersion(spark, root).get)
    info(s"banded key delete covers $covered/$all files")
    assert(covered <= math.max(2, all / 4),
      s"clustered fresh appends must bound the delete scope: " +
        s"$covered/$all")
  }

  test("the spec is fixed at creation, inherited by restating appends, and validated by SQL CREATE") {
    val root = tmp("graft-cluster-fixed")
    def batch = spark.range(0, 1000)
      .select($"id".as("k"), ($"id" % 50).as("b"))
    VersionedTable.append(batch, root, Seq("k", "b"), Seq.empty,
      Seq("truncate(100, k)"))
    // a later append WITHOUT restating inherits the spec
    VersionedTable.append(batch, root, Seq("k", "b"))
    assert(VersionedTable.clusterSpecOf(spark, root) ==
      Seq("truncate(100, k)"))
    // restating the SAME spec is fine; a different one is rejected
    VersionedTable.append(batch, root, Seq("k", "b"), Seq.empty,
      Seq("truncate(100, k)"))
    val e = intercept[IllegalArgumentException] {
      VersionedTable.append(batch, root, Seq("k", "b"), Seq.empty,
        Seq("days(k)"))
    }
    assert(e.getMessage.contains("cluster spec is fixed"))
    // DML carries the spec forward in the manifest
    VersionedTable.deleteRange(spark, root, Seq(("k", 0L, 9L)))
    assert(VersionedTable.clusterSpecOf(spark, root) ==
      Seq("truncate(100, k)"))
    // SQL CREATE validates a declared spec against the stored one
    spark.sql(s"CREATE VERSIONED TABLE vt_cluster_sql LOCATION '$root' " +
      "KEYS(k) CLUSTER BY (truncate(100, k))")
    val e2 = intercept[IllegalArgumentException] {
      spark.sql(s"CREATE VERSIONED TABLE vt_cluster_sql2 LOCATION " +
        s"'$root' CLUSTER BY (bucket(4, k))")
    }
    assert(e2.getMessage.contains("stored spec"))
    // unknown column and unparseable transform reject at declaration
    val e3 = intercept[IllegalArgumentException] {
      VersionedTable.append(batch, tmp("graft-cluster-bad"),
        Seq("k"), Seq.empty, Seq("days(nope)"))
    }
    assert(e3.getMessage.contains("unknown column"))
    val e4 = intercept[IllegalArgumentException] {
      VersionedTable.append(batch, tmp("graft-cluster-bad2"),
        Seq("k"), Seq.empty, Seq("zorder(k)"))
    }
    assert(e4.getMessage.contains("unparseable cluster transform"))
  }

  test("bucket(n, key) co-locates a key's rows into one file per append") {
    val root = tmp("graft-cluster-bucket")
    VersionedTable.append(
      spark.range(0, 40000)
        .select(($"id" % 200).as("k"), $"id".as("v")),
      root, Seq("k", "v"), Seq.empty, Seq("bucket(8, k)"))
    // every key's 200 rows land in exactly ONE file: the rewrite
    // amplification a keyed upsert pays is one file per touched key
    val m = VersionedTable.entryNames(spark, root, 1L)
    val filesPerKey = VersionedTable.read(spark, root)
      .withColumn("f", input_file_name())
      .groupBy($"k").agg(countDistinct($"f").as("nf"))
      .agg(max($"nf")).head.getLong(0)
    assert(filesPerKey == 1L,
      s"bucket clustering must co-locate each key: max files/key = " +
        s"$filesPerKey over ${m.size} files")
  }
}
