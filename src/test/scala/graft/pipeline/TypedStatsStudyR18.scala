package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 typed-statistics study — files skipped on a BY-LANGUAGE
  * layout, the shape every real corpus serves (filter by language /
  * source / date before anything else):
  *
  *   sbt "Test/runMain graft.pipeline.TypedStatsStudyR18"
  *
  * Fixture: 200k docs over 10 languages, appended one language-PAIR
  * shard at a time (5 appends — so the manifest list's per-shard
  * aggregate string bounds are disjoint and the LIST alone can prune
  * whole shards), 8 files per append = 40 files. Probes run through
  * plain `spark.sql` over [[VersionedTable.sqlRead]] — the pushed
  * string predicates become manifest probes in the FileIndex; without
  * typed bounds every one of these queries scans all 40 files.
  *
  * Asserted: every probe's rows equal the brute filter's, equality
  * keeps ≤ files-per-lang + rounding, the IN-list keeps ≤ 2×that, and
  * the 100 TB reading: a one-language query over a K-language corpus
  * reads ~1/K of the files, so the scan cost tracks the ANSWER size,
  * not the corpus size.
  */
object TypedStatsStudyR18 {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory("graft-typed-study").resolve("t").toString
    val n = 200000L
    // 5 appends of two languages each: per-shard aggregate bounds are
    // language-pair-disjoint, per-file bounds single-language
    (0 until 5).foreach { g =>
      val part = spark.range(0, n)
        .filter($"id" % 10 === g * 2 || $"id" % 10 === g * 2 + 1)
        .select($"id".as("doc_id"),
          concat(lit("lang_"), format_string("%02d", $"id" % 10))
            .as("lang"),
          ($"id" % 5000).as("n_chars"))
        .repartitionByRange(8, $"lang", $"doc_id")
      VersionedTable.append(part, root, Seq("doc_id", "n_chars"),
        Seq("lang"))
    }
    val (df, Seq(index)) =
      VersionedTable.sqlReadWithIndexes(spark, root, None)
    df.createOrReplaceTempView("study_vt")
    val total = spark.sql("SELECT count(*) FROM study_vt").head.getLong(0)
    require(total == n, s"fixture: $total")
    val allFiles = index.lastKeptFiles
    println(f"layout: $allFiles files, 5 shards, 10 languages, $n%,d rows")

    def probe(label: String, where: String, expect: Long => Boolean)
        : (String, Int) = {
      val rows = spark.sql(
        s"SELECT count(*) FROM study_vt WHERE $where").head.getLong(0)
      val brute = (0L until n).count(id => expect(id)).toLong
      require(rows == brute, s"$label: $rows != $brute")
      println(f"$label%-28s kept ${index.lastKeptFiles}%3d/$allFiles files" +
        f"  ($rows%,d rows)")
      (label, index.lastKeptFiles)
    }

    val eq = probe("lang = 'lang_03'", "lang = 'lang_03'", _ % 10 == 3)
    val in2 = probe("lang IN (2 values)",
      "lang IN ('lang_01', 'lang_08')", id => id % 10 == 1 || id % 10 == 8)
    val rg = probe("lang BETWEEN 04 AND 06",
      "lang >= 'lang_04' AND lang <= 'lang_06'",
      id => id % 10 >= 4 && id % 10 <= 6)
    val and = probe("lang eq AND n_chars box",
      "lang = 'lang_02' AND n_chars >= 1000 AND n_chars <= 1999",
      id => id % 10 == 2 && id % 5000 >= 1000 && id % 5000 <= 1999)

    val perLang = allFiles / 10
    require(eq._2 <= perLang + 2, s"equality kept ${eq._2}")
    require(in2._2 <= 2 * (perLang + 2), s"IN kept ${in2._2}")
    require(rg._2 <= 3 * (perLang + 2), s"range kept ${rg._2}")
    require(and._2 <= eq._2, "a conjoined box must only narrow")
    println("typed-stats study: all bounds hold — a one-language query " +
      "reads ~1/10 of a 10-language corpus's files")
    spark.stop()
  }
}
