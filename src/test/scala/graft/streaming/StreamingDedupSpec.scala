package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming admission filter must equal the SEQUENTIAL GREEDY over
  * arrival order: walking docs in (batch, doc_id) order, keep a doc iff
  * it has no already-kept near-dup (word-3-gram Jaccard ≥ 0.6). The
  * reference greedy here is computed independently — exact brute-force
  * all-pairs relation (no df cap, no banding), then a driver-side walk —
  * so the pipeline's capped candidate generation, store partitioning,
  * and peeling loop are all under test at once.
  */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Exact near-dup relation on the full corpus: brute-force all-pairs
    * (fine at 500 docs), uncapped, J ≥ 0.6.
    */
  private def exactPairs(): Set[(Long, Long)] = {
    val sh = graft.operators.Dedup.hashedShinglesOf(
      spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"))
    val a = sh.select($"doc_id".as("a_id"), $"shingles".as("sa"))
    val b = sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
    a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"sa", $"sb")).as("ni"),
        size($"sa").as("na"), size($"sb").as("nb"))
      .filter(($"ni".cast("double") / ($"na" + $"nb" - $"ni")) >= 0.6)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  /** Driver-side sequential greedy over an explicit arrival order. */
  private def greedy(order: Seq[Long], pairs: Set[(Long, Long)]): Set[Long] = {
    val nbrs = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val kept = scala.collection.mutable.Set[Long]()
    for (d <- order)
      if (!nbrs.getOrElse(d, Set.empty).exists(kept)) kept += d
    kept.toSet
  }

  /** Write the corpus as `nFiles` ordered files (doc_id ranges ascending
    * with file index) and return the resulting arrival order.
    */
  private def splitCorpus(srcDir: java.nio.file.Path, nFiles: Int): Seq[Long] = {
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .orderBy($"doc_id").collect()
    val ids = docs.map(_.getAs[Long]("doc_id")).toSeq
    val per = (docs.length + nFiles - 1) / nFiles
    val schema = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").schema
    docs.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      // the file source wants plain files, not parquet directories:
      // write single-part, then promote the part file
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-sdd-w$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        srcDir.resolve(f"docs-$i%03d.parquet"))
      // strictly increasing mtimes pin the file-source arrival order
      Thread.sleep(1100)
    }
    ids
  }

  test("streamed admission equals sequential greedy over arrival order") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdd-src")
    val order = splitCorpus(srcDir, 3)
    val storeDir = java.nio.file.Files.createTempDirectory("graft-sdd-st")
      .resolve("store").toString
    val keptDir = java.nio.file.Files.createTempDirectory("graft-sdd-k")
      .resolve("kept").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdd-c").toString

    StreamingDedupPipeline.ingestDedup(
      spark, srcDir.toString, storeDir, keptDir, ckpt)

    val streamed = spark.read.option("basePath", keptDir).parquet(keptDir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = greedy(order, exactPairs())
    assert(streamed == expected,
      s"missing=${expected.diff(streamed)} extra=${streamed.diff(expected)}")
    // the corpus has known near-dups, so the filter must actually drop some
    assert(streamed.size < order.size, "nothing was rejected")
    assert(streamed.nonEmpty)

    // store holds exactly the kept docs' shingle rows across batches
    val storeIds = spark.read
      .option("basePath", s"$storeDir/shingles").parquet(s"$storeDir/shingles")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val shingledKept = graft.operators.Dedup.hashedShinglesOf(
        spark.read.option("basePath", keptDir).parquet(keptDir))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(storeIds == shingledKept)

    // the maintained index reconciles with the shingle arrays: postings
    // are exactly the exploded kept arrays, df is docs-per-shingle
    val postings = spark.read.option("basePath", s"$storeDir/postings")
      .parquet(s"$storeDir/postings")
    assert(postings.select($"doc_id").distinct()
      .collect().map(_.getLong(0)).toSet == shingledKept)
    val dfFromPostings = postings.groupBy($"sh")
      .agg(count(lit(1)).as("expected"))
    val dfStored = spark.read.option("basePath", s"$storeDir/df")
      .parquet(s"$storeDir/df")
      .groupBy($"sh").agg(sum($"n").as("got"))
    assert(dfFromPostings.join(dfStored, Seq("sh"), "full")
      .filter($"expected".isNull || $"got".isNull || $"expected" =!= $"got")
      .count() == 0, "persisted df must equal docs-per-shingle over postings")

    // replay with a fresh checkpoint over the same source: deterministic
    // recompute overwrites every batch partition with identical content
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-sdd-c2").toString
    StreamingDedupPipeline.ingestDedup(
      spark, srcDir.toString, storeDir, keptDir, ckpt2)
    val replayed = spark.read.option("basePath", keptDir).parquet(keptDir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(replayed == expected, "replay must be idempotent")
  }

  test("scrub-before-admit: stream output equals batch PII redaction; raw PII never lands") {
    // the sf corpus augmented with doc_id-derived emails/IPs (the same
    // augmentation shape as ta_pii_scan, so every doc carries PII)
    val schema = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet").schema
    val aug = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .withColumn("text", concat($"text", lit(" contact user"), $"doc_id",
        lit("@mail"), $"doc_id" % 7, lit(".example.com from 10."),
        $"doc_id" % 256, lit(".0."), $"doc_id" % 100))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    // two ordered arrival files -> two micro-batches
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sds-src")
    val docs = aug.orderBy($"doc_id").collect()
    val order = docs.map(_.getAs[Long]("doc_id")).toSeq
    docs.grouped((docs.length + 1) / 2).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-sds-w$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        srcDir.resolve(f"docs-$i%03d.parquet"))
      Thread.sleep(1100)
    }
    val storeDir = java.nio.file.Files.createTempDirectory("graft-sds-st")
      .resolve("store").toString
    val keptDir = java.nio.file.Files.createTempDirectory("graft-sds-k")
      .resolve("kept").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sds-c").toString

    StreamingDedupPipeline.ingestDedup(
      spark, srcDir.toString, storeDir, keptDir, ckpt,
      scrubBeforeAdmit = true)

    // batch twin: the SAME redaction (shared definition) applied to the
    // same corpus, then the sequential greedy over the scrubbed relation
    // (admission runs on scrubbed text — the text the corpus keeps)
    val scrubbed = StreamingDedupPipeline.scrubPii(aug)
    val sh = graft.operators.Dedup.hashedShinglesOf(scrubbed)
    val a = sh.select($"doc_id".as("a_id"), $"shingles".as("sa"))
    val b = sh.select($"doc_id".as("b_id"), $"shingles".as("sb"))
    val pairs = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        size(array_intersect($"sa", $"sb")).as("ni"),
        size($"sa").as("na"), size($"sb").as("nb"))
      .filter(($"ni".cast("double") / ($"na" + $"nb" - $"ni")) >= 0.6)
      .select($"a_id", $"b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expectedIds = greedy(order, pairs)

    val kept = spark.read.option("basePath", keptDir).parquet(keptDir)
    val keptTexts = kept.select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keptTexts.keySet == expectedIds,
      s"missing=${expectedIds.diff(keptTexts.keySet)} extra=${keptTexts.keySet.diff(expectedIds)}")
    // 1) stream text == batch redaction, byte-equal per doc
    val batchTexts = scrubbed.select($"doc_id", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    keptTexts.foreach { case (id, t) =>
      assert(t == batchTexts(id), s"doc $id: stream text != batch redaction")
    }
    // 2) nothing PII-shaped was admitted (the scrub ran BEFORE admission)
    val leaked = kept.filter(
      expr(s"regexp_count(text, '${graft.operators.TextAnalysis.EmailPat.replace("\\", "\\\\")}') > 0") ||
      expr(s"regexp_count(text, '${graft.operators.TextAnalysis.IpPat.replace("\\", "\\\\")}') > 0"))
      .count()
    assert(leaked == 0, s"$leaked admitted docs still carry raw PII")
    assert(keptTexts.nonEmpty && keptTexts.size < order.size)
  }

  test("mid-stream crash replays to the same admitted set") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sddc-src")
    val order = splitCorpus(srcDir, 2)
    val storeDir = java.nio.file.Files.createTempDirectory("graft-sddc-st")
      .resolve("store").toString
    val keptDir = java.nio.file.Files.createTempDirectory("graft-sddc-k")
      .resolve("kept").toString

    // drive batch 0 manually, then simulate a crash DURING batch 1: its
    // store partition is half-written (no footer) and the checkpoint
    // never committed
    val all = spark.read.parquet(srcDir.toString).orderBy($"doc_id")
    val per = (order.size + 1) / 2
    val b0 = all.limit(per)
    val b1ids = order.drop(per)
    StreamingDedupPipeline.processBatch(b0, 0L, storeDir, keptDir)
    // half-written partitions in every store table from the crashed attempt
    for (root <- Seq("shingles", "postings", "df")) {
      val crashedPart = new java.io.File(s"$storeDir/$root/batch=1")
      crashedPart.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$storeDir/$root/batch=1/part-garbage.parquet"),
        "not a parquet footer".getBytes)
    }

    // the streaming replay (fresh checkpoint sees both files; batch ids
    // restart at 0 processing file 0 then file 1) must ignore and then
    // overwrite the garbage partition
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sddc-c").toString
    StreamingDedupPipeline.ingestDedup(
      spark, srcDir.toString, storeDir, keptDir, ckpt)

    val streamed = spark.read.option("basePath", keptDir).parquet(keptDir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val expected = greedy(order, exactPairs())
    assert(streamed == expected,
      s"missing=${expected.diff(streamed)} extra=${streamed.diff(expected)}")
  }
}
