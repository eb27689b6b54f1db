package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The full sharded inverted-index write (CorpusPipeline.writeInvertedIndex)
  * against the bounded-head query (ta_inverted_index) it stands in for:
  * the two must agree on every per-token statistic the query reports, and
  * the shard layout must support range-pruned term lookup.
  */
class ShardedIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private lazy val (outDir, report) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-index").toString
    (dir, CorpusPipeline.writeInvertedIndex(spark, sf, dir, nShards = 4))
  }

  test("manifest term ranges are ordered and support range pruning") {
    val m = spark.read.parquet(s"$outDir/inverted_manifest")
      .orderBy("min_token").collect()
    assert(m.length == report.nShards && m.nonEmpty)
    m.foreach { r =>
      assert(r.getAs[String]("min_token") <= r.getAs[String]("max_token"))
    }
    // consecutive shard ranges may touch at a boundary-straddling token
    // but never interleave — the property range-pruned lookup needs
    m.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[String]("max_token") <= b.getAs[String]("min_token"),
          s"overlapping shard ranges: $a vs $b")
      case _ =>
    }
  }

  test("written postings count equals the source (token, doc) pairs") {
    import spark.implicits._
    val written = spark.read.parquet(s"$outDir/inverted")
    val srcCount = graft.operators.TextAnalysis.postings(spark, sf).count()
    assert(written.count() == srcCount)
    assert(report.nPostings == srcCount)
    // every row carries the per-doc term frequency, always positive
    assert(written.filter($"tf_doc" <= 0).isEmpty)
  }

  test("full index reproduces the bounded-head query's per-token stats") {
    import spark.implicits._
    val fromIndex = spark.read.parquet(s"$outDir/inverted")
      .groupBy($"token")
      .agg(count(lit(1)).as("df"), sum($"tf_doc").as("tf"),
        array_join(
          expr("transform(slice(sort_array(collect_list(doc_id)), 1, 20), x -> cast(x AS string))"),
          ",").as("postings"))
    val fromQuery = graft.operators.TextAnalysis.invertedIndex.build(spark, sf)
    // collect_list here is test-scope only (sf0.001); the production read
    // path never aggregates a full posting list into one buffer
    val diff = fromIndex.join(fromQuery,
        Seq("token", "df", "tf", "postings"), "full_outer")
    assert(fromIndex.count() == fromQuery.count())
    assert(diff.count() == fromQuery.count(),
      "full-outer join must collapse to exact per-token agreement")
  }

  test("range-pruned lookup reads a strict subset of shards and misses nothing") {
    import spark.implicits._
    val all = spark.read.parquet(s"$outDir/inverted")
    val terms = all.select($"token").distinct()
      .orderBy($"token").collect().map(_.getString(0))
    assert(terms.length > 4, "need more terms than shards for pruning to show")
    var prunedForSome = false
    for (term <- Seq(terms.head, terms(terms.length / 2), terms.last)) {
      val (files, postings) = CorpusPipeline.lookupTerm(spark, outDir, term)
      val expected = all.filter($"token" === term)
        .select($"doc_id", $"tf_doc").orderBy($"doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = postings.select($"doc_id", $"tf_doc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == expected, s"lookup('$term') diverged from full scan")
      assert(files.nonEmpty && files.length <= report.nShards)
      if (files.length < report.nShards) prunedForSome = true
    }
    assert(prunedForSome,
      "manifest pruning never skipped a shard — range pruning is inert")
    // a term outside every range touches zero files and returns empty
    val (noFiles, empty) = CorpusPipeline.lookupTerm(spark, outDir, "￿")
    assert(noFiles.isEmpty && empty.isEmpty)
  }

  test("delta append + compaction serve the same postings as a full rebuild") {
    import spark.implicits._
    // split the corpus into a base half and an arriving batch
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val baseSf = java.nio.file.Files.createTempDirectory("graft-ix-base").toString
    val newSf = java.nio.file.Files.createTempDirectory("graft-ix-new").toString
    docs.filter($"doc_id" <= mid).write.parquet(s"$baseSf/documents.parquet")
    docs.filter($"doc_id" > mid).write.parquet(s"$newSf/documents.parquet")

    val ixDir = java.nio.file.Files.createTempDirectory("graft-ix-inc").toString
    val base = CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)
    val delta = CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    assert(base.nPostings > 0 && delta.nPostings > 0)

    // ground truth: a from-scratch index over the full corpus
    val fullDir = java.nio.file.Files.createTempDirectory("graft-ix-full").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, fullDir, nShards = 4)

    def served(dir: String, term: String): Seq[(Long, Long)] =
      CorpusPipeline.lookupTerm(spark, dir, term)._2
        .select($"doc_id", $"tf_doc")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val terms = spark.read.parquet(s"$fullDir/inverted")
      .select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0))
    val probeTerms = Seq(terms.head, terms(terms.length / 2), terms.last)
    for (t <- probeTerms)
      assert(served(ixDir, t) == served(fullDir, t),
        s"base+delta lookup('$t') != full rebuild")

    // compaction folds the delta in and removes it; lookups unchanged
    val compacted = CorpusPipeline.compact(spark, ixDir, nShards = 4)
    assert(compacted.nPostings == base.nPostings + delta.nPostings)
    val fs = new org.apache.hadoop.fs.Path(ixDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ixDir/delta")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ixDir/delta_manifest")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$ixDir/inverted.old")))
    for (t <- probeTerms)
      assert(served(ixDir, t) == served(fullDir, t),
        s"post-compaction lookup('$t') != full rebuild")
  }

  test("compact never folds an uncommitted orphan delta; its retry appends exactly once") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val Seq(p33, p66) = Seq(0.33, 0.66).map(q =>
      docs.agg(expr(s"percentile(doc_id, $q)")).head().getDouble(0))
    val baseSf = java.nio.file.Files.createTempDirectory("graft-ixo-b").toString
    val b1Sf = java.nio.file.Files.createTempDirectory("graft-ixo-1").toString
    val bxSf = java.nio.file.Files.createTempDirectory("graft-ixo-x").toString
    docs.filter($"doc_id" <= p33).write.parquet(s"$baseSf/documents.parquet")
    docs.filter($"doc_id" > p33 && $"doc_id" <= p66)
      .write.parquet(s"$b1Sf/documents.parquet")
    docs.filter($"doc_id" > p66).write.parquet(s"$bxSf/documents.parquet")
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ixo").toString
    CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)
    CorpusPipeline.appendBatch(spark, ixDir, b1Sf, "b1", nShards = 2)

    // a crashed appendBatch for 'bx': delta files exist (with a
    // footer-less straggler) but the manifest append never ran
    val orphan = new java.io.File(s"$ixDir/delta/batch=bx")
    orphan.mkdirs()
    spark.read.parquet(s"$ixDir/delta/batch=b1").limit(5)
      .write.mode("overwrite").parquet(s"$ixDir/delta/batch=bx/inner")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$ixDir/delta/batch=bx/part-garbage.parquet"),
      "not a parquet footer".getBytes)

    // the triggered compaction must DELETE the orphan, not fold it —
    // folding would give it no folded_batches record and its retry would
    // double every posting
    CorpusPipeline.compact(spark, ixDir, nShards = 4)
    assert(!orphan.exists(), "orphan delta dir survived compaction")
    // ground truth after compaction: base+b1 only (the orphan is gone)
    val truthDir = java.nio.file.Files.createTempDirectory("graft-ixo-t").toString
    val truthSf = java.nio.file.Files.createTempDirectory("graft-ixo-ts").toString
    docs.filter($"doc_id" <= p66).write.parquet(s"$truthSf/documents.parquet")
    CorpusPipeline.writeInvertedIndex(spark, truthSf, truthDir, nShards = 4)
    val probe = spark.read.parquet(s"$truthDir/inverted")
      .groupBy($"token").count().orderBy($"count".desc).head().getString(0)
    def served(dir: String) = CorpusPipeline.lookupTerm(spark, dir, probe)._2
      .select($"doc_id", $"tf_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(served(ixDir) == served(truthDir),
      "post-compaction lookup diverged from base+b1 truth")

    // the batch's retry (it never committed) appends exactly once: the
    // full corpus serves with each doc exactly once
    CorpusPipeline.appendBatch(spark, ixDir, bxSf, "bx", nShards = 2)
    val fullDir = java.nio.file.Files.createTempDirectory("graft-ixo-f").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, fullDir, nShards = 4)
    assert(served(ixDir) == served(fullDir),
      "retried orphan batch did not serve exactly the full corpus")
  }

  test("each appendBatch commits its manifest as a single file") {
    import spark.implicits._
    val baseSf = java.nio.file.Files.createTempDirectory("graft-ixm-b").toString
    spark.read.parquet(s"$sf/documents.parquet").filter($"doc_id" < 100)
      .write.parquet(s"$baseSf/documents.parquet")
    val newSf = java.nio.file.Files.createTempDirectory("graft-ixm-n").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 100 && $"doc_id" < 200)
      .write.parquet(s"$newSf/documents.parquet")
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ixm").toString
    CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)
    CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 4)
    // the manifest rows are the batch's COMMIT POINT: one part file per
    // batch makes the commit promotion atomic; a multi-file commit could
    // crash half-promoted and be accepted as complete by the retry
    val parts = new java.io.File(s"$ixDir/delta_manifest").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts.length == 1,
      s"manifest commit is ${parts.length} files, not atomic-single")
  }

  test("appendBatch without a base fails loudly at the append") {
    val emptyIx = java.nio.file.Files.createTempDirectory("graft-ixe").toString
    val e = intercept[IllegalArgumentException] {
      CorpusPipeline.appendBatch(spark, emptyIx, sf, "b1", nShards = 2)
    }
    assert(e.getMessage.contains("writeInvertedIndex"), e.getMessage)
  }

  test("a fresh base build starts a new index life: recycled batch ids append for real") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val baseSf = java.nio.file.Files.createTempDirectory("graft-ixl-b").toString
    val newSf = java.nio.file.Files.createTempDirectory("graft-ixl-n").toString
    docs.filter($"doc_id" <= mid).write.parquet(s"$baseSf/documents.parquet")
    docs.filter($"doc_id" > mid).write.parquet(s"$newSf/documents.parquet")

    // first life: base + delta 'b1', compacted (folds 'b1' and records it)
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ixl").toString
    CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)
    CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    CorpusPipeline.compact(spark, ixDir, nShards = 4)

    // second life in the same dir: the base rebuild must retire the old
    // life's folded_batches record, so re-using the id 'b1' appends for
    // real instead of silently no-opping with the stale recorded report
    val base2 = CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)
    val delta2 = CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    assert(delta2.nPostings > 0 && delta2.nPostings != base2.nPostings,
      "recycled batch id silently no-opped against a stale folded record")
    // and the appended postings actually serve
    val probe = spark.read.parquet(s"$newSf/documents.parquet")
      .select(explode(split(lower(trim($"text")), "\\s+")).as("t"))
      .filter(length($"t") > 0).groupBy($"t").count()
      .orderBy($"count".desc).head().getString(0)
    assert(CorpusPipeline.lookupTerm(spark, ixDir, probe)._2
      .filter($"doc_id" > mid).limit(1).count() > 0,
      "second-life delta postings not served")
  }

  test("compaction crash on the promote rename recovers to a consistent index") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // real fault injection on the rename seam (same FaultyRenameFs the
    // streaming snapshot-swap spec uses): the promote rename of
    // inverted.staging fails mid-compact, and recovery must roll the
    // completed staging forward — including deleting the folded-in
    // deltas, or lookups would double-count postings
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.faulty.impl", classOf[graft.streaming.FaultyRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val localDir = java.nio.file.Files.createTempDirectory("graft-ix-crash").toString
    val ixDir = s"faulty://$localDir/ix"
    CorpusPipeline.writeInvertedIndex(spark, sf, ixDir, nShards = 4)
    CorpusPipeline.appendBatch(spark, ixDir, sf, "b1", nShards = 2)
    def serveAll(dir: String): Map[String, Long] = {
      // postings per token through the pruned lookup path
      val terms = spark.read.parquet(s"$dir/inverted")
        .select($"token").distinct().collect().map(_.getString(0))
      terms.map(t =>
        t -> CorpusPipeline.lookupTerm(spark, dir, t)._2.count()).toMap
    }
    val before = serveAll(ixDir)

    graft.streaming.FaultyRenameFs.failNextPromote.set(true)
    val e = intercept[java.io.IOException] {
      CorpusPipeline.compact(spark, ixDir, nShards = 4)
    }
    assert(e.getMessage.contains("rename"), e.getMessage)
    assert(!graft.streaming.FaultyRenameFs.failNextPromote.get, "fault must fire")
    val fs = new Path(ixDir).getFileSystem(hconf)
    assert(!fs.exists(new Path(s"$ixDir/inverted")),
      "crash must land between retire and promote")
    assert(fs.exists(new Path(s"$ixDir/inverted.staging/_SUCCESS")))

    // recovery rolls the staged base forward and retires the deltas
    CorpusPipeline.recoverIndex(spark, ixDir)
    assert(fs.exists(new Path(s"$ixDir/inverted")))
    assert(!fs.exists(new Path(s"$ixDir/delta")) &&
      !fs.exists(new Path(s"$ixDir/delta_manifest")),
      "rolled-forward base already contains the deltas")
    assert(!fs.exists(new Path(s"$ixDir/inverted.old")) &&
      !fs.exists(new Path(s"$ixDir/inverted.staging")))
    assert(serveAll(ixDir) == before,
      "post-recovery lookups must serve the same postings")
    // idempotent: a second recovery on the healthy index is a no-op
    CorpusPipeline.recoverIndex(spark, ixDir)
    assert(serveAll(ixDir) == before)
  }

  private def servedPostings(dir: String, term: String): Seq[(Long, Long)] = {
    import spark.implicits._
    CorpusPipeline.lookupTerm(spark, dir, term)._2
      .select($"doc_id", $"tf_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("tombstone delete hides docs immediately; compaction drops them physically") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ix-tomb").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, ixDir, nShards = 4)
    val all = spark.read.parquet(s"$ixDir/inverted")
    val terms = all.select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0))
    val probeTerms = Seq(terms.head, terms(terms.length / 2), terms.last)
    // victims: two docs that actually carry the middle probe term, so the
    // delete is observable through the pruned lookup
    val victims = all.filter($"token" === probeTerms(1))
      .select($"doc_id").distinct().orderBy($"doc_id")
      .limit(2).collect().map(_.getLong(0)).toSeq
    assert(victims.size == 2)

    CorpusPipeline.deleteDocs(spark, ixDir, victims)
    // visible immediately, before any compaction
    assert(servedPostings(ixDir, probeTerms(1)).forall(p => !victims.contains(p._1)))

    // ground truth: a from-scratch index over the corpus minus the victims
    val prunedSf = java.nio.file.Files.createTempDirectory("graft-ix-psf").toString
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(!$"doc_id".isin(victims: _*))
      .write.parquet(s"$prunedSf/documents.parquet")
    val refDir = java.nio.file.Files.createTempDirectory("graft-ix-ref").toString
    val ref = CorpusPipeline.writeInvertedIndex(spark, prunedSf, refDir, nShards = 4)
    for (t <- probeTerms)
      assert(servedPostings(ixDir, t) == servedPostings(refDir, t),
        s"tombstoned lookup('$t') != rebuild-without-docs")

    // idempotent: re-deleting the same ids changes nothing
    CorpusPipeline.deleteDocs(spark, ixDir, victims)
    assert(servedPostings(ixDir, probeTerms(1)) == servedPostings(refDir, probeTerms(1)))

    // tombstone-only compaction (no pending delta) drops postings physically
    val rep = CorpusPipeline.compact(spark, ixDir, nShards = 4)
    val fs = new Path(ixDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$ixDir/tombstones")), "compaction retires tombstones")
    assert(spark.read.parquet(s"$ixDir/inverted")
      .filter($"doc_id".isin(victims: _*)).isEmpty,
      "tombstoned postings must be physically gone after compaction")
    assert(rep.nPostings == ref.nPostings)
    for (t <- probeTerms)
      assert(servedPostings(ixDir, t) == servedPostings(refDir, t),
        s"post-compaction lookup('$t') != rebuild-without-docs")
  }

  test("oversized tombstone set: lookup degrades to an un-hinted anti-join, stays correct, flags compaction") {
    import spark.implicits._
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ix-otomb").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, ixDir, nShards = 4)
    val all = spark.read.parquet(s"$ixDir/inverted")
    val term = all.select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0)).apply(1)
    val victims = all.filter($"token" === term)
      .select($"doc_id").distinct().orderBy($"doc_id")
      .limit(3).collect().map(_.getLong(0)).toSeq
    assert(victims.size == 3)
    CorpusPipeline.deleteDocs(spark, ixDir, victims)

    // limit below the tombstone count simulates a set past the broadcast
    // bound without writing 5M rows
    val limit = victims.size - 1L
    assert(CorpusPipeline.compactionDue(spark, ixDir, limit))
    assert(!CorpusPipeline.compactionDue(spark, ixDir)) // default bound not hit

    val over = CorpusPipeline.lookupTerm(spark, ixDir, term, limit)._2
    val under = CorpusPipeline.lookupTerm(spark, ixDir, term)._2
    // the over-limit plan must NOT carry a forced broadcast hint on the
    // tombstone side (AQE may still choose broadcast from measured sizes —
    // the point is the driver no longer promises it)
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(!hinted(over), "over-limit lookup must drop the broadcast hint")
    assert(hinted(under), "under-limit lookup keeps the broadcast hint")
    // both strategies serve identical live postings
    val served = over.select($"doc_id", $"tf_doc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == servedPostings(ixDir, term))
    assert(served.forall(p => !victims.contains(p._1)))
  }

  test("crash inside post-swap cleanup leaves a state recovery can finish") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // the ADVICE scenario: the swap completed (new base live) but cleanup
    // crashed on its FIRST delete, leaving delta + delta_manifest +
    // tombstones + .old markers all present. Without the ordered cleanup
    // and the .old-keyed recovery branch, a lookup double-counts the
    // folded-in deltas and a later compact double-folds them.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.faulty.impl", classOf[graft.streaming.FaultyRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val localDir = java.nio.file.Files.createTempDirectory("graft-ix-clnup").toString
    val ixDir = s"faulty://$localDir/ix"
    CorpusPipeline.writeInvertedIndex(spark, sf, ixDir, nShards = 4)
    CorpusPipeline.appendBatch(spark, ixDir, sf, "b1", nShards = 2)
    val fs = new Path(ixDir).getFileSystem(hconf)
    val victims = spark.read.parquet(s"$ixDir/inverted")
      .select($"doc_id").distinct().orderBy($"doc_id")
      .limit(2).collect().map(_.getLong(0)).toSeq
    CorpusPipeline.deleteDocs(spark, ixDir, victims)

    def serveAll(dir: String): Map[String, Long] = {
      val terms = spark.read.parquet(s"$dir/inverted")
        .select($"token").distinct().collect().map(_.getString(0))
      terms.map(t =>
        t -> CorpusPipeline.lookupTerm(spark, dir, t)._2.count()).toMap
    }
    val before = serveAll(ixDir)

    graft.streaming.FaultyRenameFs.failNextDeleteSuffix.set("delta_manifest")
    val e = intercept[java.io.IOException] {
      CorpusPipeline.compact(spark, ixDir, nShards = 4)
    }
    assert(e.getMessage.contains("injected delete failure"), e.getMessage)
    assert(graft.streaming.FaultyRenameFs.failNextDeleteSuffix.get() == null,
      "fault must fire")
    // the crash state the ADVICE described: new base live, remnants present
    assert(fs.exists(new Path(s"$ixDir/inverted")) &&
      fs.exists(new Path(s"$ixDir/inverted.old")) &&
      fs.exists(new Path(s"$ixDir/delta")) &&
      fs.exists(new Path(s"$ixDir/delta_manifest")) &&
      fs.exists(new Path(s"$ixDir/tombstones")))

    CorpusPipeline.recoverIndex(spark, ixDir)
    for (d <- Seq("delta", "delta_manifest", "tombstones",
        "inverted.old", "inverted_manifest.old"))
      assert(!fs.exists(new Path(s"$ixDir/$d")), s"$d must be cleaned up")
    assert(serveAll(ixDir) == before,
      "recovered index must serve exactly the pre-compaction live postings")
    // and a fresh append + compact on the recovered index works end-to-end
    CorpusPipeline.appendBatch(spark, ixDir, sf, "b2", nShards = 2)
    CorpusPipeline.compact(spark, ixDir, nShards = 4)
    assert(!fs.exists(new Path(s"$ixDir/delta")))
  }

  test("appendBatch recovers a half-appended batch and a committed retry is a no-op") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val mid = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
    val baseSf = java.nio.file.Files.createTempDirectory("graft-ab-base").toString
    val newSf = java.nio.file.Files.createTempDirectory("graft-ab-new").toString
    docs.filter($"doc_id" <= mid).write.parquet(s"$baseSf/documents.parquet")
    docs.filter($"doc_id" > mid).write.parquet(s"$newSf/documents.parquet")
    val ixDir = java.nio.file.Files.createTempDirectory("graft-ab-ix").toString
    CorpusPipeline.writeInvertedIndex(spark, baseSf, ixDir, nShards = 4)

    val r1 = CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    val fs = new Path(ixDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: delta files written, manifest append never happened —
    // the orphan postings must be invisible to lookup and a retry must
    // rewrite them instead of failing forever on errorifexists
    fs.delete(new Path(s"$ixDir/delta_manifest"), true)
    val fullDir = java.nio.file.Files.createTempDirectory("graft-ab-full").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, fullDir, nShards = 4)
    val probe = spark.read.parquet(s"$fullDir/inverted")
      .select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0))
    val probeTerms = Seq(probe.head, probe(probe.length / 2), probe.last)

    val r2 = CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    assert(r2.nPostings == r1.nPostings, "rewritten batch must carry the same postings")
    for (t <- probeTerms)
      assert(servedPostings(ixDir, t) == servedPostings(fullDir, t),
        s"post-recovery lookup('$t') != full rebuild")

    // batch already committed → the retry is an idempotent no-op
    val r3 = CorpusPipeline.appendBatch(spark, ixDir, newSf, "b1", nShards = 2)
    assert(r3.nPostings == r1.nPostings && r3.nShards == r2.nShards)
    val man = spark.read.parquet(s"$ixDir/delta_manifest")
    assert(man.count() == man.select($"file").distinct().count(),
      "no duplicate manifest rows after the retry")
    for (t <- probeTerms)
      assert(servedPostings(ixDir, t) == servedPostings(fullDir, t))
  }

  test("appendBatch auto-compacts past the delta bound; crash between trigger and swap recovers") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    // no manual compact() call anywhere in this test: the writer maintains
    // its own index. maxDeltaBatches=0 makes every append trigger the
    // compaction; the first one crashes on the promote rename (real fault
    // injection on the rename seam) and the NEXT append's entry recovery
    // must repair the index before appending and compacting again.
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setClass("fs.faulty.impl", classOf[graft.streaming.FaultyRenameFs],
      classOf[org.apache.hadoop.fs.FileSystem])
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val qs = docs.stat.approxQuantile("doc_id", Array(0.34, 0.67), 0.0)
    val (q1, q2) = (qs(0), qs(1))
    val parts = Seq(
      docs.filter($"doc_id" <= q1),
      docs.filter($"doc_id" > q1 && $"doc_id" <= q2),
      docs.filter($"doc_id" > q2))
    val sfDirs = parts.zipWithIndex.map { case (p, i) =>
      val d = java.nio.file.Files.createTempDirectory(s"graft-ac-$i").toString
      p.write.parquet(s"$d/documents.parquet")
      d
    }
    val localDir = java.nio.file.Files.createTempDirectory("graft-ac-ix").toString
    val ixDir = s"faulty://$localDir/ix"
    CorpusPipeline.writeInvertedIndex(spark, sfDirs(0), ixDir, nShards = 4)

    // append 1: commits, then its auto-compaction crashes on the promote
    graft.streaming.FaultyRenameFs.failNextPromote.set(true)
    val e = intercept[java.io.IOException] {
      CorpusPipeline.appendBatch(spark, ixDir, sfDirs(1), "b1",
        nShards = 2, maxDeltaBatches = 0)
    }
    assert(e.getMessage.contains("rename"), e.getMessage)
    val fs = new Path(ixDir).getFileSystem(hconf)
    assert(fs.exists(new Path(s"$ixDir/inverted.staging/_SUCCESS")),
      "crash must land mid-swap with a complete staging")

    // append 2: entry recovery rolls the crashed swap forward (b1 folded),
    // then appends b2 and auto-compacts it too
    val r2 = CorpusPipeline.appendBatch(spark, ixDir, sfDirs(2), "b2",
      nShards = 2, maxDeltaBatches = 0)
    assert(r2.nPostings > 0)
    assert(!fs.exists(new Path(s"$ixDir/delta")) &&
      !fs.exists(new Path(s"$ixDir/delta_manifest")) &&
      !fs.exists(new Path(s"$ixDir/inverted.staging")) &&
      !fs.exists(new Path(s"$ixDir/inverted.old")),
      "auto-compaction must leave a clean single-base index")

    // the twice-auto-compacted index serves exactly a full rebuild
    val fullDir = java.nio.file.Files.createTempDirectory("graft-ac-full").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, fullDir, nShards = 4)
    val terms = spark.read.parquet(s"$fullDir/inverted")
      .select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0))
    for (t <- Seq(terms.head, terms(terms.length / 2), terms.last))
      assert(servedPostings(ixDir, t) == servedPostings(fullDir, t),
        s"auto-compacted lookup('$t') != full rebuild")

    // a retry of the folded batch is a no-op serving the recorded report,
    // never a double append
    val r1Retry = CorpusPipeline.appendBatch(spark, ixDir, sfDirs(1), "b1",
      nShards = 2, maxDeltaBatches = 0)
    assert(r1Retry.nPostings > 0, "folded-batch retry must serve the recorded report")
    assert(!fs.exists(new Path(s"$ixDir/delta")),
      "folded-batch retry must not re-append")
    for (t <- Seq(terms.head, terms.last))
      assert(servedPostings(ixDir, t) == servedPostings(fullDir, t))
  }

  test("deleteDocs auto-compacts an over-bound tombstone set physically") {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val ixDir = java.nio.file.Files.createTempDirectory("graft-adt-ix").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, ixDir, nShards = 4)
    val all = spark.read.parquet(s"$ixDir/inverted")
    val term = all.select($"token").distinct().orderBy($"token")
      .collect().map(_.getString(0)).apply(1)
    val victims = all.filter($"token" === term)
      .select($"doc_id").distinct().orderBy($"doc_id")
      .limit(2).collect().map(_.getLong(0)).toSeq
    // limit 0: the delete itself trips the bound and compacts inline —
    // no manual compact() call, no caller polling
    CorpusPipeline.deleteDocs(spark, ixDir, victims, tombstoneBroadcastLimit = 0L)
    val fs = new Path(ixDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$ixDir/tombstones")),
      "auto-compaction must retire the tombstones")
    assert(spark.read.parquet(s"$ixDir/inverted")
      .filter($"doc_id".isin(victims: _*)).isEmpty,
      "tombstoned postings must be physically gone")
    assert(servedPostings(ixDir, term).forall(p => !victims.contains(p._1)))
  }

  test("shard files are internally sorted by (token, doc_id)") {
    import spark.implicits._
    val byFile = spark.read.parquet(s"$outDir/inverted")
      .select(input_file_name().as("f"), $"token", $"doc_id")
      .collect().groupBy(_.getString(0))
    byFile.values.foreach { rows =>
      val keys = rows.map(r => (r.getString(1), r.getLong(2))).toSeq
      assert(keys == keys.sorted,
        "rows within a shard file must be sorted for contiguous posting runs")
    }
  }
}
