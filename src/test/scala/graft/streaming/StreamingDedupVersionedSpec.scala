package graft.streaming

import graft.TestSpark
import graft.pipeline.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dedup-at-ingest COMPOSITION ([[StreamingDedupVersionedIngest]]):
  * greedy admission in front, a [[VersionedTable]] as the landing
  * target, the posting store maintained from the table's own change
  * feed. Proven end-to-end: the table's final content equals the
  * SEQUENTIAL GREEDY over arrival order (the same independent
  * brute-force oracle StreamingDedupSpec uses), a mid-stream crash
  * after a fully processed batch replays to the identical table with
  * no duplicate rows and a consistent store, and a compaction slipped
  * BETWEEN stream runs is absorbed (an empty store delta) without
  * disturbing later admissions.
  */
class StreamingDedupVersionedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

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

  private def greedy(order: Seq[Long],
      pairs: Set[(Long, Long)]): Set[Long] = {
    val nbrs = pairs.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    val kept = scala.collection.mutable.Set[Long]()
    for (d <- order)
      if (!nbrs.getOrElse(d, Set.empty).exists(kept)) kept += d
    kept.toSet
  }

  private def splitCorpus(srcDir: java.nio.file.Path,
      nFiles: Int): Seq[Long] = {
    val src = s"${TestSpark.sfDir}/documents.parquet"
    val docs = spark.read.parquet(src).orderBy($"doc_id").collect()
    val ids = docs.map(_.getAs[Long]("doc_id")).toSeq
    val per = (docs.length + nFiles - 1) / nFiles
    val schema = spark.read.parquet(src).schema
    docs.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-sdv-w$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        srcDir.resolve(f"docs-$i%03d.parquet"))
      Thread.sleep(1100) // strictly increasing mtimes pin arrival order
    }
    ids
  }

  private def tableIds(root: String): Set[Long] =
    VersionedTable.read(spark, root)
      .select($"doc_id").as[Long].collect().toSet

  test("table content equals sequential greedy; the store is the table's view; appends carry the frontier") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdv-src")
    val order = splitCorpus(srcDir, 3)
    val root = java.nio.file.Files.createTempDirectory("graft-sdv-t")
      .resolve("t").toString
    val store = java.nio.file.Files.createTempDirectory("graft-sdv-s")
      .resolve("store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdv-c")
      .toString
    StreamingDedupVersionedIngest.ingest(spark, srcDir.toString, root,
      store, ckpt)
    val expected = greedy(order, exactPairs())
    val got = tableIds(root)
    assert(got == expected,
      s"missing=${expected.diff(got)} extra=${got.diff(expected)}")
    assert(got.size < order.size, "nothing was rejected")
    // exactly one table version per micro-batch, all appends
    assert(VersionedTable.history(spark, root).forall(_._3 == "append"))
    // the store indexed exactly the table's shingled rows
    assert(StreamingDedupVersionedIngest.storeFrontier(spark, store) ==
      VersionedTable.latestVersion(spark, root).get)
    val storeIds = spark.read
      .option("basePath", s"$store/shingles").parquet(s"$store/shingles")
      .select($"doc_id").as[Long].collect().toSet
    val shingledKept = graft.operators.Dedup.hashedShinglesOf(
      VersionedTable.read(spark, root))
      .select($"doc_id").as[Long].collect().toSet
    assert(storeIds == shingledKept,
      "the store must hold exactly the table's shingled docs")
    // the admitted corpus carries TYPED lang/source bounds: a
    // one-language SQL probe over the landed table answers exactly
    // (pruning is layout-dependent; exactness is not)
    VersionedTable.sqlRead(spark, root)
      .createOrReplaceTempView("sdv_table")
    val langs = VersionedTable.read(spark, root)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (someLang, n) = langs.head
    assert(spark.sql(
      s"SELECT count(*) FROM sdv_table WHERE lang = '$someLang'")
      .head.getLong(0) == n)
  }

  test("mid-stream crash after a fully processed batch: the replay lands nothing twice and admission stays exact") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdv2-src")
    val order = splitCorpus(srcDir, 4)
    val root = java.nio.file.Files.createTempDirectory("graft-sdv2-t")
      .resolve("t").toString
    val store = java.nio.file.Files.createTempDirectory("graft-sdv2-s")
      .resolve("store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdv2-c")
      .toString
    // crash AFTER batch 1 fully processed (append published, store
    // synced) but BEFORE its checkpoint commit — the worst window:
    // the replay must recognize the append as already landed
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    intercept[Exception] {
      StreamingDedupVersionedIngest.ingest(spark, srcDir.toString, root,
        store, ckpt, afterBatch = b =>
          if (b == 1L && crashed.compareAndSet(false, true))
            throw new RuntimeException("injected post-batch crash"))
    }
    // restart with the same checkpoint: batch 1 replays, rest follows
    StreamingDedupVersionedIngest.ingest(spark, srcDir.toString, root,
      store, ckpt)
    val expected = greedy(order, exactPairs())
    val got = tableIds(root)
    assert(got == expected,
      s"crash replay diverged: missing=${expected.diff(got)} " +
        s"extra=${got.diff(expected)}")
    // exactly once: no doc id appears twice in the table
    val n = VersionedTable.read(spark, root).count()
    assert(n == got.size.toLong, "a replayed batch landed rows twice")
    assert(VersionedTable.fastCount(spark, root) == n)
  }

  test("a compaction between stream runs is absorbed as an empty store delta; later admissions stay exact") {
    // stage all files in a holding dir; the SOURCE dir receives them
    // in two waves around the compaction (one checkpoint, one path)
    val holding = java.nio.file.Files.createTempDirectory("graft-sdv3-h")
    val order = splitCorpus(holding, 4)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-sdv3-src")
    val staged = java.nio.file.Files.list(holding).toArray
      .map(_.toString).sorted
    def moveIn(paths: Seq[String]): Unit = paths.foreach { p =>
      val f = java.nio.file.Paths.get(p)
      java.nio.file.Files.move(f, srcDir.resolve(f.getFileName))
      ()
    }
    val root = java.nio.file.Files.createTempDirectory("graft-sdv3-t")
      .resolve("t").toString
    val store = java.nio.file.Files.createTempDirectory("graft-sdv3-s")
      .resolve("store").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sdv3-c")
      .toString
    moveIn(staged.take(2).toSeq)
    StreamingDedupVersionedIngest.ingest(spark, srcDir.toString, root,
      store, ckpt)
    // maintenance between runs: a z-order compaction (pure rewrite)
    VersionedTable.compactZorder(spark, root, nFiles = 4)
    // run 2: the remaining files arrive (checkpoint skips the first two)
    moveIn(staged.drop(2).toSeq)
    StreamingDedupVersionedIngest.ingest(spark, srcDir.toString, root,
      store, ckpt)
    val expected = greedy(order, exactPairs())
    val got = tableIds(root)
    assert(got == expected,
      s"compaction disturbed admission: missing=${expected.diff(got)} " +
        s"extra=${got.diff(expected)}")
    assert(VersionedTable.history(spark, root).map(_._3)
      .contains("compact"))
  }
}
