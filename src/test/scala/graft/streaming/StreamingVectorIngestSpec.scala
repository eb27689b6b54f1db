package graft.streaming

import graft.TestSpark
import graft.operators.Similarity
import graft.pipeline.VectorIndexPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion into the persisted IVF-PQ index must be
  * indistinguishable from batch appends: after the stream drains, serving
  * equals coding the full vector set against the stored quantizer in one
  * shot — and a crashed append attempt must neither break serving in the
  * crash window nor survive the replay.
  */
class StreamingVectorIngestSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sfDir

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  /** Base index trained on vec_id < 250; the remaining vectors written to
    * `srcDir` as `nFiles` parquet files in vec_id order (one micro-batch
    * each with maxFilesPerTrigger=1).
    */
  private def baseAndBacklog(nFiles: Int): (String, String) = {
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-svi-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val ixDir = java.nio.file.Files.createTempDirectory("graft-svi-ix").toString
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, ixDir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-svi-src").toString
    val rest = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" >= 250).orderBy($"vec_id").collect()
    val per = (rest.length + nFiles - 1) / nFiles
    val schema = spark.read.parquet(s"$sf/embeddings.parquet").schema
    rest.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      // the file source wants plain files, not parquet directories:
      // write single-part, then promote the part file
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-svi-w$i")
      spark.createDataFrame(
          spark.sparkContext.parallelize(chunk.toIndexedSeq, 1), schema)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet") && p.contains("part-")).head
      java.nio.file.Files.move(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(s"$srcDir/file$i.parquet"))
    }
    (ixDir, srcDir)
  }

  /** In-memory reference: the stored quantizer applied to the FULL table
    * through the same shared builders.
    */
  private def memReference(ixDir: String): Set[(Long, Int, Long, Double)] = {
    val centroids = spark.read.parquet(s"$ixDir/centroids")
    val rcb = spark.read.parquet(s"$ixDir/codebook")
    val embAll = Similarity.embDouble(spark, sf)
    val codes = Similarity.pqCodesFrame(
      Similarity.ivfCells(spark, embAll, centroids), rcb)
    val queries = Similarity.probeResiduals(spark, embAll, centroids,
      serveAll = false, nprobe = 1)
    rows(Similarity.adcTopK(codes, rcb, queries, serveAll = false))
  }

  test("streamed backlog serves identically to one-shot coding against the stored quantizer") {
    val (ixDir, srcDir) = baseAndBacklog(nFiles = 3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svi-c").toString
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt)
    // three micro-batches appended as their own batch dirs above the base
    val batches = new java.io.File(s"$ixDir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batches == Set("batch=0", "batch=1", "batch=2", "batch=3"), batches)
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf)) ==
      memReference(ixDir))
  }

  test("auto-fold during the stream: batches absorbed mid-drain, serving unchanged") {
    val (ixDir, srcDir) = baseAndBacklog(nFiles = 4)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svi-c3").toString
    // bound 2: the drain folds at least once mid-stream (base + 2 deltas
    // trips on the second append), later batches start a new generation
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt,
      maxCodeBatches = 2)
    val batches = new java.io.File(s"$ixDir/codes").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(batches.size <= 3, s"fan-in bound not enforced: $batches")
    assert(new java.io.File(s"$ixDir/folded_batches").exists(),
      "a fold must have run during the drain")
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf)) ==
      memReference(ixDir))
  }

  test("crashed append: serving stays on the pre-append index, replay lands the batch") {
    val (ixDir, srcDir) = baseAndBacklog(nFiles = 2)
    val served0 = rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf))

    // a crash mid-append leaves a footer-less file in the STAGING dir —
    // never under codes/ — so serving in the crash window must still work
    // and must equal the pre-append index
    val crashed = new java.io.File(s"$ixDir/codes.appending/batch=1/cell=0")
    crashed.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${crashed.getPath}/part-garbage.parquet"),
      "not a parquet footer".getBytes)
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf)) == served0,
      "a crashed append's staging garbage leaked into serving")

    // the stream (fresh checkpoint) replays both files; the final index
    // must be exactly the fully-appended one
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svi-c2").toString
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt)
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf)) ==
      memReference(ixDir))
    assert(!new java.io.File(s"$ixDir/codes.appending").exists(),
      "staging remnants must not survive recovery")
  }

  test("fresh checkpoint against a lived-in index fails loudly (recycled id space)") {
    val (ixDir, srcDir) = baseAndBacklog(nFiles = 2)
    val ckpt1 = java.nio.file.Files.createTempDirectory("graft-svi-g1").toString
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt1)
    // the drained stream appended batch=1,2; a FRESH checkpoint would
    // restart ids at 1 — collide/no-op. Must refuse, not discard.
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft-svi-g2").toString
    val e = intercept[IllegalStateException] {
      StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt2)
    }
    assert(e.getMessage.contains("fresh stream checkpoint"))
    // the original checkpoint still works (drained: no new files, no-op)
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt1)
  }

  test("checkpoint from a retired index life fails loudly after a re-train") {
    val (ixDir, srcDir) = baseAndBacklog(nFiles = 2)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-svi-g3").toString
    StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt)
    val genBefore = VectorIndexPipeline.readGeneration(spark, ixDir)
    // codebook-drift re-train: new index life, new generation
    VectorIndexPipeline.writeIvfPq(spark, sf, ixDir)
    val genAfter = VectorIndexPipeline.readGeneration(spark, ixDir)
    assert(genBefore.isDefined && genAfter.isDefined && genBefore != genAfter,
      "re-train must mint a new generation")
    val e = intercept[IllegalStateException] {
      StreamingVectorIngest.ingestVectors(spark, srcDir, ixDir, ckpt)
    }
    assert(e.getMessage.contains("re-trained") ||
      e.getMessage.contains("retired index life"))
  }

  test("concurrent first binds are atomic: one winner, everyone agrees") {
    // a LEGACY index (no generation marker yet) is the worst case: the
    // racers must also agree on the minted generation, not just the
    // checkpoint marker. 8 threads × (same checkpoint) + 8 × (distinct
    // checkpoints) against one index — every bind must succeed and every
    // marker must equal the single surviving generation value.
    val ixDir = java.nio.file.Files.createTempDirectory("graft-bind-ix").toString
    val sharedCkpt = java.nio.file.Files.createTempDirectory("graft-bind-ck").toString
    val soloCkpts = (1 to 8).map(i =>
      java.nio.file.Files.createTempDirectory(s"graft-bind-s$i").toString)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val tasks = (Seq.fill(8)(sharedCkpt) ++ soloCkpts).map { ckpt =>
      pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
        def call(): Option[Throwable] = {
          gate.await()
          try { StreamingVectorIngest.bindGeneration(spark, ixDir, ckpt); None }
          catch { case t: Throwable => Some(t) }
        }
      })
    }
    gate.countDown()
    val failures = tasks.flatMap(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(failures.isEmpty, s"binds failed: ${failures.map(_.getMessage)}")
    val gen = VectorIndexPipeline.readGeneration(spark, ixDir)
    assert(gen.isDefined && gen.get.nonEmpty)
    val markers = (sharedCkpt +: soloCkpts).map { ckpt =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$ckpt/graft-index-generation")), "UTF-8")
    }
    assert(markers.toSet == Set(gen.get),
      s"every marker must equal the one minted generation; got ${markers.toSet}")
    // re-binding after the race is a no-op (already bound, same generation)
    StreamingVectorIngest.bindGeneration(spark, ixDir, sharedCkpt)
  }
}
