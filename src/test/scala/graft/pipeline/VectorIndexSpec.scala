package graft.pipeline

import graft.TestSpark
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted IVF-PQ index must serve results IDENTICAL to the
  * in-memory `ivfPqServe` path (same training, same codes, same shared
  * ADC tail), and probe-mode serving must physically read only the
  * probed cells' partitions.
  */
class VectorIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = TestSpark.sfDir

  private lazy val (ixDir, report) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-vix").toString
    (dir, VectorIndexPipeline.writeIvfPq(spark, sf, dir))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("index write covers every vector exactly once across cells") {
    val nVec = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(report.nVectors == nVec)
    // NSub code rows per vector, each vector in exactly one cell partition
    val codes = spark.read.parquet(s"$ixDir/codes")
    assert(codes.count() == nVec * 4)
    assert(codes.select($"vec_id", $"cell").distinct().count() == nVec)
    assert(report.nCells > 1, "degenerate single-cell index")
  }

  test("served-from-disk equals the in-memory path (nprobe=1 and 2, probe mode)") {
    for (np <- Seq(1, 2)) {
      val disk = rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf, nprobe = np))
      val mem = rows(Similarity.ivfPqServe(spark, sf, serveAll = false, nprobe = np))
      assert(disk == mem, s"nprobe=$np: disk-served != in-memory")
      assert(disk.nonEmpty)
    }
  }

  test("served-from-disk equals the in-memory path (serveAll)") {
    val disk = rows(VectorIndexPipeline.serveIvfPq(spark, ixDir, sf, serveAll = true))
    val mem = rows(Similarity.ivfPqServe(spark, sf, serveAll = true))
    assert(disk == mem)
    assert(disk.nonEmpty)
  }

  test("appended batch serves identically to coding the full set against the stored quantizer") {
    // train on the first half only, append the second half as a batch
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-vix-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-vix-a").toString
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, dir)
    val second = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" >= 250)
    val rep = VectorIndexPipeline.appendVectors(spark, dir, second, "1")
    assert(rep.nVectors == spark.read.parquet(s"$sf/embeddings.parquet").count())

    val disk = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf, nprobe = 1))
    // reference: the SAME stored quantizer applied to the full table in
    // memory, through the same shared builders — appending must be
    // indistinguishable from having coded everything at once
    val centroids = spark.read.parquet(s"$dir/centroids")
    val rcb = spark.read.parquet(s"$dir/codebook")
    val embAll = Similarity.embDouble(spark, sf)
    val codesAll = Similarity.pqCodesFrame(
      Similarity.ivfCells(spark, embAll, centroids), rcb)
    val queries = Similarity.probeResiduals(spark, embAll, centroids,
      serveAll = false, nprobe = 1)
    val mem = rows(Similarity.adcTopK(codesAll, rcb, queries, serveAll = false))
    assert(disk == mem, "appended index != from-scratch coding")
    assert(disk.nonEmpty)

    // a replayed (crashed-and-retried) append overwrites its own batch
    // dir with identical content
    VectorIndexPipeline.appendVectors(spark, dir, second, "1")
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf, nprobe = 1)) == disk)
  }

  test("deletes interleaved with appends: immediate visibility, physical drop at rebuild, disk==memory throughout") {
    import org.apache.hadoop.fs.Path
    // base on the first half; then delete → append → delete → rebuild,
    // checking after every step that disk serving equals the in-memory
    // reference over the LIVE vector set (same stored quantizer, same
    // shared builders)
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-vdx-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-vdx").toString
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, dir)

    val centroids = spark.read.parquet(s"$dir/centroids")
    val rcb = spark.read.parquet(s"$dir/codebook")
    val embAll = Similarity.embDouble(spark, sf)
    def memOver(liveIds: Long => Boolean): Set[(Long, Int, Long, Double)] = {
      val live = embAll.filter(udf(liveIds).apply($"vec_id"))
      val codes = Similarity.pqCodesFrame(
        Similarity.ivfCells(spark, live, centroids), rcb)
      val queries = Similarity.probeResiduals(spark, embAll, centroids,
        serveAll = false, nprobe = 1)
      rows(Similarity.adcTopK(codes, rcb, queries, serveAll = false))
    }

    // delete two base vectors that the untouched serve actually returns,
    // so visibility is observable
    val servedBefore = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    val victims1 = servedBefore.map(_._3).toSeq.sorted.take(2)
    VectorIndexPipeline.deleteVecs(spark, dir, victims1)
    val afterDel1 = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    assert(afterDel1.forall(r => !victims1.contains(r._3)),
      "deleted vectors must disappear from serving immediately")
    assert(afterDel1 == memOver(id => id < 250 && !victims1.contains(id)),
      "post-delete disk serve != in-memory over the live set")

    // append the second half; earlier deletes stay hidden
    val second = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" >= 250)
    VectorIndexPipeline.appendVectors(spark, dir, second, "1")
    val afterApp = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    assert(afterApp == memOver(id => !victims1.contains(id)),
      "post-append disk serve != in-memory over the live set")

    // delete an appended vector too, then rebuild: physical drop + retire
    val victims2 = afterApp.map(_._3).filter(_ >= 250).toSeq.sorted.take(1)
    assert(victims2.nonEmpty, "need an appended vector in the served set")
    VectorIndexPipeline.deleteVecs(spark, dir, victims2)
    val gone = (victims1 ++ victims2).toSet
    val expected = memOver(id => !gone(id))
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == expected)

    val rep = VectorIndexPipeline.rebuild(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$dir/tombstones")), "rebuild retires tombstones")
    assert(!fs.exists(new Path(s"$dir/codes.staging")) &&
      !fs.exists(new Path(s"$dir/codes.old")))
    assert(spark.read.parquet(s"$dir/codes")
      .filter($"vec_id".isin(gone.toSeq: _*)).isEmpty,
      "tombstoned codes must be physically gone after rebuild")
    assert(rep.nVectors ==
      spark.read.parquet(s"$sf/embeddings.parquet").count() - gone.size)
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == expected,
      "rebuild must not change served results")
    // idempotent: re-deleting an already-dropped id is a served no-op
    VectorIndexPipeline.deleteVecs(spark, dir, victims1.take(1))
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == expected)
  }

  test("exact-rerank served from disk equals the in-memory rerank path") {
    val disk = rows(VectorIndexPipeline.serveIvfPqRerank(spark, ixDir, sf))
    val mem = rows(Similarity.ivfPqRerank.build(spark, sf))
    assert(disk == mem, "persisted rerank != in-memory rerank")
    assert(disk.nonEmpty)
  }

  test("appends auto-fold past the fan-in bound; a replayed folded batch is a no-op") {
    import org.apache.hadoop.fs.Path
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-vax-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-vax").toString
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def batchDirs = fs.listStatus(new Path(s"$dir/codes"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet

    val rest = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" >= 250)
    val b1 = rest.filter($"vec_id" < 330)
    val b2 = rest.filter($"vec_id" >= 330 && $"vec_id" < 410)
    val b3 = rest.filter($"vec_id" >= 410)
    // bound 2: base + b1 + b2 = 3 dirs > 2 trips the fold on the SECOND
    // append; b3 then starts a new delta generation on top of the base
    VectorIndexPipeline.appendVectors(spark, dir, b1, "1", maxCodeBatches = 2)
    assert(batchDirs == Set("batch=0", "batch=1"))
    VectorIndexPipeline.appendVectors(spark, dir, b2, "2", maxCodeBatches = 2)
    assert(batchDirs == Set("batch=0"), s"auto-fold did not run: $batchDirs")
    VectorIndexPipeline.appendVectors(spark, dir, b3, "3", maxCodeBatches = 2)
    assert(batchDirs == Set("batch=0", "batch=3"))

    // serving over the folded index equals one-shot coding of everything
    val centroids = spark.read.parquet(s"$dir/centroids")
    val rcb = spark.read.parquet(s"$dir/codebook")
    val embAll = Similarity.embDouble(spark, sf)
    val codesAll = Similarity.pqCodesFrame(
      Similarity.ivfCells(spark, embAll, centroids), rcb)
    val queries = Similarity.probeResiduals(spark, embAll, centroids,
      serveAll = false, nprobe = 1)
    val expected = rows(Similarity.adcTopK(codesAll, rcb, queries, serveAll = false))
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == expected)

    // a crash-replay of batch 2 (already folded into the base) must not
    // re-write its dir — that would double-count every b2 vector
    VectorIndexPipeline.appendVectors(spark, dir, b2, "2", maxCodeBatches = 2)
    assert(batchDirs == Set("batch=0", "batch=3"),
      "replayed folded batch re-created its dir")
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == expected,
      "replayed folded batch changed served results")
  }

  test("re-training over a lived-in index starts a clean life (codebook-drift path)") {
    import org.apache.hadoop.fs.Path
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-vlf-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-vlf").toString
    // first life: train on the half, append the rest, delete a vector —
    // leaves batch=1 (coded against THIS life's codebook) + tombstones
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, dir)
    VectorIndexPipeline.appendVectors(spark, dir,
      spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" >= 250), "1")
    VectorIndexPipeline.deleteVecs(spark, dir,
      Seq(spark.read.parquet(s"$dir/codes").select($"vec_id")
        .orderBy($"vec_id").head().getLong(0)))

    // second life: re-train over the FULL corpus in the same dir — the
    // retired codebook's batch dirs and the old tombstones must not leak
    // into serving (stale batch codes reference the old codebook and
    // would double-serve every appended vector with garbage distances)
    VectorIndexPipeline.writeIvfPq(spark, sf, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new Path(s"$dir/codes"))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSet
    assert(batchDirs == Set("batch=0"),
      s"old life's batch dirs survived the re-train: $batchDirs")
    assert(!fs.exists(new Path(s"$dir/tombstones")))
    assert(!fs.exists(new Path(s"$dir/folded_batches")))
    // serving equals the in-memory path over the full corpus — nothing
    // doubled, nothing hidden
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) ==
      rows(Similarity.ivfPqServe(spark, sf, serveAll = false, nprobe = 1)))
  }

  test("re-train crash windows: unsealed staging rolls back, sealed mid-promote rolls forward") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-vcw").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    VectorIndexPipeline.writeIvfPq(spark, sf, dir)
    val served0 = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    val gen0 = VectorIndexPipeline.readGeneration(spark, dir)
    assert(gen0.isDefined, "a fresh build must carry a generation marker")

    // --- crash MID-BUILD: staging exists but is unsealed (no _COMPLETE).
    // The live index must keep serving; the writer's next entry rolls the
    // debris back.
    fs.mkdirs(new Path(s"$dir/life.staging/codes/batch=0"))
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == served0,
      "an unsealed staging dir must not affect serving")
    VectorIndexPipeline.recoverVectorIndex(spark, dir)
    assert(!fs.exists(new Path(s"$dir/life.staging")),
      "unsealed staging must be rolled back")
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf)) == served0)
    assert(VectorIndexPipeline.readGeneration(spark, dir) == gen0,
      "rollback must keep the old life's generation")

    // --- crash MID-PROMOTE: a SEALED staging (a full new life trained on
    // half the corpus) with the live pieces already partially retired.
    // Recovery must roll FORWARD to the staged life.
    val sfHalf = java.nio.file.Files.createTempDirectory("graft-vcw-h").toString
    spark.read.parquet(s"$sf/embeddings.parquet").filter($"vec_id" < 250)
      .write.parquet(s"$sfHalf/embeddings.parquet")
    val donor = java.nio.file.Files.createTempDirectory("graft-vcw-d").toString
    VectorIndexPipeline.writeIvfPq(spark, sfHalf, donor)
    val donorServed = rows(VectorIndexPipeline.serveIvfPq(spark, donor, sfHalf))
    val donorGen = VectorIndexPipeline.readGeneration(spark, donor)
    // stage the donor life under dir and seal it
    val staging = s"$dir/life.staging"
    fs.delete(new Path(staging), true)
    fs.mkdirs(new Path(staging))
    for (p <- Seq("centroids", "codebook", "codes", "manifest", "generation"))
      assert(fs.rename(new Path(s"$donor/$p"), new Path(s"$staging/$p")))
    fs.create(new Path(s"$staging/_COMPLETE"), true).close()
    // simulate a promote that died after retiring ONE live piece
    assert(fs.rename(new Path(s"$dir/codes"), new Path(s"$dir/codes.old")))
    // writer entry completes the swap
    VectorIndexPipeline.recoverVectorIndex(spark, dir)
    assert(!fs.exists(new Path(staging)), "sealed staging must be consumed")
    assert(!fs.exists(new Path(s"$dir/codes.old")))
    assert(VectorIndexPipeline.readGeneration(spark, dir) == donorGen,
      "roll-forward must land the staged life's generation")
    assert(rows(VectorIndexPipeline.serveIvfPq(spark, dir, sfHalf)) ==
      donorServed, "the promoted life must serve exactly as its donor did")
  }

  test("deletes past the tombstone bound rebuild immediately and retire the tombstones") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-vtx").toString
    VectorIndexPipeline.writeIvfPq(spark, sf, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val served = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    val victims = served.map(_._3).toSeq.sorted.take(2)
    // bound 0: any pending tombstone triggers the rebuild inside the call
    VectorIndexPipeline.deleteVecs(spark, dir, victims,
      tombstoneBroadcastLimit = 0L)
    assert(!fs.exists(new Path(s"$dir/tombstones")),
      "auto-rebuild must retire the tombstones")
    assert(spark.read.parquet(s"$dir/codes")
      .filter($"vec_id".isin(victims: _*)).isEmpty,
      "tombstoned codes must be physically gone")
    val after = rows(VectorIndexPipeline.serveIvfPq(spark, dir, sf))
    assert(after.forall(r => !victims.contains(r._3)))
    assert(after.nonEmpty)
  }

  test("probe-mode serving reads only the probed cells' partitions") {
    val emb = Similarity.embDouble(spark, sf)
    val centroids = spark.read.parquet(s"$ixDir/centroids")
    val probed = Similarity.probeResiduals(spark, emb, centroids,
        serveAll = false, nprobe = 1)
      .select($"qcell").distinct().collect().map(_.getLong(0)).toSeq
    // the partition column round-trips as the narrowest inferred type
    val allCells = spark.read.parquet(s"$ixDir/manifest")
      .select($"cell".cast("long")).collect().map(_.getLong(0)).toSet
    assert(probed.toSet.subsetOf(allCells))
    assert(probed.size < allCells.size,
      "10 probe queries must not cover every cell at this corpus size")

    // input_file_name() at execution time names only files the pruned
    // scan actually opened (Dataset.inputFiles would list the whole
    // relation, pre-filter)
    val files = VectorIndexPipeline.prunedCodes(spark, ixDir, probed)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    val touchedCells = files.map { f =>
      val m = "cell=(\\d+)".r.findFirstMatchIn(f)
      assert(m.isDefined, s"code file outside a cell partition: $f")
      m.get.group(1).toLong
    }.toSet
    assert(touchedCells == probed.toSet,
      s"pruning leaked: read $touchedCells, probed ${probed.toSet}")
  }
}
