package graft.pipeline

import graft.TestSpark
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The single-writer contract is enforced, not just documented: a second
  * concurrent writer is refused loudly; an orphaned lease from a dead
  * writer is broken after its TTL; the lease always releases.
  */
class WriterLeaseSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("two competing appenders: the second is refused while the first holds") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wl").toString
    VectorIndexPipeline.writeIvfPq(spark, sf, dir)
    val fs = fsOf(dir)
    val firstEntered = new java.util.concurrent.CountDownLatch(1)
    val releaseFirst = new java.util.concurrent.CountDownLatch(1)
    val firstDone = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try WriterLease.withLease(fs, dir, "writer-1") {
        firstEntered.countDown()
        releaseFirst.await()
      } catch { case e: Throwable => firstDone.set(e); firstEntered.countDown() })
    t.start()
    assert(firstEntered.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(firstDone.get() == null)
    // writer 2: a real mutating operation must fail fast, not corrupt
    val batch = spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
    val e = intercept[IllegalStateException] {
      VectorIndexPipeline.appendVectors(spark, dir, batch, "99")
    }
    assert(e.getMessage.contains("another writer holds the lease"))
    assert(e.getMessage.contains("writer-1"), s"holder not named: ${e.getMessage}")
    releaseFirst.countDown()
    t.join(30000)
    // after release, the same operation proceeds
    VectorIndexPipeline.deleteVecs(spark, dir, Seq(-1L))
    assert(!fs.exists(new Path(s"$dir/${WriterLease.LeaseFileName}")),
      "lease must release after the operation")
  }

  test("createExclusive is a real test-and-set: 16 racers, exactly one winner") {
    // Hadoop's local create(overwrite=false) is exists-check-then-create —
    // under contention multiple callers can "win" and truncate each other.
    // The per-filesystem primitive (java.nio CREATE_NEW locally) must
    // admit EXACTLY one creator, and the surviving content must be the
    // winner's, not a torn interleaving.
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-x").toString
    val fs = fsOf(dir)
    val p = new Path(s"$dir/claim")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val tasks = (1 to 16).map { i =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = {
          gate.await()
          WriterLease.createExclusive(fs, p, s"holder-$i")
        }
      })
    }
    gate.countDown()
    val wins = tasks.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.count(identity) == 1, s"expected exactly 1 winner, got $wins")
    val winner = wins.indexOf(true) + 1
    assert(VectorIndexPipeline.readTextFile(fs, p) == s"holder-$winner",
      "surviving content must be the winner's")
  }

  test("an orphaned lease (dead writer) is broken after its TTL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wl2").toString
    val fs = fsOf(dir)
    val lock = new Path(s"$dir/${WriterLease.LeaseFileName}")
    VectorIndexPipeline.writeTextFile(fs, lock, "op=crashed pid=0 host=x id=y")
    fs.setTimes(lock, System.currentTimeMillis() - 60000, -1)
    // ttl 1ms: the stale lease is broken and the operation proceeds
    var ran = false
    WriterLease.withLease(fs, dir, "survivor", ttlMs = 1L) { ran = true }
    assert(ran)
    assert(!fs.exists(lock))
    // but a FRESH foreign lease under the same ttl=default is refused
    VectorIndexPipeline.writeTextFile(fs, lock, "op=live pid=0 host=x id=z")
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(fs, dir, "latecomer")(())
    }
    assert(e.getMessage.contains("another writer holds the lease"))
  }

  test("the lease releases on a throwing body") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wl3").toString
    val fs = fsOf(dir)
    intercept[RuntimeException] {
      WriterLease.withLease(fs, dir, "thrower") {
        throw new RuntimeException("boom")
      }
    }
    assert(!fs.exists(new Path(s"$dir/${WriterLease.LeaseFileName}")))
    WriterLease.withLease(fs, dir, "next")(()) // reacquirable
  }

  test("the inverted-index writers hold the same lease discipline") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wl4").toString
    CorpusPipeline.writeInvertedIndex(spark, sf, dir)
    val fs = fsOf(dir)
    VectorIndexPipeline.writeTextFile(fs,
      new Path(s"$dir/${WriterLease.LeaseFileName}"),
      "op=other pid=0 host=x id=q")
    val e = intercept[IllegalStateException] {
      CorpusPipeline.deleteDocs(spark, dir, Seq(1L))
    }
    assert(e.getMessage.contains("another writer holds the lease"))
    fs.delete(new Path(s"$dir/${WriterLease.LeaseFileName}"), false)
    CorpusPipeline.deleteDocs(spark, dir, Seq(1L)) // proceeds after release
  }
}
