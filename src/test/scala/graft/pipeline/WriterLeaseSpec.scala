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

  test("a write failure AFTER winning the create rethrows and leaves no partial lease") {
    // round-13 ADVICE fix: on the create(overwrite=false) branch (HDFS et
    // al.), an IOException from the WRITE after a successful create used
    // to be classified as "lost the race" (fs.exists is true — because WE
    // created it), leaving an empty lease that blocks all writers until
    // the TTL break. The actual creator must clean up and rethrow.
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    // FilterFileSystem is not a Local/RawLocal instance, so createExclusive
    // takes the create(overwrite=false) branch under test
    val failFs = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def create(f: Path, overwrite: Boolean)
          : org.apache.hadoop.fs.FSDataOutputStream = {
        val real = super.create(f, overwrite) // the file now EXISTS
        new org.apache.hadoop.fs.FSDataOutputStream(
          new java.io.OutputStream {
            override def write(b: Int): Unit =
              throw new java.io.IOException("injected: disk full")
            override def close(): Unit = real.close()
          }, null)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-pw").toString
    val p = new Path(s"$dir/claim")
    val e = intercept[java.io.IOException] {
      WriterLease.createExclusive(failFs, p, "winner-content")
    }
    assert(e.getMessage.contains("injected"),
      s"the write failure must surface, got: ${e.getMessage}")
    assert(!failFs.exists(p),
      "the partial lease must be deleted, not left to block writers")
    // and the path is immediately claimable by a healthy writer
    assert(WriterLease.createExclusive(fsOf(dir), p, "healthy"))
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

  test("heartbeat: a slower-than-TTL but ALIVE holder is never broken") {
    // round-13 closure of the clock-domain caveat: staleness judges
    // against the holder's last heartbeat renewal, not acquisition time.
    // Holder works for ~4 TTLs; a challenger arriving well past the TTL
    // must still be refused — without the ttl/3 heartbeat it would break
    // the live holder's lease here.
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-hb").toString
    val fs = fsOf(dir)
    val ttl = 600L
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try WriterLease.withLease(fs, dir, "slow-holder", ttlMs = ttl) {
        Thread.sleep(4 * ttl)
      } catch { case e: Throwable => holderErr.set(e) }
      finally holderDone.countDown())
    t.start()
    Thread.sleep(2 * ttl + ttl / 2) // well past TTL, holder still alive
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(fs, dir, "challenger", ttlMs = ttl)(())
    }
    assert(e.getMessage.contains("another writer holds the lease"),
      s"challenger should have been refused, got: ${e.getMessage}")
    assert(e.getMessage.contains("slow-holder"))
    assert(holderDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(holderErr.get() == null,
      s"holder must finish undisturbed: ${holderErr.get()}")
    // once the holder released, the challenger proceeds
    var ran = false
    WriterLease.withLease(fs, dir, "challenger-2", ttlMs = ttl) { ran = true }
    assert(ran)
  }

  test("heartbeat survives a setTimes-less filesystem via the sidecar fallback") {
    // object stores throw UnsupportedOperationException from setTimes; the
    // heartbeat must fall back to exclusive-create renewal sidecars (the
    // round-14 replacement for the lease-rewrite fallback, which could
    // stomp a successor's lease) instead of silently aging the live
    // holder's lease until a challenger breaks it
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val noSetTimes = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
        throw new UnsupportedOperationException("object store: no setTimes")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-ost").toString
    val ttl = 600L
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try WriterLease.withLease(noSetTimes, dir, "ost-holder", ttlMs = ttl) {
        Thread.sleep(4 * ttl)
      } catch { case e: Throwable => holderErr.set(e) }
      finally holderDone.countDown())
    t.start()
    Thread.sleep(2 * ttl + ttl / 2) // well past TTL; only the sidecar
    // fallback can have kept the renewal fresh — and critically, the
    // LEASE FILE itself must not have been rewritten (its mtime is stale;
    // a challenger that ignored sidecars would wrongly break here)
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(fsOf(dir), dir, "challenger", ttlMs = ttl)(())
    }
    assert(e.getMessage.contains("another writer holds the lease"),
      s"live setTimes-less holder was broken: ${e.getMessage}")
    assert(holderDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(holderErr.get() == null, s"holder failed: ${holderErr.get()}")
    assert(!raw.exists(new Path(s"$dir/${WriterLease.LeaseFileName}")),
      "lease must release after the operation")
    val leftovers = raw.globStatus(
      new Path(dir, s"${WriterLease.LeaseFileName}.beat-*"))
    assert(leftovers == null || leftovers.isEmpty,
      s"renewal sidecars must be cleaned up on release: ${leftovers.toSeq}")
  }

  test("one transient listing failure must not make a live setTimes-less holder look unrenewed") {
    // r14 ADVICE: lastRenewalMs swallowed globStatus exceptions into
    // "no beats, don't retry" — on a setTimes-less FS (lease mtime stuck
    // at acquisition) a single flaky listing made a LIVE holder look
    // stale for its whole runtime, letting a challenger break it. A
    // failed glob is now a retry signal like a vanished sidecar.
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val noSetTimes = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
        throw new UnsupportedOperationException("object store: no setTimes")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-glob").toString
    val ttl = 600L
    val holderDone = new java.util.concurrent.CountDownLatch(1)
    val holderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() =>
      try WriterLease.withLease(noSetTimes, dir, "glob-holder", ttlMs = ttl) {
        Thread.sleep(4 * ttl)
      } catch { case e: Throwable => holderErr.set(e) }
      finally holderDone.countDown())
    t.start()
    Thread.sleep(2 * ttl + ttl / 2) // past TTL; renewals live in sidecars only
    // the challenger's FIRST beat listing fails transiently, every retry
    // succeeds — exactly one flaky call
    val failOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val flakyList = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def globStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
        if (p.toString.contains(".beat-") && failOnce.getAndSet(false))
          throw new java.io.IOException("transient listing failure")
        super.globStatus(p)
      }
    }
    val e = intercept[IllegalStateException] {
      WriterLease.withLease(flakyList, dir, "flaky-challenger", ttlMs = ttl)(())
    }
    assert(e.getMessage.contains("another writer holds the lease"),
      s"a single flaky listing broke a LIVE holder: ${e.getMessage}")
    assert(!failOnce.get(), "the injected failure must actually have fired")
    assert(holderDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    assert(holderErr.get() == null, s"holder failed: ${holderErr.get()}")
  }

  test("breaking a stale lease deletes only the stale holder's sidecars, not a racer's") {
    // r14 ADVICE: the break path used to delete ALL beat sidecars before
    // the content-rotation recheck — a racing winner's fresh renewal
    // history could be erased by the loser's break attempt. Cleanup is
    // now content-guarded: only sidecars carrying the stale holder's
    // content go.
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-brk").toString
    val fs = fsOf(dir)
    val lease = new Path(s"$dir/${WriterLease.LeaseFileName}")
    val staleContent = "op=dead pid=1 host=x id=00000000 epochMs=0"
    val otherContent = "op=winner pid=2 host=y id=11111111 epochMs=1"
    // a genuinely dead holder: stale lease + its own old sidecar, plus a
    // foreign-content sidecar (the racing winner's renewal trace)
    WriterLease.createExclusive(fs, lease, staleContent)
    WriterLease.createExclusive(fs,
      new Path(s"$dir/${WriterLease.LeaseFileName}.beat-0"), staleContent)
    WriterLease.createExclusive(fs,
      new Path(s"$dir/${WriterLease.LeaseFileName}.beat-1"), otherContent)
    val old = System.currentTimeMillis() - 3600000L
    fs.setTimes(lease, old, old)
    fs.setTimes(new Path(s"$dir/${WriterLease.LeaseFileName}.beat-0"), old, old)
    fs.setTimes(new Path(s"$dir/${WriterLease.LeaseFileName}.beat-1"), old, old)

    WriterLease.withLease(fs, dir, "breaker", ttlMs = 1000L)(()) // breaks + runs

    assert(!fs.exists(new Path(s"$dir/${WriterLease.LeaseFileName}.beat-0")),
      "the stale holder's own sidecar must be cleaned with its lease")
    assert(fs.exists(new Path(s"$dir/${WriterLease.LeaseFileName}.beat-1")),
      "a foreign-content sidecar must SURVIVE the break (it may be a " +
        "racing winner's live renewal)")
  }

  test("a stalled setTimes-less holder's renewal cannot overwrite the successor's lease") {
    // round-13 ADVICE (medium): the old fallback renewed via
    // create(lease, overwrite=true) — a holder resuming from a 2+ beat
    // stall could pass its ownership pre-read just before a challenger's
    // break and then stomp the successor's live lease. The sidecar
    // renewal never writes the lease path after acquisition, so even
    // with the takeover racing BETWEEN the pre-read and the renewal
    // write, the successor's lease survives byte-identical. Simulate the
    // worst case: replace the lease under a holder whose every beat takes
    // the fallback path, let several beats land, then check the
    // successor's lease was never touched.
    val raw = new org.apache.hadoop.fs.RawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val noSetTimes = new org.apache.hadoop.fs.FilterFileSystem(raw) {
      override def setTimes(p: Path, mtime: Long, atime: Long): Unit =
        throw new UnsupportedOperationException("object store: no setTimes")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-ost2").toString
    val lock = new Path(s"$dir/${WriterLease.LeaseFileName}")
    val ttl = 900L
    val bodyDone = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() =>
      try WriterLease.withLease(noSetTimes, dir, "ost-stalled", ttlMs = ttl) {
        Thread.sleep(3 * ttl) // beats run every ttl/3 on the fallback path
      } finally bodyDone.countDown())
    t.start()
    Thread.sleep(ttl / 2) // at least one sidecar beat has landed
    // the takeover: break + re-create with the successor's identity
    raw.delete(lock, false)
    VectorIndexPipeline.writeTextFile(raw, lock, "op=ost-successor pid=0 host=x id=s2")
    assert(bodyDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    t.join(30000)
    assert(raw.exists(lock), "the successor's lease was deleted by the old holder")
    assert(VectorIndexPipeline.readTextFile(raw, lock)
      == "op=ost-successor pid=0 host=x id=s2",
      "the successor's lease content was overwritten by the old holder's renewal")
    // and the old holder retired its own sidecars on exit — its stale
    // renewals must not linger under the successor's claim
    val leftovers = raw.globStatus(
      new Path(dir, s"${WriterLease.LeaseFileName}.beat-*"))
    assert(leftovers == null || leftovers.isEmpty,
      s"superseded holder left renewal sidecars: ${leftovers.toSeq}")
    raw.delete(lock, false)
  }

  test("a broken-and-superseded holder neither refreshes nor deletes the successor's lease") {
    // simulate "holder stalled, challenger legitimately broke the lease
    // and took over": replace the lease file under the running holder.
    // The resumed holder's heartbeat must detect the foreign content and
    // stand down, and its release must NOT delete the successor's lease.
    val dir = java.nio.file.Files.createTempDirectory("graft-wl-sup").toString
    val fs = fsOf(dir)
    val lock = new Path(s"$dir/${WriterLease.LeaseFileName}")
    val ttl = 900L
    val bodyDone = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() =>
      try WriterLease.withLease(fs, dir, "stalled-holder", ttlMs = ttl) {
        Thread.sleep(2 * ttl) // heartbeats run every ttl/3 meanwhile
      } finally bodyDone.countDown())
    t.start()
    Thread.sleep(ttl / 2)
    // the takeover: break + re-create with the successor's identity
    fs.delete(lock, false)
    VectorIndexPipeline.writeTextFile(fs, lock, "op=successor pid=0 host=x id=s1")
    assert(bodyDone.await(30, java.util.concurrent.TimeUnit.SECONDS))
    t.join(30000)
    // the successor's lease survives the stalled holder's exit, unmodified
    assert(fs.exists(lock), "the successor's lease was deleted by the old holder")
    assert(VectorIndexPipeline.readTextFile(fs, lock)
      == "op=successor pid=0 host=x id=s1",
      "the successor's lease content was overwritten by the old holder")
    fs.delete(lock, false)
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
