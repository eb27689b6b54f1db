package graft.pipeline

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[VersionedTable.vacuum]] racing the LOCK-FREE writers. Round-17
  * made appends and DML lease-free: vacuum's only protection against
  * deleting a concurrent writer's pre-CAS files and shards (nothing
  * references them until the manifest publish — that is what makes the
  * writers lock-free) is the mtime GRACE window, and until this spec
  * nothing exercised that reasoning: the concurrency spec had no
  * vacuum case, and the table spec vacuums with `graceMs = 0` on a
  * quiet table. Three pins:
  *  - a stochastic race: appender threads (with natural runt-shard
  *    folds) against a vacuum loop at a realistic grace — no acked row
  *    is ever lost and every kept version stays readable;
  *  - a fault-injected vacuum running EXACTLY inside a writer's
  *    write→CAS window (the `beforePublishHook` seam): the staged
  *    files are unreferenced at that instant, and only the grace
  *    window keeps the reclaim from eating them;
  *  - the grace boundary itself: aged orphans die, young orphans and
  *    referenced files (however old) survive.
  */
class VersionedTableVacuumRaceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Stats = Seq("user_id", "ts_us")
  private val Grace = 10L * 60 * 1000 // 10 min: longer than any test write

  private def rows(round: Int, n: Int) =
    spark.range(round.toLong * n, round.toLong * n + n)
      .select(col("id").as("event_id"), (col("id") % 97).as("user_id"),
        (col("id") * 1000L).as("ts_us"))

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-vtvac-$tag")
      .resolve("t").toString

  test("vacuum ∥ lock-free appenders and folds: no acked row lost, every kept version readable") {
    val root = freshRoot("race")
    VersionedTable.append(rows(0, 30), root, Stats)
    val threads = 4
    val rounds = 5
    val acked = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val failures = new java.util.concurrent.atomic.AtomicReference[Throwable]
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writers = (0 until threads).map { t =>
      new Thread(() => {
        try (0 until rounds).foreach { r =>
          val round = 1 + t * rounds + r // disjoint id ranges per append
          VersionedTable.append(rows(round, 30), root, Stats)
          acked.add(round.toLong) // the version is published: rows ACKED
          ()
        } catch { case e: Throwable => failures.compareAndSet(null, e); () }
      })
    }
    val vacuums = new java.util.concurrent.atomic.AtomicInteger(0)
    val vacuumer = new Thread(() => {
      try while (!stop.get()) {
        // realistic retention + grace: old versions may drop, but no
        // data/shard file in this test is ever older than the grace —
        // an in-flight writer's pre-CAS files must all survive
        VersionedTable.vacuum(spark, root, keepVersions = 3, Grace)
        vacuums.incrementAndGet()
        Thread.sleep(30)
      } catch { case e: Throwable => failures.compareAndSet(null, e); () }
    })
    writers.foreach(_.start()); vacuumer.start()
    writers.foreach(_.join()); stop.set(true); vacuumer.join()
    assert(failures.get() == null, s"racer failed: ${failures.get()}")
    assert(vacuums.get() >= 2, "fixture: the vacuum loop must have run")
    // every acked append's rows are present exactly once
    val got = VersionedTable.read(spark, root)
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ((0L until 30L) ++ acked.toArray.map(_.asInstanceOf[Long])
      .flatMap(r => (r * 30) until (r * 30 + 30))).sorted
    assert(acked.size == threads * rounds, "fixture: every append acked")
    assert(got == want, "an acked row was lost or duplicated under vacuum")
    assert(VersionedTable.fastCount(spark, root) == want.size.toLong)
    // final reclaim: exactly keepVersions survive and each is readable
    VersionedTable.vacuum(spark, root, keepVersions = 3, Grace)
    val kept = VersionedTable.versions(spark, root)
    assert(kept.size == 3, s"retention must keep 3, got $kept")
    kept.foreach { v =>
      assert(VersionedTable.readVersion(spark, root, v).count() > 0,
        s"kept version $v must stay readable after vacuum")
    }
  }

  test("fault-injected vacuum exactly inside a writer's write→CAS window: the grace window protects the staged files") {
    val root = freshRoot("window")
    VersionedTable.append(rows(0, 50), root, Stats)
    // the hook fires after the appender wrote its data files and shard
    // but BEFORE its manifest CAS: everything it staged is unreferenced
    // at this instant — exactly what the grace window exists for
    var reclaimed = -1
    VersionedTable.beforePublishHook.set(() => {
      val (_, files) =
        VersionedTable.vacuum(spark, root, keepVersions = 1, Grace)
      reclaimed = files
      ()
    })
    val v = VersionedTable.append(rows(1, 50), root, Stats)
    assert(reclaimed == 0,
      "the in-window vacuum must not reclaim the writer's pre-CAS files")
    assert(VersionedTable.readVersion(spark, root, v).count() == 100L,
      "the append must publish intact after the in-window vacuum")
    val got = VersionedTable.read(spark, root)
      .select($"event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 100L), "no acked row may be lost")
  }

  test("the grace boundary: aged orphans die, young orphans and referenced files survive") {
    val root = freshRoot("grace")
    VersionedTable.append(rows(0, 40), root, Stats)
    val fs = new java.io.File(s"$root/files")
    val manifests = new java.io.File(s"$root/manifests")
    val old = System.currentTimeMillis() - 2 * Grace
    // crashed-writer debris, aged past the grace: must be reclaimed
    val agedFile = new java.io.File(fs, "deadbeef-part-00000.parquet")
    val agedShard = new java.io.File(manifests, "s-deadbeefcafe")
    val agedStage = new java.io.File(s"$root/.stage-deadbeef")
    java.nio.file.Files.write(agedFile.toPath, Array[Byte](1, 2, 3))
    java.nio.file.Files.write(agedShard.toPath,
      "# vtshard v1\tuser_id\tts_us\n".getBytes("UTF-8"))
    agedStage.mkdirs()
    Seq(agedFile, agedShard, agedStage).foreach(f =>
      assert(f.setLastModified(old), s"fixture: cannot age $f"))
    // live-writer debris, young: must survive
    val youngFile = new java.io.File(fs, "cafebabe-part-00000.parquet")
    java.nio.file.Files.write(youngFile.toPath, Array[Byte](4, 5, 6))
    // a REFERENCED file aged past the grace: referenced wins, survives
    val referenced = fs.listFiles().filter(_.getName.endsWith(".parquet"))
      .filterNot(f => Set(agedFile.getName, youngFile.getName)(f.getName))
    referenced.foreach(f => assert(f.setLastModified(old)))
    val (_, reclaimed) =
      VersionedTable.vacuum(spark, root, keepVersions = 10, Grace)
    assert(reclaimed == 2, // the aged orphan file + the aged orphan shard
      s"exactly the aged orphans must be reclaimed, got $reclaimed")
    assert(!agedFile.exists() && !agedShard.exists() && !agedStage.exists(),
      "aged debris must be gone")
    assert(youngFile.exists(),
      "young debris may belong to an in-flight writer and must survive")
    assert(VersionedTable.read(spark, root).count() == 40L,
      "referenced files survive however old they are")
  }
}
