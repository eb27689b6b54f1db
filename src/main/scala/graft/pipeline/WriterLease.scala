package graft.pipeline

import org.apache.hadoop.fs.{FileSystem, Path}

/** Fail-fast enforcement of the single-writer contract the persisted
  * indexes ([[VectorIndexPipeline]], [[CorpusPipeline]]) document: two
  * concurrent writers interleaving staged renames would corrupt the index
  * silently — staging dirs deleted out from under an in-flight append,
  * both sides fighting over the `.old`/`.staging` swap. A lease file turns
  * that precondition into an immediate, explicit error on the SECOND
  * writer instead.
  *
  * Mechanics: exclusive file creation is the atomic test-and-set, via the
  * right primitive per filesystem ([[createExclusive]]): HDFS
  * `create(overwrite=false)` is namenode-enforced atomic (object stores
  * with conditional-put semantics qualify too), but Hadoop's LOCAL shim
  * implements overwrite=false as exists-check-then-create — NOT atomic
  * under contention — so local filesystems claim through java.nio
  * `CREATE_NEW` (`open(O_CREAT|O_EXCL)`, kernel-atomic). The lease carries
  * its holder and acquisition time; a holder that died without releasing
  * is broken after [[DefaultTtlMs]] — writer operations here are
  * minutes-long at most, and a broken-then-raced lease still resolves to
  * exactly one winner because the create-after-delete is itself exclusive.
  *
  * Liveness: while `withLease`'s body runs, a daemon HEARTBEAT re-touches
  * the lease's modification time every ttl/3, so staleness judges against
  * the holder's LAST RENEWAL, not its acquisition time — a
  * slower-than-TTL but alive holder is never broken (spec-pinned), and a
  * dead holder stops renewing and expires within one TTL as before. Three
  * touches per TTL means a breaker sees a fresh mtime unless at least two
  * consecutive heartbeats failed to land; renewal failures are logged
  * (and `setTimes`-less filesystems fall back to a same-content rewrite),
  * never silently dropped. Every renewal and the final release verify the
  * lease still carries THIS holder's content, so a holder that really was
  * broken during a long stall cannot refresh or delete its successor's
  * lease when it resumes. Clock skew between writers now only shifts WHEN
  * a dead holder's lease is broken (skew adds to the effective TTL),
  * never breaks a live one — closing the round-12 single-clock-domain
  * caveat for cross-machine deployments.
  */
object WriterLease {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  val LeaseFileName = "_writer.lock"

  /** A lease older than this is considered orphaned by a dead writer and
    * may be broken. Generous relative to any single index operation.
    */
  val DefaultTtlMs: Long = 30 * 60 * 1000L

  private def holderId(op: String): String = {
    val pid = java.lang.ProcessHandle.current().pid()
    val host = java.net.InetAddress.getLocalHost.getHostName
    s"op=$op pid=$pid host=$host id=${java.util.UUID.randomUUID()}"
  }

  /** Run `body` holding the writer lease for `dir`; releases on every
    * exit path. Throws `IllegalStateException` when another live writer
    * holds it. While `body` runs, a daemon heartbeat renews the lease
    * every ttl/3 (see the object scaladoc), so a long-running body is
    * never mistaken for a dead holder. Every renewal — and the final
    * release — first verifies the lease still carries THIS holder's
    * content: a holder that WAS legitimately broken (missed 2+ beats to
    * a GC pause or VM suspend) must neither refresh nor delete the
    * challenger's lease when it resumes.
    */
  def withLease[A](fs: FileSystem, dir: String, op: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    val lease = new Path(s"$dir/$LeaseFileName")
    fs.mkdirs(lease.getParent)
    val myContent = acquire(fs, lease, op, ttlMs, retryAfterBreak = true)
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hb = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val t = new Thread(r, s"writer-lease-heartbeat:$dir")
        t.setDaemon(true)
        t
      })
    val periodMs = math.max(ttlMs / 3, 1L)
    hb.scheduleAtFixedRate(() => beat(fs, lease, myContent, lost),
      periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    try body
    finally {
      // GRACEFUL stop: an in-flight beat must finish before the release
      // check below — interrupting a beat mid-rewrite (the setTimes-less
      // fallback path) can leave the lease with partial content that the
      // ownership check would then refuse to delete, leaking the lease.
      // shutdown() admits no new beats; the current one completes in a
      // few FS calls. shutdownNow only as a last resort on timeout.
      hb.shutdown()
      try {
        if (!hb.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS))
          hb.shutdownNow()
      } catch {
        case _: InterruptedException =>
          hb.shutdownNow(); Thread.currentThread().interrupt()
      }
      // release ONLY a lease that is still ours: deleting a challenger's
      // live lease would hand a third writer a free acquisition while
      // the challenger is mid-write
      if (!lost.get()) {
        try {
          if (VectorIndexPipeline.readTextFile(fs, lease) == myContent)
            fs.delete(lease, false)
        } catch { case _: Exception => () } // already released/broken
      }
    }
  }

  /** One heartbeat: verify ownership, then renew the lease mtime.
    * Failures are LOGGED, never swallowed silently — a renewal that can
    * never succeed (e.g. an FS without setTimes) would otherwise age the
    * lease invisibly until a challenger breaks a live holder. Where
    * `setTimes` is unsupported, the fallback rewrites the same content
    * (fresh mtime), guarded by the ownership check just performed.
    */
  private def beat(fs: FileSystem, lease: Path, myContent: String,
      lost: java.util.concurrent.atomic.AtomicBoolean): Unit = {
    if (lost.get()) return
    val holder =
      try VectorIndexPipeline.readTextFile(fs, lease)
      catch {
        case e: Exception =>
          log.warn(s"lease heartbeat: cannot read $lease " +
            s"(${e.getMessage}); skipping this beat")
          return
      }
    if (holder != myContent) {
      lost.set(true)
      log.error(s"lease $lease is no longer held by this writer (now: " +
        s"$holder) — it was broken as stale while this holder stalled. " +
        "Stopping renewal; this holder will NOT release the new lease.")
      return
    }
    try fs.setTimes(lease, System.currentTimeMillis(), -1)
    catch {
      case _: UnsupportedOperationException =>
        try {
          val out = fs.create(lease, true)
          try out.write(myContent.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        } catch {
          case e: Exception => log.warn(
            s"lease heartbeat: renewal rewrite failed for $lease: ${e.getMessage}")
        }
      case e: Exception =>
        log.warn(s"lease heartbeat: setTimes failed for $lease: ${e.getMessage}")
    }
  }

  /** Exclusively create `p` containing `content`; true iff THIS call
    * created the file. The per-filesystem primitive choice is what makes
    * it a real test-and-set (see the object scaladoc): java.nio
    * `CREATE_NEW` on local filesystems, `create(overwrite=false)`
    * elsewhere. Shared with [[graft.streaming.StreamingVectorIngest]]'s
    * generation-marker bind.
    */
  private[graft] def createExclusive(fs: FileSystem, p: Path,
      content: String): Boolean = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // "Lost the race" may only be concluded from the CREATE step failing.
    // A failure AFTER this call's own create succeeded (write/close — disk
    // full, quota) must NOT report false: the racer that created the file
    // would believe itself a loser while its empty/partial file blocks
    // every writer until the TTL break, and writeTextFileOnce callers
    // would mis-diagnose "content never appeared". Delete the partial
    // creation and rethrow instead.
    fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
        java.nio.file.Files.createDirectories(local.getParent)
        try {
          java.nio.file.Files.write(local, bytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case e: java.io.IOException =>
            // CREATE_NEW succeeded (an existing file throws FAEE above),
            // so any leftover is THIS call's partial — remove it
            java.nio.file.Files.deleteIfExists(local)
            throw e
        }
      case _ =>
        val out =
          try fs.create(p, false)
          catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => null
            case _: java.io.IOException if fs.exists(p)             => null
          }
        if (out == null) false
        else {
          try { try out.write(bytes) finally out.close(); true }
          catch {
            case e: java.io.IOException =>
              try fs.delete(p, false)
              catch { case _: Exception => () } // best effort; rethrow below
              throw e
          }
        }
    }
  }

  /** @return the content this holder's lease file carries (its identity
    *         for heartbeat/release ownership checks)
    */
  private def acquire(fs: FileSystem, lease: Path, op: String, ttlMs: Long,
      retryAfterBreak: Boolean): String = {
    val content = s"${holderId(op)} epochMs=${System.currentTimeMillis()}"
    val created = createExclusive(fs, lease, content)
    if (!created) {
      val status = try Some(fs.getFileStatus(lease)) catch {
        case _: java.io.FileNotFoundException => None // holder just released
      }
      val ageMs = status.map(s => System.currentTimeMillis() - s.getModificationTime)
      if (status.isEmpty || ageMs.exists(_ > ttlMs)) {
        if (!retryAfterBreak) {
          throw new IllegalStateException(
            s"writer lease at $lease could not be acquired after breaking " +
              "a stale holder; another writer won the race")
        }
        status.foreach { _ =>
          log.warn(s"breaking stale writer lease $lease " +
            s"(age ${ageMs.get} ms > ttl $ttlMs ms): " +
            readHolder(fs, lease))
          fs.delete(lease, false)
        }
        // exactly one of the racing breakers wins the re-create
        return acquire(fs, lease, op, ttlMs, retryAfterBreak = false)
      } else {
        throw new IllegalStateException(
          s"another writer holds the lease for ${lease.getParent}: " +
            s"${readHolder(fs, lease)} (age ${ageMs.get} ms). The persisted " +
            "index is single-writer; concurrent mutation would corrupt it. " +
            s"If the holder is dead, the lease expires after $ttlMs ms.")
      }
    }
    content
  }

  private def readHolder(fs: FileSystem, lease: Path): String =
    try VectorIndexPipeline.readTextFile(fs, lease)
    catch { case _: Exception => "<unreadable>" }
}
