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
  * touches per TTL means a breaker sees a fresh renewal unless at least
  * two consecutive heartbeats failed to land; renewal failures are
  * logged, never silently dropped. Every renewal and the final release
  * verify the lease still carries THIS holder's content, so a holder that
  * really was broken during a long stall cannot refresh or delete its
  * successor's lease when it resumes. Clock skew between writers now only
  * shifts WHEN a dead holder's lease is broken (skew adds to the
  * effective TTL), never breaks a live one — closing the round-12
  * single-clock-domain caveat for cross-machine deployments.
  *
  * `setTimes`-less filesystems (object stores): renewal must NOT rewrite
  * the lease file — an overwriting `create(lease, true)` from a holder
  * resuming out of a 2+ beat stall could pass its ownership pre-read just
  * before a challenger's break and then stomp the successor's live lease
  * (the acquire path's create-after-delete exclusivity argument does not
  * apply to an overwrite). Instead each beat EXCLUSIVELY creates a fresh
  * `_writer.lock.beat-<token>-<seq>` sidecar carrying the holder's
  * content and deletes its previous sidecar only after the new one is
  * complete (so a reader always sees at least one finished sidecar).
  * Staleness then judges against `max(lease mtime, mtime of any sidecar
  * whose content matches the lease)` — a resumed stale holder's sidecar
  * carries content the successor's lease no longer matches, so it can
  * neither refresh nor damage the successor's claim, structurally: after
  * acquisition this class never writes to the lease path again.
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
    // executor BEFORE acquire: a construction failure here must not strand
    // an already-acquired lease until the TTL break (round-13 ADVICE)
    val hb = new java.util.concurrent.ScheduledThreadPoolExecutor(1,
      (r: Runnable) => {
        val t = new Thread(r, s"writer-lease-heartbeat:$dir")
        t.setDaemon(true)
        t
      })
    val myContent =
      try acquire(fs, lease, op, ttlMs, retryAfterBreak = true)
      catch { case e: Throwable => hb.shutdownNow(); throw e }
    val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
    val beatState = new BeatState
    try {
      // inside the try: a scheduling failure releases the lease below
      val periodMs = math.max(ttlMs / 3, 1L)
      hb.scheduleAtFixedRate(() => beat(fs, lease, myContent, lost, beatState),
        periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      body
    } finally {
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
      // own sidecars are always safe to retire (content-guarded: a
      // successor's lease and sidecars carry different content) — even a
      // superseded holder shouldn't leave renewal junk behind
      deleteOwnBeats(fs, lease, myContent, beatState)
      // but release ONLY a lease that is still ours: deleting a
      // challenger's live lease would hand a third writer a free
      // acquisition while the challenger is mid-write
      if (!lost.get()) {
        try {
          if (VectorIndexPipeline.readTextFile(fs, lease) == myContent)
            fs.delete(lease, false)
        } catch { case _: Exception => () } // already released/broken
      }
    }
  }

  /** Per-acquisition heartbeat sidecar bookkeeping: a random token keeps
    * successive holders' sidecar names disjoint, `seq` makes every beat's
    * exclusive create land on a fresh path, `prev` is the completed
    * sidecar the next beat retires.
    */
  private final class BeatState {
    val token: String = java.util.UUID.randomUUID().toString.substring(0, 8)
    var seq: Long = 0L
    var prev: Path = null
  }

  /** One heartbeat: verify ownership, then renew. Failures are LOGGED,
    * never swallowed silently — a renewal that can never succeed would
    * otherwise age the lease invisibly until a challenger breaks a live
    * holder. Primary renewal is a lease-mtime touch; where `setTimes` is
    * unsupported the fallback NEVER rewrites the lease (see the object
    * scaladoc) — it exclusively creates a fresh content-matching sidecar
    * and retires the previous one only after the new one is complete.
    */
  private def beat(fs: FileSystem, lease: Path, myContent: String,
      lost: java.util.concurrent.atomic.AtomicBoolean,
      state: BeatState): Unit = {
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
          state.seq += 1
          val next = new Path(lease.getParent,
            f"$LeaseFileName.beat-${state.token}-${state.seq}%06d")
          if (WriterLease.createExclusive(fs, next, myContent)) {
            // retire the superseded sidecar only now: the new one is
            // fully written, so a concurrent staleness check always sees
            // at least one COMPLETE owner-matching sidecar
            if (state.prev != null) fs.delete(state.prev, false)
            state.prev = next
          } else {
            log.warn(s"lease heartbeat: sidecar $next already exists; " +
              "skipping this beat")
          }
        } catch {
          case e: Exception => log.warn(
            s"lease heartbeat: sidecar renewal failed for $lease: ${e.getMessage}")
        }
      case e: Exception =>
        log.warn(s"lease heartbeat: setTimes failed for $lease: ${e.getMessage}")
    }
  }

  private def beatGlob(lease: Path): Path =
    new Path(lease.getParent, s"$LeaseFileName.beat-*")

  /** Freshest renewal time for the CURRENT lease content: the lease's own
    * mtime, or any heartbeat sidecar whose content matches it (the
    * setTimes-less renewal path). A sidecar left by a superseded holder
    * carries content the live lease no longer matches and is ignored.
    */
  private def lastRenewalMs(fs: FileSystem, lease: Path,
      leaseContent: String, leaseMtime: Long): Long = {
    // The beat rotation creates the NEXT sidecar before deleting the
    // previous one, so ≥1 matching sidecar exists at every instant — but
    // only at one instant: a glob can catch beat-X, the rotation can then
    // create beat-Y and delete beat-X, and the read of beat-X lands on
    // FileNotFound. Treating that as "no renewal" would break a LIVE
    // holder; a vanished sidecar is a RETRY signal (the re-glob sees the
    // beat-Y that was complete before beat-X's delete).
    // a FAILED listing is a retry signal just like a vanished sidecar:
    // swallowing it into "no beats, don't retry" would make one
    // transient glob error read as "never renewed" for a LIVE holder
    // on a setTimes-less filesystem (mtime stuck at acquisition),
    // letting a challenger break it — the one contract this object
    // must never violate
    case class Attempt(matching: Seq[Long], retry: Boolean, globOk: Boolean)
    def attempt(): Attempt = {
      val (beats, globOk) =
        try (Option(fs.globStatus(beatGlob(lease))).toSeq.flatten, true)
        catch { case _: Exception => (Seq.empty[org.apache.hadoop.fs.FileStatus], false) }
      var vanished = !globOk
      val matching = beats.flatMap { st =>
        try {
          if (VectorIndexPipeline.readTextFile(fs, st.getPath) == leaseContent)
            Some(st.getModificationTime)
          else None
        } catch {
          case _: java.io.FileNotFoundException => vanished = true; None
          case _: Exception => None // mid-write: not a finished renewal
        }
      }
      Attempt(matching, vanished, globOk)
    }
    var res = attempt()
    var anyGlobOk = res.globOk
    var tries = 0
    while (res.matching.isEmpty && res.retry && tries < 3) {
      tries += 1
      // back off between retries: a correlated throttling burst (object
      // store 503s) fails back-to-back microsecond retries as one event;
      // spaced retries actually sample independent instants
      Thread.sleep(50L * tries)
      res = attempt()
      anyGlobOk ||= res.globOk
    }
    // FAIL-SAFE when no listing attempt ever succeeded: "renewal state
    // unknowable" must read as FRESH, not as "never renewed" — breaking a
    // lease on zero evidence is the two-writers hazard, while deferring
    // the break of a genuinely dead holder merely waits for the next
    // evaluation when listing works again
    if (!anyGlobOk && res.matching.isEmpty) System.currentTimeMillis()
    else (leaseMtime +: res.matching).max
  }

  /** Best-effort cleanup of THIS holder's heartbeat sidecars (content
    * match guards against deleting a live successor's renewal).
    */
  private def deleteOwnBeats(fs: FileSystem, lease: Path,
      myContent: String, state: BeatState): Unit = {
    try {
      Option(fs.globStatus(beatGlob(lease))).toSeq.flatten.foreach { st =>
        val mine =
          try VectorIndexPipeline.readTextFile(fs, st.getPath) == myContent
          catch { case _: Exception => false }
        if (mine) fs.delete(st.getPath, false)
      }
    } catch { case _: Exception => () }
    state.prev = null
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
      val ageMs = status.map { s =>
        val holder = readHolder(fs, lease)
        System.currentTimeMillis() -
          lastRenewalMs(fs, lease, holder, s.getModificationTime)
      }
      if (status.isEmpty || ageMs.exists(_ > ttlMs)) {
        if (!retryAfterBreak) {
          throw new IllegalStateException(
            s"writer lease at $lease could not be acquired after breaking " +
              "a stale holder; another writer won the race")
        }
        status.foreach { _ =>
          val staleContent = readHolder(fs, lease)
          log.warn(s"breaking stale writer lease $lease " +
            s"(age ${ageMs.get} ms > ttl $ttlMs ms): $staleContent")
          // Re-check IMMEDIATELY before the breaking delete: a racing
          // challenger may have broken and re-created the lease during
          // the staleness evaluation above, and deleting here would kill
          // its LIVE lease (two writers). If the content rotated, the
          // break is off — fall through to the no-retry acquire, which
          // correctly loses to the new holder. The recheck runs BEFORE
          // any sidecar cleanup, and the cleanup deletes ONLY sidecars
          // carrying the stale holder's content: a winner's fresh
          // renewal sidecars must survive a losing challenger's break
          // attempt, or on a setTimes-less FS its renewal history would
          // be erased right after it won. This keeps the check-to-delete
          // window at one read; the residual race (a full break+create
          // landing inside that read-delete gap) has no plain-FS fix
          // without compare-and-delete, and is further backstopped by
          // the victim's ownership-checked heartbeat flagging `lost`
          // within ttl/3.
          if (readHolder(fs, lease) == staleContent) {
            fs.delete(lease, false)
            // the dead holder's sidecars go with its lease: all carry
            // its content and are older than the TTL (a fresh matching
            // one would have refused the break above); anything with
            // OTHER content belongs to a racing winner and is kept
            try {
              Option(fs.globStatus(beatGlob(lease))).toSeq.flatten.foreach { st =>
                val stale =
                  try VectorIndexPipeline.readTextFile(fs, st.getPath) == staleContent
                  catch { case _: Exception => false }
                if (stale) fs.delete(st.getPath, false)
              }
            } catch { case _: Exception => () }
          } else log.warn(s"skipping break of $lease: lease content rotated " +
            "under evaluation (another challenger won)")
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
