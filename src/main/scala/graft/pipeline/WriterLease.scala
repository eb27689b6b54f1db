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
  * Clock assumption: staleness compares the lease file's modification time
  * against THIS process's wall clock, which is sound when all writers
  * share one clock domain — the same host (the local[N] deployment) or an
  * HDFS cluster with sane NTP. On a cross-machine object-store deployment
  * a skewed clock could break a live writer's lease early; that deployment
  * would need a renew/heartbeat protocol (holder re-touches the lease
  * every ttl/3), which this single-host design intentionally omits.
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
    * holds it.
    */
  def withLease[A](fs: FileSystem, dir: String, op: String,
      ttlMs: Long = DefaultTtlMs)(body: => A): A = {
    val lease = new Path(s"$dir/$LeaseFileName")
    fs.mkdirs(lease.getParent)
    acquire(fs, lease, op, ttlMs, retryAfterBreak = true)
    try body
    finally fs.delete(lease, false)
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
    try {
      fs match {
        case _: org.apache.hadoop.fs.LocalFileSystem |
             _: org.apache.hadoop.fs.RawLocalFileSystem =>
          val local = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
          java.nio.file.Files.createDirectories(local.getParent)
          java.nio.file.Files.write(local, bytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
        case _ =>
          val out = fs.create(p, false)
          try out.write(bytes) finally out.close()
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException        => false
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.IOException if fs.exists(p)             => false
    }
  }

  private def acquire(fs: FileSystem, lease: Path, op: String, ttlMs: Long,
      retryAfterBreak: Boolean): Unit = {
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
        acquire(fs, lease, op, ttlMs, retryAfterBreak = false)
      } else {
        throw new IllegalStateException(
          s"another writer holds the lease for ${lease.getParent}: " +
            s"${readHolder(fs, lease)} (age ${ageMs.get} ms). The persisted " +
            "index is single-writer; concurrent mutation would corrupt it. " +
            s"If the holder is dead, the lease expires after $ttlMs ms.")
      }
    }
  }

  private def readHolder(fs: FileSystem, lease: Path): String =
    try VectorIndexPipeline.readTextFile(fs, lease)
    catch { case _: Exception => "<unreadable>" }
}
