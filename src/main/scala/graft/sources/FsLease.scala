package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process single-writer lease on a lock FILE, shared by the
  * curation-state compactor (`CurationStream.compactState`) and the
  * serving store's mutation path (`QueryService`).
  *
  * Semantics:
  *  - acquire = create-if-absent with the holder's token + timestamp
  *    as content. The create is genuinely atomic on HDFS (server-side)
  *    and on the local FS (NIO O_CREAT|O_EXCL — Hadoop's RawLocal
  *    create(path, overwrite=false) is only check-then-create); object
  *    stores without atomic create stay best-effort, narrowed by the
  *    post-takeover token re-read.
  *  - while held, a HEARTBEAT refreshes the lock's timestamp at ttl/3
  *    (floor 1 s), so a live holder is never mistaken for a crashed
  *    one no matter how long its fold/compaction legitimately runs;
  *    the TTL only reaps locks whose heartbeat died with its process.
  *  - a lock older than `ttlMs` (content timestamp; file mtime for a
  *    legacy empty lock) was abandoned by a crashed holder: CLAIM it
  *    by atomic rename-aside — of N concurrent takers exactly ONE
  *    rename succeeds, so a taker can only remove the stale lock it
  *    claimed, never a peer taker's freshly-won live lock — then
  *    delete the claim, re-create, and RE-READ to confirm the token.
  *  - a live holder → IllegalStateException (callers either fail fast,
  *    degrade, or poll via [[acquireBlocking]]).
  *  - release deletes the lock only while it still carries the lease's
  *    OWN token (never a successor's).
  *
  * Same-JVM determinism is the CALLER's layer (an in-process registry
  * or lock), not this file's.
  */
object FsLease {

  /** Generous default: healthy holds are seconds-to-minutes; see the
    * class doc for the raise-don't-race rule. */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  final class Lease private[FsLease] (fs: FileSystem, path: Path,
                                      val token: String) {
    @volatile private[FsLease] var heartbeat
        : Option[java.util.concurrent.ScheduledFuture[_]] = None

    /** Idempotent; never throws (release runs in `finally` blocks).
      * Deletes the lock ONLY when it still carries this lease's token:
      * a holder that somehow outlived the TTL and was taken over must
      * not remove the NEW holder's live lock on its way out. */
    def release(): Unit = {
      heartbeat.foreach(_.cancel(false))
      heartbeat = None
      try {
        val stillOurs =
          try {
            val in = fs.open(path)
            val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
            s.startsWith(token)
          } catch { case scala.util.control.NonFatal(_) => false }
        if (stillOurs) { fs.delete(path, false); () }
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  // daemon scheduler for lease heartbeats: holds shorter than the
  // first period (the common case) never fire a single task
  private lazy val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "fs-lease-heartbeat"); t.setDaemon(true); t
    })

  def acquire(fs: FileSystem, lock: Path,
              ttlMs: Long = DefaultTtlMs): Lease = {
    val token = java.util.UUID.randomUUID().toString
    val localLock: Option[java.nio.file.Path] =
      if ("file" == Option(fs.getUri.getScheme).getOrElse(""))
        Some(java.nio.file.Paths.get(lock.toUri.getPath))
      else None
    def writeContent(createOnly: Boolean): Unit = {
      val content = s"$token ${System.currentTimeMillis()}".getBytes("UTF-8")
      localLock match {
        case Some(p) =>
          if (createOnly) java.nio.file.Files.createFile(p) // atomic O_EXCL
          java.nio.file.Files.write(p, content)
          ()
        case None =>
          val out = fs.create(lock, !createOnly)
          try out.write(content) finally out.close()
      }
    }
    def tryCreate(): Boolean =
      try { writeContent(createOnly = true); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    def holderTs(): Option[Long] =
      try {
        val in = fs.open(lock)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                finally in.close()
        s.split("\\s+") match {
          case Array(_, ts) if ts.forall(_.isDigit) => Some(ts.toLong)
          // legacy empty lock (pre-owner format): age by file mtime
          case _ => Some(fs.getFileStatus(lock).getModificationTime)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    def ownToken(): Boolean =
      try {
        val in = fs.open(lock)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
        s.startsWith(token)
      } catch { case scala.util.control.NonFatal(_) => false }
    // While held, refresh the lock's timestamp at ttl/3 (floor 1 s):
    // a LIVE holder is never mistaken for a crashed one no matter how
    // long its fold/compaction legitimately runs — the TTL only ever
    // reaps processes whose heartbeat died with them. The rewrite is
    // not atomic; a reader catching it mid-write falls back to the
    // file mtime, which the write refreshes anyway.
    def armed(l: Lease): Lease = {
      val period = math.max(1000L, ttlMs / 3)
      l.heartbeat = Some(heartbeats.scheduleAtFixedRate(
        () => try writeContent(createOnly = false)
              catch { case scala.util.control.NonFatal(_) => () },
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS))
      l
    }
    if (tryCreate()) return armed(new Lease(fs, lock, token))
    holderTs() match {
      case None =>
        // the lock vanished between create and read — its holder just
        // released; one clean retry
        if (tryCreate()) return armed(new Lease(fs, lock, token))
      case Some(ts) if System.currentTimeMillis() - ts > ttlMs =>
        // atomic CLAIM before removal: rename the stale lock aside —
        // of N concurrent takers exactly ONE rename succeeds (rename
        // fails once the source is gone), so a taker can only ever
        // remove the stale lock it claimed, never a peer taker's
        // freshly-won LIVE lock (the delete-then-create shape raced
        // exactly that way)
        val claim = new Path(lock.getParent,
          s"${lock.getName}.takeover.$token")
        val claimed =
          try fs.rename(lock, claim)
          catch { case scala.util.control.NonFatal(_) => false }
        if (claimed) {
          log.warn(s"taking over stale lock $lock " +
            s"(age ${System.currentTimeMillis() - ts} ms > ttl $ttlMs ms " +
            "— abandoned by a crashed holder)")
          try { fs.delete(claim, false); () }
          catch { case scala.util.control.NonFatal(_) => () }
          if (tryCreate() && ownToken())
            return armed(new Lease(fs, lock, token))
        }
      case Some(_) => ()
    }
    throw new IllegalStateException(
      s"another writer holds $lock (single-writer contract); " +
        s"a crashed holder's lock is reclaimed after ${ttlMs / 1000} s")
  }

  /** Poll [[acquire]] until it succeeds or `waitMs` elapses — the
    * serving store's mutation shape: cross-process mutations are
    * legitimate but serialized, so a second writer WAITS for the
    * current one rather than failing the client's request. */
  def acquireBlocking(fs: FileSystem, lock: Path,
                      ttlMs: Long = DefaultTtlMs,
                      waitMs: Long = 10L * 60 * 1000,
                      pollMs: Long = 100): Lease = {
    val deadline = System.currentTimeMillis() + waitMs
    while (true) {
      try return acquire(fs, lock, ttlMs)
      catch {
        case e: IllegalStateException =>
          if (System.currentTimeMillis() >= deadline) throw e
          Thread.sleep(pollMs)
      }
    }
    sys.error("unreachable")
  }

  /** True when `e`'s cause chain says files were deleted under a
    * running plan (another process's fold/compaction GC'd a dir the
    * caller's memoized view references) — the signal to re-plan from
    * the current manifest. UNABLE_TO_INFER_SCHEMA is the whole-dir
    * variant (every file of a listed dir gone before the read). */
  def isStaleFileRead(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      val m = Option(c.getMessage).getOrElse("")
      if (c.isInstanceOf[java.io.FileNotFoundException] ||
          m.contains("FAILED_READ_FILE") || m.contains("FILE_NOT_EXIST") ||
          m.contains("UNABLE_TO_INFER_SCHEMA"))
        return true
      c = if (c.getCause eq c) null else c.getCause
    }
    false
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
