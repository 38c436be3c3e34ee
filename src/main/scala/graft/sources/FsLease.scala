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
  *  - a lock older than `ttlMs` (content timestamp; file mtime for a
  *    legacy empty lock) was abandoned by a crashed holder: delete +
  *    retry the atomic create, then RE-READ to confirm our token won.
  *  - a live holder → IllegalStateException (callers either fail fast,
  *    degrade, or poll via [[acquireBlocking]]).
  *
  * The TTL must exceed the longest legitimate hold (a major compaction
  * over a huge store) — a holder alive past it should raise the
  * constant, not race it. Same-JVM determinism is the CALLER's layer
  * (an in-process registry or lock), not this file's.
  */
object FsLease {

  /** Generous default: healthy holds are seconds-to-minutes; see the
    * class doc for the raise-don't-race rule. */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  final case class Lease(fs: FileSystem, path: Path, token: String) {
    /** Idempotent; never throws (release runs in `finally` blocks). */
    def release(): Unit =
      try { fs.delete(path, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
  }

  def acquire(fs: FileSystem, lock: Path,
              ttlMs: Long = DefaultTtlMs): Lease = {
    val token = java.util.UUID.randomUUID().toString
    val localLock: Option[java.nio.file.Path] =
      if ("file" == Option(fs.getUri.getScheme).getOrElse(""))
        Some(java.nio.file.Paths.get(lock.toUri.getPath))
      else None
    def tryCreate(): Boolean =
      try {
        val content = s"$token ${System.currentTimeMillis()}".getBytes("UTF-8")
        localLock match {
          case Some(p) =>
            java.nio.file.Files.createFile(p) // atomic O_EXCL
            java.nio.file.Files.write(p, content)
          case None =>
            val out = fs.create(lock, false)
            try out.write(content) finally out.close()
        }
        true
      } catch {
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
    if (tryCreate()) return Lease(fs, lock, token)
    holderTs() match {
      case None =>
        // the lock vanished between create and read — its holder just
        // released; one clean retry
        if (tryCreate()) return Lease(fs, lock, token)
      case Some(ts) if System.currentTimeMillis() - ts > ttlMs =>
        log.warn(s"taking over stale lock $lock " +
          s"(age ${System.currentTimeMillis() - ts} ms > ttl $ttlMs ms — " +
          "abandoned by a crashed holder)")
        try { fs.delete(lock, false); () }
        catch { case scala.util.control.NonFatal(_) => () }
        if (tryCreate() && ownToken()) return Lease(fs, lock, token)
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
