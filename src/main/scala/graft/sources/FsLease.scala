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
  *    The heartbeat re-checks its OWN token before each rewrite — a
  *    holder that stalled past the TTL and was superseded observes the
  *    loss, logs it, and stops instead of clobbering its successor
  *    (two consecutive foreign sightings required — a peer taker's
  *    rename-aside-then-restore makes one observation unreliable). The
  *    refresh itself is write-temp-then-atomic-rename, so readers
  *    never parse a torn 'token ts' as an ancient timestamp.
  *  - a lock older than `ttlMs` (content timestamp; file mtime for a
  *    legacy empty lock) was abandoned by a crashed holder: CLAIM it
  *    by atomic rename-aside (of N concurrent takers exactly one
  *    rename of the same source succeeds), then VERIFY the claimed
  *    bytes equal the stale content observed — a rename that instead
  *    grabbed a peer taker's freshly re-created LIVE lock is detected
  *    and restored. Then delete the claim, re-create, and RE-READ to
  *    confirm the token. A residual window needs THREE takers
  *    interleaving within milliseconds on a ≥TTL-stale lock — and the
  *    restore path still heals the two-deep case.
  *  - a live holder → IllegalStateException (callers either fail fast,
  *    degrade, or poll via [[acquireBlocking]]).
  *  - release deletes the lock only while it still carries the lease's
  *    OWN token (never a successor's); a persistently UNREADABLE lock
  *    (three read attempts) is deleted only when this holder was never
  *    observed superseded (availability default — a leaked own lock
  *    wedges writers for the full TTL); a provably-foreign,
  *    already-missing, or confirmed-superseded one is left alone.
  *
  * Same-JVM determinism is the CALLER's layer (an in-process registry
  * or lock), not this file's.
  */
object FsLease {

  /** Generous default: healthy holds are seconds-to-minutes; see the
    * class doc for the raise-don't-race rule. */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  /** Floor for OPERATOR-CONFIGURED TTLs (the env knobs): the heartbeat
    * period is max(1 s, ttl/3), so a TTL at or below ~1 s makes a
    * live, heartbeating holder look permanently stale and permits
    * takeover of a healthy writer (two concurrent mutators). 3× the
    * 1 s heartbeat floor guarantees a healthy holder lands at least
    * two refreshes inside any TTL window — a >1 s GC pause no longer
    * spans the whole budget. Direct API callers (specs) may still pass
    * smaller values deliberately; only the env-read sites clamp. */
  val MinConfiguredTtlMs: Long = 3000L

  /** Clamp an env-configured TTL to [[MinConfiguredTtlMs]], loudly. */
  def clampConfiguredTtl(ttlMs: Long, knob: String): Long =
    if (ttlMs >= MinConfiguredTtlMs) ttlMs
    else {
      log.warn(s"$knob=$ttlMs ms is below the safe floor " +
        s"($MinConfiguredTtlMs ms = 3x the 1 s heartbeat floor); " +
        "clamping — a smaller TTL lets a live holder be taken over")
      MinConfiguredTtlMs
    }

  final class Lease private[FsLease] (fs: FileSystem, path: Path,
                                      val token: String) {
    @volatile private[FsLease] var heartbeat
        : Option[java.util.concurrent.ScheduledFuture[_]] = None
    // checked by the heartbeat runnable right before its rewrite, so a
    // release() racing an in-flight beat can't have the lock re-created
    // behind it (cancel(true) interrupts a SLEEPING beat; this flag
    // stops one already past the cancel check)
    @volatile private[FsLease] var closed = false
    // set by the heartbeat once it has CONFIRMED (two consecutive
    // observations) that the lock carries a foreign token — i.e. this
    // holder stalled past the TTL and was superseded. release() then
    // fails CLOSED on an unreadable lock: the file very likely belongs
    // to a live successor, and deleting it would break the
    // single-writer guarantee.
    @volatile private[FsLease] var superseded = false
    // consecutive foreign/missing-token heartbeat observations; reset
    // on every own-token sighting (see armed() for why one observation
    // is not trusted)
    private[FsLease] val foreignBeats =
      new java.util.concurrent.atomic.AtomicInteger(0)
    // true while a heartbeat run is executing (read + possible rewrite):
    // release() waits for an in-flight beat to land before its
    // token-checked delete, so a rewrite can't re-create the lock
    // AFTER the delete (an own-token lock nobody releases, leaked
    // until TTL). Zero cost when no beat is running — the common case.
    private[FsLease] val beatBusy =
      new java.util.concurrent.atomic.AtomicBoolean(false)

    /** Idempotent; never throws (release runs in `finally` blocks).
      * Deletes the lock ONLY when it still carries this lease's token;
      * a successor's live lock and an already-deleted one are left
      * alone. An UNREADABLE lock is re-read a few times (transient FS
      * errors at release time must not delete a live peer's lock) and
      * then deleted only if this holder was never observed superseded
      * (availability default — a leaked own lock wedges writers for
      * the full TTL). */
    def release(): Unit = {
      closed = true
      heartbeat.foreach(_.cancel(true))
      heartbeat = None
      try {
        // wait (bounded) for an in-flight beat to land: its rewrite
        // racing the delete below could re-create the lock after it
        val waitUntil = System.currentTimeMillis() + 500
        while (beatBusy.get() && System.currentTimeMillis() < waitUntil)
          Thread.sleep(5)
        // three attempts, short backoff: a single transient read error
        // must not fail open — the lock may belong to a successor by now
        var attempt = 0
        var verdict: Option[Boolean] = None // Some(own?) / None unreadable
        while (verdict.isEmpty && attempt < 3) {
          attempt += 1
          try {
            val in = fs.open(path)
            val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                    finally in.close()
            verdict = Some(s.startsWith(token))
          } catch {
            case _: java.io.FileNotFoundException =>
              verdict = Some(false) // already gone
            case scala.util.control.NonFatal(_) =>
              if (attempt < 3) Thread.sleep(40L * attempt)
          }
        }
        // persistently unreadable: fail open ONLY while never observed
        // superseded — a confirmed-superseded holder's delete could
        // remove a live successor's lock
        val shouldDelete = verdict.getOrElse(!superseded)
        if (shouldDelete) { fs.delete(path, false); () }
      } catch {
        case scala.util.control.NonFatal(_) => ()
        // the waits above sleep; an interrupt must not escape a
        // release() running in a caller's finally block — give the
        // delete one best effort WITH THE FLAG STILL CLEARED (an
        // interruptible channel — HDFS sockets, NIO — would abort the
        // read/delete instantly if the flag were restored first and
        // leak the own-token lock for the TTL), then restore the flag
        case _: InterruptedException =>
          try {
            if (readRaw(fs, path).exists(_.startsWith(token))) {
              fs.delete(path, false); ()
            }
          } catch { case scala.util.control.NonFatal(_) => () }
          finally Thread.currentThread().interrupt()
      }
    }
  }

  // daemon scheduler for lease heartbeats: holds shorter than the
  // first period (the common case) never fire a single task
  private lazy val heartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "fs-lease-heartbeat"); t.setDaemon(true); t
    })

  private def readRaw(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

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
          if (createOnly) {
            java.nio.file.Files.createFile(p) // atomic O_EXCL
            java.nio.file.Files.write(p, content)
            ()
          } else {
            // heartbeat REFRESH is write-temp-then-atomic-rename: a
            // reader must never catch a half-written 'token ts' and
            // parse a truncated timestamp as ancient (torn-read
            // takeover of a live lock)
            val tmp = p.resolveSibling(s"${p.getFileName}.hb.$token")
            java.nio.file.Files.write(tmp, content)
            java.nio.file.Files.move(tmp, p,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
          }
        case None if createOnly =>
          val out = fs.create(lock, false)
          try out.write(content) finally out.close()
        case None =>
          // same torn-read protection for Hadoop filesystems: create a
          // sibling temp and rename-with-overwrite over the lock (the
          // manifest-flip idiom — readers see old complete bytes or new)
          val tmp = new Path(lock.getParent, s"${lock.getName}.hb.$token")
          val out = fs.create(tmp, true)
          try out.write(content) finally out.close()
          try {
            val fc = org.apache.hadoop.fs.FileContext
              .getFileContext(fs.getUri, fs.getConf)
            fc.rename(fs.makeQualified(tmp), fs.makeQualified(lock),
              org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            // scheme has a FileSystem impl but no AbstractFileSystem
            // binding (common for object-store connectors): fall back
            // to the legacy in-place rewrite — a live holder must keep
            // refreshing (or be reaped at TTL mid-mutation); holderTs's
            // mtime guard still defuses torn reads of this path
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
              try { fs.delete(tmp, false); () }
              catch { case scala.util.control.NonFatal(_) => () }
              val out2 = fs.create(lock, true)
              try out2.write(content) finally out2.close()
          }
      }
    }
    def tryCreate(): Boolean =
      try { writeContent(createOnly = true); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    def holderTs(raw: String): Option[Long] = {
      val mtime =
        try Some(fs.getFileStatus(lock).getModificationTime)
        catch { case scala.util.control.NonFatal(_) => None }
      raw.trim.split("\\s+") match {
        case Array(_, ts) if ts.nonEmpty && ts.forall(_.isDigit) =>
          // a content timestamp implausibly older than the file's own
          // mtime is a torn read of a legacy (pre-atomic-rename)
          // rewrite — 'token 17' with a fresh mtime. Every healthy
          // refresh touches the mtime, and a crashed holder's mtime is
          // as old as its last beat, so max() never shields a lock
          // that is genuinely stale.
          Some(mtime.fold(ts.toLong)(m => math.max(ts.toLong, m)))
        // legacy empty lock (pre-owner format): age by file mtime
        case _ => mtime
      }
    }
    def ownToken(): Boolean = readRaw(fs, lock).exists(_.startsWith(token))
    // While held, refresh the lock's timestamp at ttl/3 (floor 1 s) —
    // but only while the lock still carries OUR token: a holder that
    // stalled past the TTL and was superseded must observe the loss
    // and stop, not clobber its successor. A SINGLE foreign/missing
    // observation is not trusted (a peer taker's rename-aside-then-
    // restore window makes the lock transiently missing or foreign for
    // a live holder): the beat skips its rewrite and re-verifies next
    // period, cancelling only after TWO consecutive foreign sightings.
    def armed(l: Lease): Lease = {
      val period = math.max(1000L, ttlMs / 3)
      // tri-state read for the beat: Some(Some(s)) = readable content,
      // Some(None) = provably missing, None = READ ERROR. An error is
      // NOT a foreign sighting — readRaw's blanket None would let two
      // transient FS blips (ttl/3 apart) cancel a live holder's
      // heartbeat and get it reaped at the TTL mid-mutation.
      def readTri(): Option[Option[String]] =
        try {
          val in = fs.open(lock)
          try Some(Some(
            scala.io.Source.fromInputStream(in, "UTF-8").mkString))
          finally in.close()
        } catch {
          case _: java.io.FileNotFoundException => Some(None)
          case scala.util.control.NonFatal(_) => None
        }
      l.heartbeat = Some(heartbeats.scheduleAtFixedRate(
        () => try {
          l.beatBusy.set(true)
          if (!l.closed) {
            val current = readTri()
            if (current.isEmpty) {
              log.warn(s"lease $lock unreadable on this beat (transient " +
                "FS error) — skipping the refresh, re-verifying next beat")
            } else if (current.exists(_.exists(_.startsWith(token)))) {
              l.foreignBeats.set(0)
              if (!l.closed) writeContent(createOnly = false)
            } else if (l.foreignBeats.incrementAndGet() >= 2) {
              log.warn(s"lease $lock no longer carries this holder's " +
                "token on two consecutive beats (released, or superseded " +
                "after a stall past the TTL) — stopping its heartbeat")
              l.superseded = true
              l.heartbeat.foreach(_.cancel(false))
            } else {
              log.warn(s"lease $lock transiently missing this holder's " +
                "token (peer takeover probe, or a torn read) — skipping " +
                "this refresh and re-verifying next beat")
            }
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            // failures are retried next period, but NEVER silently: a
            // persistently failing heartbeat means this live holder
            // will look crashed and be reaped at the TTL
            log.warn(s"lease heartbeat for $lock failed " +
              s"(holder will look stale if this persists): ${e.getMessage}")
        } finally l.beatBusy.set(false),
        period, period, java.util.concurrent.TimeUnit.MILLISECONDS))
      l
    }
    if (tryCreate()) return armed(new Lease(fs, lock, token))
    val observed = readRaw(fs, lock)
    observed.map(r => (r, holderTs(r))) match {
      case None | Some((_, None)) =>
        // the lock vanished between create and read — its holder just
        // released; one clean retry
        if (tryCreate()) return armed(new Lease(fs, lock, token))
      case Some((raw, Some(ts)))
          if System.currentTimeMillis() - ts > ttlMs =>
        // sweep claim litter a crashed previous taker left behind, and
        // heartbeat temp files a holder crashed between write and rename
        // (rare path: runs only when a takeover is already warranted)
        try fs.listStatus(lock.getParent).toSeq
          .filter(st =>
            st.getPath.getName.startsWith(s"${lock.getName}.takeover.") ||
            st.getPath.getName.startsWith(s"${lock.getName}.hb."))
          .filter(_.getModificationTime < System.currentTimeMillis() - ttlMs)
          .foreach(st =>
            try { fs.delete(st.getPath, false); () }
            catch { case scala.util.control.NonFatal(_) => () })
        catch { case scala.util.control.NonFatal(_) => () }
        // atomic CLAIM before removal: of N concurrent takers exactly
        // one rename of the same source succeeds, and the claimed
        // bytes are then VERIFIED against the stale content observed —
        // a rename that instead grabbed a peer taker's freshly
        // re-created LIVE lock (source re-created between our read and
        // our rename) is detected and restored
        val claim = new Path(lock.getParent,
          s"${lock.getName}.takeover.$token")
        val claimed =
          try fs.rename(lock, claim)
          catch { case scala.util.control.NonFatal(_) => false }
        if (claimed) {
          val claimedRaw = readRaw(fs, claim)
          if (claimedRaw.contains(raw)) {
            log.warn(s"taking over stale lock $lock " +
              s"(age ${System.currentTimeMillis() - ts} ms > ttl $ttlMs " +
              "ms — abandoned by a crashed holder)")
            try { fs.delete(claim, false); () }
            catch { case scala.util.control.NonFatal(_) => () }
            if (tryCreate() && ownToken())
              return armed(new Lease(fs, lock, token))
          } else {
            // we renamed aside someone ELSE's lock — put it back (the
            // restore can only fail if a third contender already
            // created a new lock in the gap; then drop the claim so at
            // most one lock file exists)
            val restored =
              try fs.rename(claim, lock)
              catch { case scala.util.control.NonFatal(_) => false }
            if (!restored)
              try { fs.delete(claim, false); () }
              catch { case scala.util.control.NonFatal(_) => () }
          }
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
    * current one rather than failing the client's request. The default
    * wait is unbounded: a live peer holds the lease exactly as long as
    * its mutation runs (heartbeat-protected), and a crashed peer is
    * reaped at the TTL — so the wait is bounded by real work either
    * way, matching the in-process lock-queue semantics. */
  def acquireBlocking(fs: FileSystem, lock: Path,
                      ttlMs: Long = DefaultTtlMs,
                      waitMs: Long = Long.MaxValue,
                      pollMs: Long = 100): Lease = {
    val deadline =
      if (waitMs >= Long.MaxValue - System.currentTimeMillis()) Long.MaxValue
      else System.currentTimeMillis() + waitMs
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
