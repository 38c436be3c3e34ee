package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FsLease

/** A local-disk FileSystem that reports a NON-`file` scheme, so
  * FsLease takes its Hadoop (FileContext rename-with-overwrite)
  * branches instead of the NIO fast path — the closest an offline
  * suite gets to the HDFS code path. */
class MockHdfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockhdfs:///")
}

/** FileContext-side twin of [[MockHdfsFileSystem]] (FileContext
  * resolves `fs.AbstractFileSystem.<scheme>.impl`, not the
  * FileSystem registry). */
class MockHdfsAbstractFs(uri: java.net.URI,
                         conf: org.apache.hadoop.conf.Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new MockHdfsFileSystem, conf, "mockhdfs", false)

/** The lease file's contract in isolation (no Spark): contention,
  * crashed-holder takeover, heartbeat liveness past the TTL, and
  * token-checked release. The in-situ layers live in
  * StateCompactionSpec (compaction) and MultiInstanceSpec +
  * tools/serve_race.sh (serving). */
class FsLeaseSpec extends AnyFunSuite {

  private def freshLock() = {
    val dir = Files.createTempDirectory("graft_fslease")
    val p = new org.apache.hadoop.fs.Path(s"$dir/_test.lock")
    (p.getFileSystem(new org.apache.hadoop.conf.Configuration()), p,
      Paths.get(s"$dir/_test.lock"))
  }

  test("acquire/contend/release round-trip") {
    val (fs, lock, nio) = freshLock()
    val l1 = FsLease.acquire(fs, lock)
    assert(Files.exists(nio))
    val e = intercept[IllegalStateException] { FsLease.acquire(fs, lock) }
    assert(e.getMessage.contains("single-writer"))
    l1.release()
    assert(!Files.exists(nio), "release removes the holder's own lock")
    FsLease.acquire(fs, lock).release() // re-acquirable
  }

  test("a crashed holder's stale lock is taken over; a live one is not") {
    val (fs, lock, nio) = freshLock()
    // crashed holder: ancient embedded timestamp, no heartbeat — and an
    // mtime as old as its last beat (a fresh mtime with an ancient
    // content ts is the torn-read shape, which must NOT be taken over)
    Files.write(nio, "dead-owner 1000".getBytes("UTF-8"))
    Files.setLastModifiedTime(nio,
      java.nio.file.attribute.FileTime.fromMillis(1000))
    val l = FsLease.acquire(fs, lock, ttlMs = 60000)
    assert(new String(Files.readAllBytes(nio), "UTF-8").startsWith(l.token),
      "takeover must install the new holder's token")
    l.release()
    // live holder: fresh timestamp → contention, not takeover
    Files.write(nio,
      s"live-owner ${System.currentTimeMillis()}".getBytes("UTF-8"))
    intercept[IllegalStateException] { FsLease.acquire(fs, lock) }
    assert(Files.exists(nio), "a live peer's lock is left alone")
  }

  test("heartbeat keeps a long-running holder alive past its TTL") {
    val (fs, lock, nio) = freshLock()
    val l = FsLease.acquire(fs, lock, ttlMs = 2500) // heartbeat ~every 1 s
    try {
      Thread.sleep(4000) // well past the raw TTL
      // the heartbeat refreshed the timestamp, so a would-be taker
      // sees a LIVE holder — the TTL only reaps dead processes
      intercept[IllegalStateException] {
        FsLease.acquire(fs, lock, ttlMs = 2500)
      }
      assert(new String(Files.readAllBytes(nio), "UTF-8").startsWith(l.token))
    } finally l.release()
    assert(!Files.exists(nio))
  }

  test("a torn-read-shaped lock (ancient content ts, fresh mtime) is NOT taken over") {
    val (fs, lock, nio) = freshLock()
    // a reader catching a legacy non-atomic rewrite mid-write could see
    // 'token 17' — the truncated timestamp parses ancient, but the
    // file's own mtime is fresh (every refresh touches it). holderTs
    // must trust the fresher of the two.
    Files.write(nio, "live-owner 17".getBytes("UTF-8"))
    intercept[IllegalStateException] { FsLease.acquire(fs, lock) }
    assert(Files.exists(nio), "a live holder's torn lock is left alone")
  }

  test("heartbeat tolerates one transient foreign sighting; stops after two") {
    val (fs, lock, nio) = freshLock()
    val aside = nio.resolveSibling("_test.lock.aside")
    val l = FsLease.acquire(fs, lock, ttlMs = 2500) // beat ~every 1 s
    try {
      // --- transient: a peer's rename-aside-then-restore window. One
      // beat sees the token missing; the restore lands before the next.
      Files.move(nio, aside)
      Thread.sleep(1300) // one beat observes foreign/missing
      Files.move(aside, nio)
      val restored = new String(Files.readAllBytes(nio), "UTF-8")
      Thread.sleep(1300) // next beat sees its own token again
      val afterOwn = new String(Files.readAllBytes(nio), "UTF-8")
      assert(afterOwn.startsWith(l.token) && afterOwn != restored,
        "a single foreign sighting must not kill the heartbeat — the " +
          "next own-token beat refreshes the timestamp")

      // --- confirmed: the lock carries a successor's token on two
      // consecutive beats → the heartbeat stops for good. Writing the
      // old holder's token back must NOT revive it.
      Files.write(nio,
        s"successor-token ${System.currentTimeMillis()}".getBytes("UTF-8"))
      Thread.sleep(2600) // two beats observe the foreign token
      val planted = s"${l.token} 4242"
      Files.write(nio, planted.getBytes("UTF-8"))
      Thread.sleep(2200)
      assert(new String(Files.readAllBytes(nio), "UTF-8") == planted,
        "after two consecutive foreign sightings the heartbeat is dead " +
          "— nothing rewrites the lock")
    } finally l.release()
    // confirmed-superseded: release leaves the (now own-token) lock
    // only if unreadable — here it IS readable and carries l's token,
    // so the ordinary token-checked delete applies
    assert(!Files.exists(nio))
  }

  test("non-local scheme: create, heartbeat refresh (FileContext rename), release") {
    val dir = Files.createTempDirectory("graft_fslease_hdfs")
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.mockhdfs.impl", classOf[MockHdfsFileSystem].getName)
    conf.set("fs.AbstractFileSystem.mockhdfs.impl",
      classOf[MockHdfsAbstractFs].getName)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(java.net.URI.create("mockhdfs:///"), conf)
    assert(fs.getUri.getScheme == "mockhdfs") // the NIO fast path is off
    val lock = new org.apache.hadoop.fs.Path(s"mockhdfs://$dir/_test.lock")
    val nio = Paths.get(s"$dir/_test.lock")

    val l = FsLease.acquire(fs, lock, ttlMs = 2500) // beat ~every 1 s
    try {
      val created = new String(Files.readAllBytes(nio), "UTF-8")
      assert(created.startsWith(l.token))
      Thread.sleep(4000) // past the raw TTL: only the rename-refresh
      // keeps the holder alive on this branch
      val refreshed = new String(Files.readAllBytes(nio), "UTF-8")
      assert(refreshed.startsWith(l.token) && refreshed != created,
        "heartbeat must refresh through the FileContext rename path")
      intercept[IllegalStateException] {
        FsLease.acquire(fs, lock, ttlMs = 2500)
      }
      val hbLitter = {
        val s = Files.list(dir)
        try s.filter(_.getFileName.toString.contains(".hb.")).count()
        finally s.close()
      }
      // a beat may be mid-flight (temp written, rename pending) right
      // now; the temp name is token-fixed so at most ONE can ever
      // exist — accumulation is the failure shape
      assert(hbLitter <= 1, "refresh temp files must not accumulate")
    } finally l.release()
    assert(!Files.exists(nio), "release removes the lock on this branch too")
  }

  test("a live heartbeating holder survives an acquire hammer (no takeover, no token change)") {
    val (fs, lock, nio) = freshLock()
    val l = FsLease.acquire(fs, lock, ttlMs = 2500) // beat ~every 1 s
    try {
      // 4 threads hammering acquire with the same short TTL for ~4 s
      // (past the raw TTL twice over): every attempt must see a LIVE
      // holder — the beats keep the timestamp fresh — and the lock
      // must carry the holder's token throughout
      val denials = new java.util.concurrent.atomic.AtomicInteger(0)
      val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 4).map { t =>
        new Thread(() => {
          val stopAt = System.currentTimeMillis() + 4000
          while (System.currentTimeMillis() < stopAt) {
            try {
              val stolen = FsLease.acquire(fs, lock, ttlMs = 2500)
              anomalies.add(s"thread $t acquired a live holder's lock")
              stolen.release()
            } catch {
              case _: IllegalStateException => denials.incrementAndGet()
            }
            Thread.sleep(25)
          }
        }, s"hammer-$t")
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(anomalies.isEmpty, anomalies.toString)
      assert(denials.get() > 50, "the hammer must actually have contended")
      assert(new String(Files.readAllBytes(nio), "UTF-8").startsWith(l.token),
        "the lock must still carry the live holder's token")
    } finally l.release()
    assert(!Files.exists(nio))
  }

  test("acquireBlocking honors a bounded wait against a live holder") {
    val (fs, lock, nio) = freshLock()
    Files.write(nio,
      s"live-owner ${System.currentTimeMillis()}".getBytes("UTF-8"))
    val t0 = System.currentTimeMillis()
    intercept[IllegalStateException] {
      FsLease.acquireBlocking(fs, lock, waitMs = 400, pollMs = 50)
    }
    val waited = System.currentTimeMillis() - t0
    assert(waited >= 350 && waited < 5000,
      s"bounded wait must give up near its deadline (waited $waited ms)")
    // and an unbounded-wait caller gets the lock as soon as it frees
    Files.delete(nio)
    FsLease.acquireBlocking(fs, lock).release()
  }

  test("release is token-checked: a superseded holder can't remove its successor's lock") {
    val (fs, lock, nio) = freshLock()
    val l1 = FsLease.acquire(fs, lock)
    // simulate a takeover having replaced the lock (the l1 process
    // stalled; a peer reclaimed): the file now carries ANOTHER token
    Files.write(nio,
      s"successor-token ${System.currentTimeMillis()}".getBytes("UTF-8"))
    l1.release()
    assert(Files.exists(nio),
      "release must not delete a lock it no longer owns")
    assert(new String(Files.readAllBytes(nio), "UTF-8")
      .startsWith("successor-token"))
    Files.delete(nio)
  }

  test("env-configured TTLs clamp to 3x the heartbeat floor") {
    // a TTL at/below the 1 s heartbeat floor makes a LIVE holder look
    // permanently stale (ADVICE r13); the env-read sites clamp, direct
    // API callers (this suite's 2500 ms takeover tests) stay free
    assert(FsLease.clampConfiguredTtl(500L, "K") == FsLease.MinConfiguredTtlMs)
    assert(FsLease.clampConfiguredTtl(2000L, "K") == FsLease.MinConfiguredTtlMs)
    assert(FsLease.clampConfiguredTtl(3000L, "K") == 3000L)
    assert(FsLease.clampConfiguredTtl(60000L, "K") == 60000L)
  }
}
