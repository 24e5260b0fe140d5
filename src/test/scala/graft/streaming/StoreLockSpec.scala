package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import graft.domain.Fixtures
import graft.model.Post

/** The store-write serialization contract: every read-modify-write of a
  * post store (sink append, rewrite-and-swap compaction/delete, backfill
  * append) runs under `Ingest.lockFor(storeDir)`. Without it, rows appended
  * between a compaction's `kept` read and its recursive delete are silently
  * destroyed, and concurrent rewrites race on the tmp-dir move. This spec
  * hammers the locked paths from competing threads and asserts nothing is
  * lost for unrelated feeds — the failure mode the unsynchronized code had.
  */
class StoreLockSpec extends SparkSpec {

  private def rows(key: String, from: Int, n: Int): Seq[Post] =
    (from until from + n).map { i =>
      Post(s"at://stress/$key/$i", key, f"c$i%04d", None, None,
        new Timestamp(1700000000000L + i * 1000L))
    }

  test("lockFor is one object per normalized store path") {
    val dir = Files.createTempDirectory("graft-lock").toString
    assert(Ingest.lockFor(dir) eq Ingest.lockFor(dir + "/"))
    assert(Ingest.lockFor(dir) eq Ingest.lockFor(dir + "/x/.."))
  }

  test("withStoreLock holds an OS-level file lock a second process would contend on") {
    // the JVM monitor only serializes writers within one process; the
    // file lock on <store>/_lock is what stops two Spark APPLICATIONS
    // from interleaving read-modify-write cycles on one store dir
    val dir = Files.createTempDirectory("graft-oslock").toString
    VersionedStore.withStoreLock(dir) {
      // re-entrant: compactions call locked helpers from already-locked
      // sinks — nesting must neither self-deadlock nor trip
      // OverlappingFileLockException
      VersionedStore.withStoreLock(dir) { () }
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(dir, "_lock"),
        java.nio.file.StandardOpenOption.WRITE)
      // a second PROCESS would block on lock() / get null from tryLock();
      // the same-JVM probe surfaces the held OS lock as the overlap
      // exception — either way the lock exists at the OS level, not just
      // as a JVM monitor
      try intercept[java.nio.channels.OverlappingFileLockException] {
        ch.tryLock()
      } finally ch.close()
    }
    // and it is released on section exit: a fresh channel can take it
    val ch2 = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(dir, "_lock"),
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val l = ch2.tryLock()
      assert(l != null, "file lock not released after withStoreLock exit")
      l.release()
    } finally ch2.close()
  }

  test("store protocols run through an explicit file: scheme URI (the Hadoop FS branch)") {
    import spark.implicits._
    // a scheme'd store dir exercises FileContext.getFileContext(uri) —
    // the exact resolution path an hdfs:// store takes — instead of the
    // default-FS fallback the schemeless specs use
    val local = Files.createTempDirectory("graft-scheme-uri").resolve("store")
    val dir = "file:" + local.toString
    val conditions = Seq(Fixtures.cond(key = "keep", limitCount = 2000))
    rows("keep", 0, 10).toDF().write.partitionBy("key").parquet(dir)
    assert(Ingest.readStore(spark, dir).count() == 10)
    // one lock object regardless of spelling: scheme'd and schemeless
    // paths of the same directory are ONE store
    assert(Ingest.lockFor(dir) eq Ingest.lockFor(local.toString))
    // full rewrite-and-swap (version dir + pointer flip + GC) via the URI
    Ingest.deleteKey(spark, dir, "absent")
    assert(Files.exists(local.resolve("_current")), "pointer not written via file: URI")
    assert(Ingest.readStore(spark, dir).count() == 10)
    Ingest.retentionCompact(spark, dir, conditions)
    assert(Ingest.readStore(spark, dir).count() == 10)
  }

  test("lease lock (remote-FS form): exclusive while held, acquired on release") {
    // the HDFS branch of the process lock — no advisory locks there, so
    // withStoreLock falls back to a create-exclusive lease file. Driven
    // directly against the local FS (create-exclusive is FS-agnostic).
    val dir = Files.createTempDirectory("graft-lease").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    val release = VersionedStore.acquireLease(lease, ttlMs = 60000, pollMs = 10)
    val contenderHolds = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      val r2 = VersionedStore.acquireLease(lease, ttlMs = 60000, pollMs = 10)
      contenderHolds.set(true)
      r2()
    })
    t.start()
    Thread.sleep(300)
    assert(!contenderHolds.get(), "contender acquired a held lease")
    release()
    t.join(10000)
    assert(contenderHolds.get(), "contender never acquired after release")
  }

  /** Every `_lock.lease*` file beside `lease` — the epoch chain plus any
    * legacy bare file. */
  private def leaseFiles(lease: org.apache.hadoop.fs.Path): Seq[String] =
    StoreFs.listNames(lease.getParent)
      .filter(n => n == lease.getName || n.startsWith(lease.getName + ".e"))
      .sorted

  private def epochPath(lease: org.apache.hadoop.fs.Path, n: Long) =
    new org.apache.hadoop.fs.Path(lease.getParent, f"${lease.getName}.e$n%019d")

  test("lease lock: a dead holder's stale lease is broken after the TTL") {
    val dir = Files.createTempDirectory("graft-lease-stale").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    // a lease nobody heartbeats (the holder "crashed"): plant a BARE
    // legacy-protocol file directly, older than the TTL by the sleep
    // below — it must participate as epoch 0 (TTL-respected, then GC'd),
    // not linger forever
    StoreFs.writeString(lease, "dead@nowhere", createNew = true)
    Thread.sleep(500)
    // TTL shorter than the file's age: acquisition must break it and win
    val release = VersionedStore.acquireLease(lease, ttlMs = 200, pollMs = 20)
    assert(!StoreFs.exists(lease), "stale legacy lease not GC'd by the winner")
    release()
    // release marks the epoch file RELEASED in place (epoch numbers never
    // restart); exactly the winner's file remains, and it reads released
    assert(leaseFiles(lease) == Seq(epochPath(lease, 1L).getName),
      s"unexpected lease files after release: ${leaseFiles(lease)}")
    assert(StoreFs.readString(epochPath(lease, 1L)).startsWith("RELEASED"))
  }

  test("lease lock: heartbeat keeps a long-held lease from expiring") {
    val dir = Files.createTempDirectory("graft-lease-hb").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    // TTL 3s, heartbeat every 1s: hold past the TTL while a contender
    // polls — it must NOT break the live lease. The wide TTL/heartbeat
    // ratio is deliberate: with the old 300ms/100ms pair, a >200ms
    // scheduler stall of the heartbeat thread on a loaded CI box let the
    // contender legitimately break a live lease and flake this assert;
    // now only a multi-second stall could.
    val release = VersionedStore.acquireLease(lease, ttlMs = 3000, pollMs = 20)
    val stolen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val t = new Thread(() => {
      val r2 = VersionedStore.acquireLease(lease, ttlMs = 3000, pollMs = 20)
      stolen.set(true)
      r2()
    })
    t.start()
    Thread.sleep(4000)
    val stoleWhileHeld = stolen.get()
    release()
    t.join(10000)
    assert(!stoleWhileHeld, "contender broke a heartbeating lease")
    assert(stolen.get(), "contender never acquired after release")
  }

  test("lease lock: a taken-over holder is fenced — heartbeat stands down, release spares the new lease") {
    val dir = Files.createTempDirectory("graft-lease-fence").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    // short TTL so beats come every ~100ms and detection happens fast;
    // no contender thread — the takeover is simulated directly
    val release = VersionedStore.acquireLease(lease, ttlMs = 300, pollMs = 20)
    // simulate a contender that TTL-broke the lease and now holds it: it
    // created the NEXT epoch file (the CAS protocol's one takeover op) —
    // a name the old holder never writes
    val e2 = epochPath(lease, 2L)
    StoreFs.createExclusive(e2, "intruder@elsewhere#new-hold")
    // the holder's supersession check must stand down within a few beats
    val deadline = System.currentTimeMillis() + 5000
    while (!release.lost && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    // the takeover is visible programmatically on the handle, not just
    // as a stderr WARN — what long writer sections poll to abort early
    assert(release.lost, "LockHandle.lost did not report the takeover")
    // the old holder's release must NOT delete the new holder's lease
    // (that would hand a third contender an instant takeover)
    release()
    assert(StoreFs.exists(e2), "old holder's release deleted the new holder's lease")
    assert(StoreFs.readString(e2) == "intruder@elsewhere#new-hold",
      "old holder's heartbeat hijacked the new holder's lease")
    // the stood-down holder's own superseded epoch file is cleaned up —
    // it must not linger as a fresh-looking highest once e2 releases
    assert(leaseFiles(lease) == Seq(e2.getName),
      s"unexpected lease files after the takeover: ${leaseFiles(lease)}")
  }

  test("CAS lease: a TTL-break cannot be overwritten — the old holder's beats never touch the new epoch") {
    val dir = Files.createTempDirectory("graft-lease-cas").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    // beats every ~66ms: many beats fire inside the watch window below
    val release = VersionedStore.acquireLease(lease, ttlMs = 200, pollMs = 10)
    val breaker = epochPath(lease, 2L)
    StoreFs.createExclusive(breaker, "breaker@elsewhere#cas")
    // In the r15 overwrite-in-place protocol the beat/break race had a
    // write-wins ordering that clobbered the new lease and was
    // undetectable by content. In the epoch protocol the beat writes only
    // its OWN file, so the breaker's must stay byte-identical at EVERY
    // sample while beats are firing — not merely at the end.
    val until = System.currentTimeMillis() + 1000
    while (System.currentTimeMillis() < until) {
      assert(StoreFs.readString(breaker) == "breaker@elsewhere#cas",
        "old holder's heartbeat overwrote the takeover lease")
      Thread.sleep(20)
    }
    // detection latency is one beat nominally, but a CI-loaded box can
    // stall the heartbeat thread — poll with a generous deadline
    val lostBy = System.currentTimeMillis() + 10000
    while (!release.lost && System.currentTimeMillis() < lostBy)
      Thread.sleep(20)
    assert(release.lost, "takeover never detected")
    release()
    // the stood-down holder re-took nothing: the breaker's epoch is the
    // one and only lease file left
    assert(leaseFiles(lease) == Seq(breaker.getName),
      s"unexpected lease files after the takeover: ${leaseFiles(lease)}")
    assert(StoreFs.readString(breaker) == "breaker@elsewhere#cas")
  }

  test("CAS lease: contenders racing to break one expired lease — exactly one ever holds") {
    val dir = Files.createTempDirectory("graft-lease-race").toString
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    // a dead holder's epoch file, expired when the racers start: every
    // racer sees it breakable at once — the double-break shape the r15
    // protocol could not arbitrate (its break was check-then-delete).
    // The TTL is WIDE (the heartbeat-test lesson: a sub-second TTL lets a
    // CI scheduler stall of a live holder's beat turn into a legitimate
    // break, which this spec would report as an overlap); only the FIRST
    // acquisition waits on it — every later handoff takes the RELEASED
    // fast path, so the storm still runs in seconds
    StoreFs.createExclusive(epochPath(lease, 1L), "dead@nowhere")
    Thread.sleep(3300)
    val inSection = new java.util.concurrent.atomic.AtomicInteger(0)
    val acquired = new java.util.concurrent.atomic.AtomicInteger(0)
    val overlap = new java.util.concurrent.atomic.AtomicBoolean(false)
    val threads = (1 to 6).map { _ =>
      new Thread(() => {
        val r = VersionedStore.acquireLease(lease, ttlMs = 3000, pollMs = 5)
        if (inSection.incrementAndGet() != 1) overlap.set(true)
        Thread.sleep(30)
        if (inSection.decrementAndGet() != 0) overlap.set(true)
        acquired.incrementAndGet()
        r()
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive), "a contender hung")
    assert(!overlap.get(),
      "two contenders held the lease simultaneously (double break)")
    assert(acquired.get() == 6, s"only ${acquired.get()} of 6 ever acquired")
    // each winner GC'd everything below it; the last holder's RELEASED
    // file is the single survivor (epoch numbers never restart)
    assert(leaseFiles(lease).size == 1,
      s"lease files left behind: ${leaseFiles(lease)}")
  }

  test("store lock: refuses a store rooted on a non-atomic-rename scheme, override respected") {
    // raw object stores have copy+delete rename — the pointer-flip
    // protocols are unsound there; the writer choke point must refuse
    val e = intercept[IllegalArgumentException] {
      VersionedStore.withStoreLock("s3a://bucket/store") { fail("body must not run") }
    }
    assert(e.getMessage.contains("non-atomic"), e.getMessage)
    assert(e.getMessage.contains("Delta/Iceberg"), e.getMessage)
    // with the deliberate-run override the refusal is lifted: the call
    // then fails on the MISSING s3a connector (not on the contract),
    // which proves the gate itself stepped aside
    System.setProperty("graft.store.allowNonAtomicRename", "true")
    try {
      val e2 = intercept[Exception] {
        VersionedStore.withStoreLock("s3a://bucket/store") { () }
      }
      assert(!e2.getMessage.contains("non-atomic"), e2.getMessage)
    } finally System.clearProperty("graft.store.allowNonAtomicRename")
    // local and hdfs-style schemes pass the gate untouched
    StoreFs.requireAtomicRename("/tmp/local-store")
    StoreFs.requireAtomicRename("file:///tmp/local-store")
  }

  test("deliberate override runs the full lease protocol on a mock object-store scheme") {
    // the blocklist-override branch EXECUTED, not just reached: oss:// is
    // blocklisted and non-local, and the test classpath registers it as a
    // local-FS delegate (MockOssFs via core-site.xml), so with the
    // override set the section runs the REMOTE form end-to-end — lease
    // file (not an OS lock), StoreFs protocol ops through a second
    // FileContext scheme, release cleanup
    val local = Files.createTempDirectory("graft-ossmock")
    val dir = s"oss://bucket:9000$local/store"
    val root = new org.apache.hadoop.fs.Path(dir)
    val lease = new org.apache.hadoop.fs.Path(root, "_lock.lease")
    // without the override, the choke point refuses the scheme outright
    val e = intercept[IllegalArgumentException] {
      VersionedStore.withStoreLock(dir) { fail("body must not run") }
    }
    assert(e.getMessage.contains("non-atomic"), e.getMessage)
    System.setProperty("graft.store.allowNonAtomicRename", "true")
    try {
      var ranBody = false
      VersionedStore.withStoreLock(dir) {
        ranBody = true
        assert(leaseFiles(lease).exists(_.startsWith("_lock.lease.e")),
          "remote branch must hold a LEASE epoch file")
        assert(!VersionedStore.lockLost(dir), "fresh hold must not report lost")
        // the pointer-flip op sequence (tmp write + atomic-overwrite
        // rename + read-back) against the mock scheme — what swap() runs
        val tmp = new org.apache.hadoop.fs.Path(root, "_current.tmp")
        StoreFs.writeString(tmp, "_v0000000000000000001")
        StoreFs.rename(tmp, new org.apache.hadoop.fs.Path(root, "_current"),
          overwrite = true)
        assert(VersionedStore.currentVersion(root).contains("_v0000000000000000001"))
        assert(VersionedStore.versionDir(dir) == s"$dir/_v0000000000000000001")
      }
      assert(ranBody, "override did not let the writer section run")
      // clean release = the epoch file is RELEASED-marked, not held
      val after = leaseFiles(lease)
      assert(after.size == 1 && StoreFs.readString(
        new org.apache.hadoop.fs.Path(root, after.head)).startsWith("RELEASED"),
        s"lease not released cleanly: $after")
      // the delegate really is the local FS: the flip is visible there
      assert(Files.exists(local.resolve("store").resolve("_current")))
    } finally System.clearProperty("graft.store.allowNonAtomicRename")
  }

  /** Simulate a TTL takeover inside a held section: create the NEXT epoch
    * file beside `lease` with `intruder` as its token — exactly what a
    * contender's break leaves — and poll until the holder's heartbeat
    * detects the supersession. Returns the intruder's epoch path (the
    * holder can never write to it). Asserts detection. */
  private def takeOverLease(dir: String, lease: org.apache.hadoop.fs.Path,
      intruder: String): org.apache.hadoop.fs.Path = {
    val held = leaseFiles(lease).filter(_.startsWith(lease.getName + ".e"))
      .map(_.stripPrefix(lease.getName + ".e").toLong)
    val p = epochPath(lease, held.max + 1)
    StoreFs.createExclusive(p, intruder)
    val deadline = System.currentTimeMillis() + 10000
    while (!VersionedStore.lockLost(dir) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(VersionedStore.lockLost(dir), "holder never detected the takeover")
    p
  }

  test("a mid-section lease takeover surfaces programmatically: lockLost polls true, withStoreLock throws") {
    val local = Files.createTempDirectory("graft-osslost")
    val dir = s"oss://bucket:9000$local/store"
    val lease = new org.apache.hadoop.fs.Path(dir, "_lock.lease")
    val intruder = "intruder@elsewhere#takeover"
    System.setProperty("graft.store.allowNonAtomicRename", "true")
    System.setProperty("graft.store.leaseTtlMs", "300") // beats every ~100ms
    try {
      var intruderLease: org.apache.hadoop.fs.Path = null
      val thrown = intercept[LeaseLostException] {
        VersionedStore.withStoreLock(dir) {
          // the poll a long writer section uses to abort between stages
          intruderLease = takeOverLease(dir, lease, intruder)
          "section-completed"
        }
      }
      assert(thrown.getMessage.contains("taken over"), thrown.getMessage)
      // release spared the new holder's (higher-epoch) lease
      assert(StoreFs.readString(intruderLease) == intruder,
        "release clobbered the new holder's lease")
    } finally {
      System.clearProperty("graft.store.allowNonAtomicRename")
      System.clearProperty("graft.store.leaseTtlMs")
    }
  }

  test("a swap under a lost lease aborts before the pointer flip — nothing published") {
    val local = Files.createTempDirectory("graft-ossswap")
    val dir = s"oss://bucket:9000$local/store"
    val root = new org.apache.hadoop.fs.Path(dir)
    val lease = new org.apache.hadoop.fs.Path(root, "_lock.lease")
    val intruder = "intruder@elsewhere#swap-abort"
    System.setProperty("graft.store.allowNonAtomicRename", "true")
    System.setProperty("graft.store.leaseTtlMs", "300")
    try {
      // the outer section also reports the loss on exit — intercepted too
      intercept[LeaseLostException] {
        VersionedStore.withStoreLock(dir) {
          takeOverLease(dir, lease, intruder)
          // the rewrite funnel must refuse to PUBLISH under the lost
          // lease: version written, then dropped at the abort point —
          // never renamed in, pointer never flipped
          val inner = intercept[LeaseLostException] {
            VersionedStore.swap(dir, tmp =>
              StoreFs.writeString(new org.apache.hadoop.fs.Path(tmp, "part-0"), "x"))
          }
          assert(inner.getMessage.contains("aborting the swap"), inner.getMessage)
          val names = StoreFs.listNames(root)
          assert(!names.exists(_.matches("_v\\d+")), s"version published under lost lease: $names")
          assert(!names.exists(_.endsWith(".tmp")), s"aborted tmp not cleaned: $names")
          assert(VersionedStore.currentVersion(root).isEmpty, "pointer flipped under lost lease")
        }
      }
    } finally {
      System.clearProperty("graft.store.allowNonAtomicRename")
      System.clearProperty("graft.store.leaseTtlMs")
    }
  }

  test("concurrent appends, deletes and compactions lose no unrelated rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stress").resolve("store").toString
    val conditions = Seq(Fixtures.cond(key = "keep", limitCount = 2000),
      Fixtures.cond(key = "doomed", limitCount = 2000))

    // seed both feeds; seeding is single-threaded so a plain write is fine
    (rows("keep", 0, 5) ++ rows("doomed", 0, 5)).toDF()
      .write.partitionBy("key").parquet(dir)

    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit): Unit = pool.execute { () =>
      start.await()
      try body catch { case t: Throwable => failures.add(t) }
    }

    val batches = 6
    // appender: the sink's locked read-dedup-append sequence
    task {
      for (b <- 1 to batches) {
        Ingest.lockFor(dir).synchronized {
          val stored = Ingest.readStore(spark, dir)
          val fresh = graft.operators.Upsert.newRows(
            stored, rows("keep", b * 100, 5).toDF(), Seq("uri", "key"))
          // appends resolve the CURRENT version dir, like the sink does —
          // a raw-root append after the first swap would write into a
          // directory readers no longer resolve
          fresh.write.mode("append").partitionBy("key")
            .parquet(Ingest.versionDir(dir))
        }
      }
    }
    // deleter: admin deleteCondition path, repeatedly (idempotent)
    task { for (_ <- 1 to 4) Ingest.deleteKey(spark, dir, "doomed") }
    // compactor: retention rewrite-and-swap over the whole store
    task { for (_ <- 1 to 3) Ingest.retentionCompact(spark, dir, conditions) }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "stress threads hung")
    assert(failures.isEmpty, s"store mutation threw: ${failures.peek()}")

    val store = Ingest.readStore(spark, dir)
    val kept = store.filter($"key" === "keep").select("uri").as[String].collect().toSet
    val expected = (rows("keep", 0, 5) ++
      (1 to batches).flatMap(b => rows("keep", b * 100, 5))).map(_.uri).toSet
    assert(kept == expected,
      s"lost ${(expected -- kept).size} keep-rows, gained ${(kept -- expected).size}")
    assert(store.filter($"key" === "doomed").count() == 0L)
  }

  test("serving reads stay exact while rewrites swap store versions under them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snapshot").resolve("store").toString
    val conditions = Seq(Fixtures.cond(key = "keep", limitCount = 2000))
    rows("keep", 0, 20).toDF().write.partitionBy("key").parquet(dir)

    // writer: a stream of rewrites — deleteKey on an absent feed is a
    // full rewrite-and-swap of identical content, the worst case for a
    // concurrent reader (files replaced every iteration)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var writing = true
    pool.execute { () =>
      start.await()
      try {
        for (_ <- 1 to 5) {
          Ingest.deleteKey(spark, dir, "absent")
          Ingest.retentionCompact(spark, dir, conditions)
        }
      } catch { case t: Throwable => failures.add(t) }
      finally writing = false
    }
    // reader: the serving path — readStore WITHOUT the writer lock, page
    // materialized lazily while swaps land. Every read must see exactly
    // the 20 rows (old snapshot or new — never a half-deleted store).
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    pool.execute { () =>
      start.await()
      try {
        while (writing) {
          val n = Ingest.readStore(spark, dir).filter($"key" === "keep").count()
          assert(n == 20L, s"reader saw $n of 20 rows mid-swap")
          reads.incrementAndGet()
        }
      } catch { case t: Throwable => failures.add(t) }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "threads hung")
    assert(failures.isEmpty, s"concurrent read/swap failed: ${failures.peek()}")
    assert(reads.get() >= 3, s"reader only completed ${reads.get()} reads — not concurrent")
    // the store root is versioned now: a pointer plus the current version
    // and at most GraceVersions superseded ones
    val root = java.nio.file.Paths.get(dir)
    assert(Files.exists(root.resolve("_current")))
  }

  test("grace window protects versions by literal name across numbering schemes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-scheme").resolve("store").toString
    val root = java.nio.file.Paths.get(dir)
    // a store whose current version was named under a different scheme
    // (e.g. the old nanoTime numbering): huge number, same _v prefix
    val huge = f"_v${987654321012345678L}%019d"
    Files.createDirectories(root)
    rows("keep", 0, 8).toDF().write.partitionBy("key")
      .parquet(root.resolve(huge).toString)
    Files.write(root.resolve("_current"), huge.getBytes)
    assert(Ingest.readStore(spark, dir).count() == 8L)
    // one swap: the superseded old-scheme version must survive the grace
    // window (keep-set is by literal directory name, not re-formatted)
    Ingest.deleteKey(spark, dir, "absent")
    assert(Files.exists(root.resolve(huge)), "old-scheme version GC'd inside grace")
    assert(Ingest.readStore(spark, dir).count() == 8L)
    // two more swaps push it past GraceVersions — then it may go
    Ingest.deleteKey(spark, dir, "absent")
    Ingest.deleteKey(spark, dir, "absent")
    assert(!Files.exists(root.resolve(huge)), "old-scheme version never GC'd")
    assert(Ingest.readStore(spark, dir).count() == 8L)
  }

  test("swapStore recovers from crash leftovers: orphan versions and stale tmps") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-crash").resolve("store").toString
    val conditions = Seq(Fixtures.cond(key = "keep", limitCount = 2000))
    rows("keep", 0, 12).toDF().write.partitionBy("key").parquet(dir)
    // first rewrite versions the store as _v1
    Ingest.deleteKey(spark, dir, "absent")
    val root = java.nio.file.Paths.get(dir)
    def v(n: Long) = root.resolve(f"_v$n%019d")
    assert(Files.exists(v(1)))
    // crash window A: a version dir moved into place but the pointer never
    // flipped (orphan _v2) — naive prev+1 allocation would collide with it
    Files.createDirectory(v(2))
    Files.write(v(2).resolve("junk"), "not parquet".getBytes)
    // crash window B: an aborted version write left a stale tmp — both the
    // legacy shared name and the r15 holder-unique suffix form
    val staleTmp = root.resolve(f"_v${9L}%019d.tmp")
    Files.createDirectory(staleTmp)
    Files.write(staleTmp.resolve("part-junk"), Array[Byte](1, 2, 3))
    val staleTmpUnique = root.resolve(f"_v${9L}%019d.tmp-deadbeef")
    Files.createDirectory(staleTmpUnique)
    Files.write(staleTmpUnique.resolve("part-junk"), Array[Byte](4, 5))
    // the next rewrite must allocate PAST the orphan, keep the data exact,
    // and GC both leftovers
    Ingest.retentionCompact(spark, dir, conditions)
    assert(Ingest.readStore(spark, dir).filter($"key" === "keep").count() == 12L)
    assert(!Files.exists(v(2)), "orphan version not GC'd")
    assert(!Files.exists(staleTmp), "stale tmp not GC'd")
    assert(!Files.exists(staleTmpUnique), "holder-unique stale tmp not GC'd")
    assert(Files.exists(v(3)), "allocation did not skip past the orphan")
    // and the store keeps working: another full swap on top
    Ingest.deleteKey(spark, dir, "keep")
    assert(Ingest.readStore(spark, dir).count() == 0L)
  }
}
