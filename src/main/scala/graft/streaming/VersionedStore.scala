package graft.streaming

import org.apache.hadoop.fs.Path

/** The versioned-directory + atomic-pointer-flip pattern shared by every
  * on-disk store in the engine (the events feed store in [[Ingest]], the
  * IVF index in [[IvfStore]]): a per-store writer lock serializes
  * read-modify-write cycles, while serving readers materialize lazily
  * AFTER resolving the current version — so a rewrite that deleted files
  * in place could yank them out from under an in-flight scan. Rewrites
  * therefore land as a NEW `_vNNN` directory and an atomically-replaced
  * `_current` pointer file; readers keep streaming the version they
  * resolved (it survives [[GraceVersions]] more swaps) and the next
  * resolve sees the new one. SQLite gives the reference this snapshot
  * isolation transactionally; Delta/Iceberg give it to a real deployment
  * via manifest snapshots — this is the parquet-harness form.
  *
  * Filesystem: every metadata op routes through [[StoreFs]] (the Hadoop
  * `FileContext` API), so the same protocol runs on the local FS (tests,
  * harness) and HDFS (where rename is an atomic namespace op) — see
  * [[StoreFs]] for the per-backend atomicity contract and why a raw
  * object store needs the Delta/Iceberg form instead.
  *
  * Version dirs are underscore-prefixed so Spark's hidden-path filter
  * EXCLUDES them from a listing of the root: a reader that resolved a
  * legacy (pre-versioning) root just before the first swap keeps seeing
  * only the legacy files, never legacy + _v1 double-counted (an
  * explicitly-given `_v...` root still reads fine — only discovered
  * children are filtered).
  */
/** Thrown by [[VersionedStore.withStoreLock]] when the section's
  * cross-process LEASE was taken over mid-hold (TTL break while this
  * holder was alive — see [[VersionedStore.acquireLease]]): the body ran
  * to completion, but its writes may interleave with the new holder's,
  * so the commit must not be reported clean. Callers catch this to mark
  * the affected epoch suspect instead of crashing the pipeline. */
private[graft] final class LeaseLostException(msg: String)
  extends java.io.IOException(msg)

/** A held cross-process store lock: `apply()` releases it (the
  * historical `() => Unit` shape, so call sites read `release()`), and
  * [[lost]] reports whether the holder has detected its lease taken
  * over by a TTL break — long writer sections poll it between stages
  * ([[VersionedStore.lockLost]]) to abort early instead of finishing
  * blind. OS file locks (the local form) can never be taken over, so
  * their handle always reports false. */
private[graft] final class LockHandle(releaseFn: () => Unit,
    lostFn: () => Boolean) extends (() => Unit) {
  def apply(): Unit = releaseFn()
  def lost: Boolean = lostFn()
}

private[graft] object VersionedStore {

  /** One lock per store directory (normalized), JVM-wide. Spark task
    * threads never take it, so holding it across a job is deadlock-free. */
  private val storeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(storeDir: String): Object =
    storeLocks.computeIfAbsent(StoreFs.qualifiedKey(storeDir), _ => new Object)

  /** The store's writer critical section: the JVM monitor ([[lockFor]])
    * plus a cross-process lock, so two Spark APPLICATIONS publishing/
    * compacting one store directory serialize instead of interleaving
    * swaps (the JVM monitor alone only covers one process — the round-11
    * gap). The monitor is taken FIRST, so within a process only one
    * thread ever touches the process lock (same-JVM overlap on the local
    * form would throw OverlappingFileLockException rather than block);
    * re-entrant per thread, because compactions call locked helpers from
    * already-locked batch sinks.
    *
    * The process lock has two forms, dispatched on the store's scheme:
    * on a LOCAL store it is an OS advisory file lock on `<store>/_lock`
    * (`FileChannel.lock()` BLOCKS until the other process releases —
    * writer sections are read-modify-write cycles that must serialize,
    * not fail). On a remote FS (HDFS) there are no advisory locks, so it
    * is an EPOCH-CHAIN lease under `<store>/_lock.lease.e<N>` with a
    * heartbeat and a TTL takeover ([[acquireLease]]): acquisition and
    * break are one atomic create-exclusive of the next epoch file, so
    * lease ownership itself is CAS-protected — two writers can never
    * both break one expired lease, and a stale heartbeat can never
    * overwrite a takeover. What a table format's transaction log still
    * adds is fencing the DATA writes of a TTL-broken holder's in-flight
    * section (see the residuals on [[acquireLease]]). Readers never take
    * any lock (versioned swaps + the grace window are what protect
    * them). The `_lock`/`_lock.lease*` files are neither version dirs
    * nor legacy data, so [[swap]]'s GC never touches them. */
  private val lockHolds = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
  }
  /** This thread's live cross-process handles, for [[lockLost]] polling
    * from inside a section (outermost hold only — re-entrant holds share
    * the outer handle). */
  private val activeHandles = new ThreadLocal[scala.collection.mutable.Map[String, LockHandle]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, LockHandle]
  }

  /** Poll from INSIDE a [[withStoreLock]] section: has this section's
    * cross-process lease been lost to a TTL takeover? Long writer
    * sections check between stages and abort early — every write after a
    * takeover deepens the split-brain interleaving with the new holder.
    * Always false for the local OS-file-lock form (not breakable) and
    * outside any section. */
  def lockLost(storeDir: String): Boolean =
    activeHandles.get().get(StoreFs.qualifiedKey(storeDir)).exists(_.lost)

  def withStoreLock[T](storeDir: String)(body: => T): T = {
    // every writer path enters here — the one choke point where the
    // atomicity contract can be enforced before any protocol state exists
    StoreFs.requireAtomicRename(storeDir)
    val key = StoreFs.qualifiedKey(storeDir)
    lockFor(storeDir).synchronized {
      val holds = lockHolds.get()
      if (holds.getOrElse(key, 0) > 0) {
        holds(key) += 1
        try body finally holds(key) -= 1
      } else {
        val release = acquireProcessLock(storeDir)
        activeHandles.get()(key) = release
        try {
          holds(key) = 1
          val out = try body finally holds(key) = 0
          // surface a mid-section takeover even to callers that never
          // polled [[lockLost]]: the body completed, but its writes may
          // interleave with the new holder's — the epoch is suspect and
          // must not be reported clean. Thrown HERE (not from release(),
          // which stays non-throwing so cleanup can't mask a body
          // exception).
          if (release.lost)
            throw new LeaseLostException(s"store lock on '$storeDir' was " +
              "taken over mid-section (TTL break while this holder was " +
              "alive); writes from this section may interleave with the " +
              "new holder's — audit the affected epoch before trusting it")
          out
        } finally {
          activeHandles.get().remove(key)
          release()
        }
      }
    }
  }

  /** Take the cross-process half of the writer lock; returns the held
    * handle (release + takeover poll). Caller holds the JVM monitor. */
  private def acquireProcessLock(storeDir: String): LockHandle = {
    val root = new Path(storeDir)
    StoreFs.mkdirs(root)
    if (StoreFs.isLocal(root)) {
      val raf = new java.io.RandomAccessFile(
        new java.io.File(StoreFs.localFile(root), "_lock"), "rw")
      val l = raf.getChannel.lock()
      new LockHandle(() => { l.release(); raf.close() }, () => false)
    } else acquireLease(new Path(root, "_lock.lease"))
  }

  /** Lease TTL: a holder that misses heartbeats for this long is presumed
    * dead and its lease breakable. Heartbeats land every TTL/3, so only a
    * full process death (not a long write — writes don't block the
    * heartbeat thread) ever lets a lease expire. Deployment-tunable via
    * `-Dgraft.store.leaseTtlMs` (shorter = faster crash recovery, more
    * sensitivity to GC/scheduler stalls; the 5-minute default rides out
    * any plausible driver pause). */
  private[streaming] def LeaseTtlMs: Long =
    sys.props.get("graft.store.leaseTtlMs") match {
      case None => 5 * 60 * 1000L
      case Some(v) => try v.trim.toLong catch {
        // fail with the property named: a bare NumberFormatException from
        // deep inside lock acquisition gives the operator nothing to act on
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"-Dgraft.store.leaseTtlMs must be a plain millisecond count, got '$v'")
      }
    }

  /** EPOCH-CHAIN lease acquisition for filesystems without advisory
    * locks — compare-and-swap derived from atomic create-exclusive
    * ([[StoreFs.createExclusive]]; the r15 protocol's overwrite-in-place
    * heartbeat and delete-then-create TTL break are both gone, and with
    * them their two hijack races).
    *
    * The lease is the HIGHEST-numbered `<base>.e<N>` file beside `lease`
    * (a bare legacy `<base>` file from the pre-epoch protocol counts as
    * epoch 0, so crash leftovers are TTL-respected and then GC'd).
    * Acquisition and TTL takeover are the SAME one operation: observe the
    * highest epoch expired (mtime older than `ttlMs`) or absent, then
    * create-exclusive `<base>.e<highest+1>` — of N racers targeting that
    * name exactly one wins, so two contenders can never both break one
    * expired lease. A holder's heartbeat bumps the mtime of its OWN
    * epoch file every `ttlMs/3` — a name no other participant ever
    * writes — so a TTL break cannot be overwritten by a stale beat, BY
    * CONSTRUCTION: the new holder's lease is a different, higher-numbered
    * file. The beat detects supersession (a higher epoch exists, or the
    * winner's GC removed our file) and stands down; a post-create fence
    * re-lists after every win and abandons the claim if a higher epoch
    * already exists (a stale listing can resurrect a GC'd epoch name, and
    * max-epoch ownership is the invariant every participant reads).
    *
    * The highest epoch file is NEVER deleted — a clean release marks it
    * `RELEASED` in place (still the holder's own name) and the next
    * winner GCs it from above. That keeps the on-disk epoch number
    * monotonically increasing forever, which is what makes the
    * post-create fence sound: any name a stale laggard can resurrect is
    * strictly BELOW the live lease, so the fence always sees the higher
    * epoch and abandons. (If release deleted the highest file, numbering
    * would restart and a resurrected mid number could out-rank a live
    * low one.) Steady-state footprint is one small file per store.
    *
    * Residuals, honestly: (a) the staleness check compares THIS process's
    * clock against the filesystem's mtime stamp (the NameNode's clock on
    * HDFS), so client/server skew beyond the heartbeat slack
    * (ttl − ttl/3 ≈ 3.3 min at the default) can break a live lease or
    * delay breaking a dead one — size the TTL with the deployment's clock
    * discipline in mind. (b) a TTL-broken holder's writer section is
    * still RUNNING until its next beat notices (≤ ttl/3) — the takeover
    * is detected, fenced at the publish points ([[swap]]'s abort,
    * [[withStoreLock]]'s terminal [[LeaseLostException]]), and never
    * hijacks the lease itself, but data writes issued inside that window
    * can interleave; only a transactional commit log (Delta/Iceberg)
    * closes the data-plane window, which is why that remains the stated
    * 100 TB deployment form. */
  private[streaming] def acquireLease(lease: Path,
      ttlMs: Long = LeaseTtlMs, pollMs: Long = 100L): LockHandle = {
    // unique per ACQUISITION, not per process: two holds from one process
    // must never alias in the WARN trail
    val token = s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}#${java.util.UUID.randomUUID()}"
    val parent = lease.getParent
    val base = lease.getName
    def epochPath(name: String) = new Path(parent, name)
    // (name, epoch) pairs on disk; one namespace listing, same cost class
    // as the pointer read every store op already pays
    def epochsNow(): Seq[(String, Long)] =
      StoreFs.listNames(parent).flatMap { n =>
        if (n == base) Some(n -> 0L)
        else if (n.startsWith(base + ".e")) {
          val d = n.substring(base.length + 2)
          // tolerate foreign junk beside the lease: 19 digits bounds the
          // LENGTH but not the VALUE (19 nines > Long.MaxValue), and an
          // uncaught NumberFormatException here would kill the heartbeat
          // thread — the lease would then silently expire mid-section
          // with `lost` never set. Unparseable names are simply not
          // epochs; they are ignored like any other non-lease file.
          if (d.nonEmpty && d.length <= 19 && d.forall(_.isDigit))
            d.toLongOption.map(n -> _)
          else None
        } else None
      }

    // one create-exclusive attempt at epoch `num`; None = lost the race
    // (or abandoned at the post-create fence) — caller re-lists and loops
    def tryTake(num: Long): Option[LockHandle] = {
      val own = epochPath(f"$base.e$num%019d")
      try StoreFs.createExclusive(own, token)
      catch { case _: java.io.IOException => return None }
      if (epochsNow().exists(_._2 > num)) {
        // post-create fence: our listing was stale and we resurrected a
        // name below the real lease — abandon (our own name is ours alone
        // to delete; the real holder's file is untouched)
        try StoreFs.deleteRecursively(own)
        catch { case _: java.io.IOException => () }
        return None
      }
      // won: GC strictly-lower epochs — superseded holders' leftovers and
      // the legacy bare file; never a live lease (ours is the highest)
      epochsNow().filter(_._2 < num).foreach { case (n, _) =>
        try StoreFs.deleteRecursively(epochPath(n))
        catch { case _: java.io.IOException => () }
      }
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
      // LOUD on purpose: standing down bounds the split-brain but does
      // not undo it — the holder's in-flight writer section overlapped
      // the new holder's. The operator needs the evidence to audit the
      // affected epoch; [[withStoreLock]] additionally surfaces it
      // programmatically (LeaseLostException + lockLost).
      def standDown(foreign: String): Unit = {
        lost.set(true)
        // drop our own (now superseded) epoch file so it cannot linger as
        // a fresh-looking highest after the winner releases: a beat that
        // raced the winner's GC may have resurrected it. Own name only,
        // content-guarded — never the new holder's file.
        try {
          val c = try Some(StoreFs.readString(own))
          catch { case _: java.io.IOException => None }
          if (c.contains(token)) StoreFs.deleteRecursively(own)
        } catch { case _: java.io.IOException => () }
        System.err.println(s"[store] WARN lease $lease LOST to '$foreign' " +
          s"(this holder '$token' was TTL-broken mid-section; " +
          "writes from this section may interleave with the new holder's)")
      }
      val hb = new Thread(() => {
        while (!stop.get() && !lost.get()) {
          try Thread.sleep(math.max(1L, ttlMs / 3))
          catch { case _: InterruptedException => () }
          if (!stop.get() && !lost.get())
            try {
              // refresh = rewrite OUR OWN epoch file (mtime bump). No other
              // participant ever writes this name, so unlike the r15
              // overwrite-in-place form this write can never land on a new
              // holder's lease, whatever the interleaving.
              val cur = try Some(StoreFs.readString(own))
              catch { case _: java.io.FileNotFoundException => None }
              cur match {
                case Some(c) if c == token => StoreFs.writeString(own, token)
                case None =>
                  // our file is gone and we didn't release: a higher-epoch
                  // winner's GC removed it — we were taken over
                  standDown("(own epoch file removed by a takeover's GC)")
                case Some(other) if other.nonEmpty =>
                  standDown(other) // defensive: foreign bytes under our name
                case _ => () // half-written read: skip the beat
              }
              // supersession check: any higher epoch IS a completed takeover
              if (!lost.get())
                epochsNow().filter(_._2 > num).maxByOption(_._2).foreach {
                  case (n, _) =>
                    val who = try StoreFs.readString(epochPath(n))
                    catch { case _: java.io.IOException => n }
                    standDown(who)
                }
            } catch { case _: java.io.IOException => () } // transient: skip beat
        }
      }, s"graft-lease-heartbeat-$own")
      hb.setDaemon(true)
      hb.start()
      Some(new LockHandle(() => {
        stop.set(true); hb.interrupt()
        // join BEFORE the release mark: an in-flight beat already past its
        // stop-check would otherwise re-stamp the token AFTER the mark and
        // stall the next writer for a full TTL
        try hb.join(ttlMs) catch { case _: InterruptedException => () }
        // clean release = mark RELEASED in place, never delete: the
        // highest epoch file must survive so epoch numbers stay monotonic
        // (see the scaladoc); the next winner GCs it
        if (!lost.get())
          try StoreFs.writeString(own, s"$Released $token")
          catch { case _: java.io.IOException => () } // next writer waits a TTL
        else System.err.println(s"[store] WARN release of $own skipped — " +
          "the lease was taken over mid-hold (see the LOST warning above); " +
          "audit the store for interleaved writes from the overlap window")
      }, () => lost.get()))
    }

    var release: LockHandle = null
    while (release == null) {
      epochsNow().maxByOption(_._2) match {
        case None => release = tryTake(1L).orNull // first-ever acquisition
        case Some((name, num)) =>
          val p = epochPath(name)
          // a cleanly-released lease is acquirable NOW (no TTL wait); a
          // half-read of an in-flight release mark just falls through to
          // the mtime check, which the mark's write has freshened — worst
          // case one TTL of latency, never a correctness issue
          val released =
            try StoreFs.readString(p).startsWith(Released)
            catch { case _: java.io.IOException => false }
          val age =
            try Some(System.currentTimeMillis() - StoreFs.modificationTime(p))
            catch { case _: java.io.IOException => None } // vanished: re-list
          age match {
            case _ if released => release = tryTake(num + 1).orNull
            case Some(a) if a <= ttlMs => // held and alive: wait
              try Thread.sleep(pollMs) catch { case _: InterruptedException => () }
            case Some(_) => release = tryTake(num + 1).orNull // expired: supersede
            case None => // vanished mid-check: brief bounded backoff before
              // re-listing — an unslept loop busy-spins at full speed on a
              // remote FS during a release/GC race window
              try Thread.sleep(math.max(1L, pollMs / 2))
              catch { case _: InterruptedException => () }
          }
      }
    }
    release
  }

  /** Content prefix marking a cleanly-released epoch file (the file stays
    * so epoch numbers never restart — see [[acquireLease]]). */
  private val Released = "RELEASED"

  /** How many superseded versions survive each swap. A reader must
    * straddle GraceVersions+1 swaps between resolving the pointer and
    * finishing its scan before its files can vanish; swaps are retention
    * cycles or admin ops (seconds-to-minutes apart) while serving scans
    * are sub-second, so 2 is already far beyond the observable window. */
  val GraceVersions = 2

  private val CurrentPtr = "_current"

  def currentVersion(root: Path): Option[String] = {
    val ptr = new Path(root, CurrentPtr)
    if (StoreFs.exists(ptr)) Some(StoreFs.readString(ptr).trim)
    else None
  }

  /** The directory holding the store's CURRENT version files; appends and
    * reads both resolve through here. Falls back to the root itself for a
    * legacy (never-swapped) store. */
  def versionDir(storeDir: String): String = {
    val root = new Path(storeDir)
    currentVersion(root).map(v => new Path(root, v).toString).getOrElse(storeDir)
  }

  private def writePointer(root: Path, version: String): Unit =
    // atomic on HDFS and POSIX; see StoreFs.publishString for the
    // contract and the object-store caveat
    StoreFs.publishString(new Path(root, CurrentPtr), version,
      CurrentPtr + ".tmp")

  /** Land the next version: `writeVersion` populates a `.tmp` directory
    * beside the live data, which is then renamed into place, the pointer
    * atomically flipped, and everything older than the versions readers
    * may still be streaming garbage-collected. Caller holds [[lockFor]].
    *
    * Version numbers are derived from the predecessor (not wall/monotonic
    * clocks — System.nanoTime may be negative and would produce a name
    * the GC regex treats as garbage), and allocate PAST any version dir
    * already on disk, not just past the pointer: a crash between the
    * version rename and the pointer flip leaves an orphan _v(prev+1), and
    * re-allocating that name would make the swap's rename collide
    * forever after. The orphan itself is GC'd (a version name outside
    * the keep window).
    *
    * `isLegacy` names the pre-versioning files THIS store itself wrote
    * under the root (cleaned up once legacy readers have had a full swap
    * to drain) — a foreign file someone parks under the store root is
    * not ours to delete, even though the directory is store-owned. */
  def swap(storeDir: String, writeVersion: Path => Unit,
      isLegacy: String => Boolean = _ => false): Unit = {
    val root = new Path(storeDir)
    StoreFs.mkdirs(root)
    val prev = currentVersion(root)
    val prevNum = prev.map(_.stripPrefix("_v").toLong).getOrElse(0L)
    // (name, number) pairs straight off the listing: keep-set membership
    // is by the LITERAL directory name, never a re-format of the parsed
    // number — a version dir written under a different digit-width must
    // still be protected by the grace window
    val onDisk = StoreFs.listNames(root)
      .filter(_.matches("_v\\d+")).map(n => n -> n.stripPrefix("_v").toLong)
    val nextNum = (prevNum +: onDisk.map(_._2)).max + 1
    val next = f"_v$nextNum%019d"
    // HOLDER-UNIQUE tmp name: after a TTL break the takeover winner lists
    // the same versions and derives the same `next`, so a shared
    // `_vN.tmp` would be one directory BOTH holders write into — and the
    // loser's abort below would delete the winner's in-flight files. A
    // unique suffix confines every holder (and the abort's cleanup) to
    // its own tmp; if both reach the rename, the no-overwrite rename
    // fails for the second instead of mixing files. Crash leftovers of
    // any suffix are GC'd by the `.tmp` substring match below.
    val tmp = new Path(root,
      next + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    writeVersion(tmp)
    // the abort point the lease fence feeds: writeVersion is the LONG part
    // of every rewrite, and a TTL takeover detected during it means the
    // new holder may already be writing its own versions — publishing ours
    // (rename + pointer flip + GC of "superseded" dirs that may be theirs)
    // would maximally deepen the split-brain. Abort BEFORE anything
    // becomes visible: drop the tmp, surface LeaseLostException. A
    // takeover landing between this check and the flip is the detection-
    // latency residual the lease scaladoc documents (lease OWNERSHIP is
    // CAS-protected now; fencing the data plane takes a transactional
    // commit). No-op for sections under the local OS lock (never lost)
    // or unlocked callers.
    if (lockLost(storeDir)) {
      StoreFs.deleteRecursively(tmp)
      throw new LeaseLostException(s"store lock on '$storeDir' was taken " +
        "over while the next version was being written; aborting the swap " +
        "before the pointer flip — nothing from this section was published")
    }
    StoreFs.rename(tmp, new Path(root, next))
    writePointer(root, next)
    // grace: keep the newest GraceVersions superseded versions THAT EXIST
    // (in-flight readers) — derived from the on-disk list, not arithmetic:
    // crash-recovery gaps or a numbering-scheme change would otherwise
    // shrink the window below the documented GraceVersions+1 swaps — and
    // drop older ones plus any stale *.tmp (under the lock the current
    // swap's tmp is already renamed, so every remaining tmp is a crash
    // leftover). Orphans (> prevNum) are never a reader's version: the
    // pointer never named them.
    val keep = Set(next) ++
      onDisk.filter(_._2 <= prevNum).sortBy(_._2).takeRight(GraceVersions)
        .map(_._1)
    StoreFs.listNames(root).foreach { name =>
      val p = new Path(root, name)
      val isVersion = name.matches("_v\\d+")
      if (isVersion && !keep(name)) StoreFs.deleteRecursively(p)
      else if (name.contains(".tmp")) StoreFs.deleteRecursively(p)
      else if (!isVersion && name != CurrentPtr && prev.isDefined &&
          isLegacy(name))
        StoreFs.deleteRecursively(p)
    }
  }

  def deleteRecursively(p: Path): Unit = StoreFs.deleteRecursively(p)
  def deleteRecursively(dir: String): Unit =
    StoreFs.deleteRecursively(new Path(dir))
}
