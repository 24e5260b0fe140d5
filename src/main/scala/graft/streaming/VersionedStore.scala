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
    * is a create-exclusive LEASE file `<store>/_lock.lease` with a
    * heartbeat and a TTL takeover ([[acquireLease]]) — the HDFS-native
    * mutex idiom; its one honest residual (two writers both breaking the
    * same expired lease) is why a production deployment moves the commit
    * into a table format's transaction log. Readers never take any lock
    * (versioned swaps + the grace window are what protect them). The
    * `_lock`/`_lock.lease` files are neither version dirs nor legacy
    * data, so [[swap]]'s GC never touches them. */
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

  /** Create-exclusive lease acquisition for filesystems without advisory
    * locks: loop on an atomic `create(CREATE)` of the lease file (atomic
    * on HDFS; FileAlreadyExistsException = held), breaking leases whose
    * mtime is older than `ttlMs`. A daemon heartbeat refreshes the held
    * lease's mtime every `ttlMs/3` so long writer sections never expire
    * mid-write. Residual: between one contender's stale-check and its
    * delete, a second contender can break the same lease (and a holder's
    * fenced refresh below can read-then-write across a break — the
    * post-write re-read narrows that to a single write-write race but
    * cannot close it) — known limitations of lease files on stores
    * without compare-and-swap, and the reason the 100 TB deployment form
    * is a Delta/Iceberg commit, not this file. A further residual: the
    * staleness check compares THIS process's clock against the remote
    * filesystem's mtime stamp (the NameNode's clock on HDFS), so client/
    * server skew beyond the heartbeat slack (ttl − ttl/3 ≈ 3.3 min at the
    * default) can break a live lease (skew ahead) or never break a dead
    * one (skew behind) — size the TTL with the deployment's clock
    * discipline in mind; only a server-side CAS with server-side expiry
    * removes the skew term entirely. A detected takeover is surfaced
    * three ways: the stderr WARN, [[LockHandle.lost]] for polling, and
    * [[withStoreLock]]'s terminal [[LeaseLostException]]. */
  private[streaming] def acquireLease(lease: Path,
      ttlMs: Long = LeaseTtlMs, pollMs: Long = 100L): LockHandle = {
    // unique per ACQUISITION, not per process: the fenced refresh compares
    // this against the lease's current content to detect a TTL takeover,
    // and two holds from one process must never alias
    val token = s"${ProcessHandle.current().pid()}@${java.net.InetAddress.getLocalHost.getHostName}#${java.util.UUID.randomUUID()}"
    var release: LockHandle = null
    while (release == null) {
      try {
        StoreFs.writeString(lease, token, createNew = true)
        val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
        val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
        // LOUD on purpose: standing down bounds the split-brain but does
        // not undo it — the holder's in-flight writer section overlapped
        // the new holder's. The operator needs the evidence to audit/
        // repair the affected epoch; [[withStoreLock]] additionally
        // surfaces it programmatically (LeaseLostException + lockLost).
        def standDown(foreign: String): Unit = {
          lost.set(true)
          System.err.println(s"[store] WARN lease $lease LOST to '$foreign' " +
            s"(this holder '$token' was TTL-broken mid-section; " +
            "writes from this section may interleave with the new holder's)")
        }
        val hb = new Thread(() => {
          while (!stop.get() && !lost.get()) {
            try Thread.sleep(math.max(1L, ttlMs / 3))
            catch { case _: InterruptedException => () }
            // FENCED overwrite-in-place (never delete+create: the file must
            // stay present so contenders read "held", not "released"):
            // re-read before rewriting, and stand down if the lease now
            // carries someone else's token — after a TTL takeover a blind
            // rewrite would hijack the NEW holder's live lease, widening
            // the split-brain the break already opened. An unreadable,
            // vanished, or half-written lease SKIPS the beat instead of
            // recreating it: if it really was taken over, the next beat
            // reads the new holder's token and stands down then.
            if (!stop.get() && !lost.get())
              try {
                val cur = StoreFs.readString(lease)
                if (cur == token) {
                  StoreFs.writeString(lease, token)
                  // the read-then-write above is NOT compare-and-swap: a
                  // contender can TTL-break and land its token between the
                  // read and the write, and the write then hijacks the new
                  // holder's live lease. Re-read AFTER the write: if the
                  // content is now foreign, the contender's write landed
                  // last and it holds — stand down. The mirror ordering
                  // (our write landed last) reads back our own token and
                  // is undetectable by content, so this narrows the hijack
                  // window from a full beat to one write-write race rather
                  // than closing it; the true fix is CAS, i.e. the
                  // Delta/Iceberg commit-log deployment form.
                  val after = StoreFs.readString(lease)
                  if (after != token && after.nonEmpty) standDown(after)
                }
                else if (cur.nonEmpty) standDown(cur)
              } catch { case _: java.io.IOException => () }
          }
        }, s"graft-lease-heartbeat-$lease")
        hb.setDaemon(true)
        hb.start()
        release = new LockHandle(() => {
          stop.set(true); hb.interrupt()
          // join BEFORE deleting: an in-flight heartbeat write already past
          // its stop-check would otherwise land AFTER the delete and
          // resurrect an orphan lease that stalls the next writer for a
          // full TTL
          try hb.join(ttlMs) catch { case _: InterruptedException => () }
          // after a detected takeover the file is the NEW holder's lease —
          // deleting it would release a lock this process no longer owns
          if (!lost.get()) StoreFs.deleteRecursively(lease)
          else System.err.println(s"[store] WARN release of $lease skipped — " +
            "the lease was taken over mid-hold (see the LOST warning above); " +
            "audit the store for interleaved writes from the overlap window")
        }, () => lost.get())
      } catch {
        case _: java.io.IOException => // held (or just broken by a racer)
          try {
            if (System.currentTimeMillis() - StoreFs.modificationTime(lease) > ttlMs)
              StoreFs.deleteRecursively(lease) // expired: break and re-race
            else Thread.sleep(pollMs)
          } catch { case _: java.io.IOException => () } // released mid-check
      }
    }
    release
  }

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

  private def writePointer(root: Path, version: String): Unit = {
    val tmp = new Path(root, CurrentPtr + ".tmp")
    StoreFs.writeString(tmp, version)
    // atomic on HDFS and POSIX; see StoreFs for the object-store caveat
    StoreFs.rename(tmp, new Path(root, CurrentPtr), overwrite = true)
  }

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
    // takeover landing between this check and the flip is the residual
    // race the lease scaladoc documents (CAS is the real fix). No-op for
    // sections under the local OS lock (never lost) or unlocked callers.
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
