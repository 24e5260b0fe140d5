package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

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
  * Version dirs are underscore-prefixed so Spark's hidden-path filter
  * EXCLUDES them from a listing of the root: a reader that resolved a
  * legacy (pre-versioning) root just before the first swap keeps seeing
  * only the legacy files, never legacy + _v1 double-counted (an
  * explicitly-given `_v...` root still reads fine — only discovered
  * children are filtered).
  */
private[graft] object VersionedStore {

  /** One lock per store directory (normalized), JVM-wide. Spark task
    * threads never take it, so holding it across a job is deadlock-free. */
  private val storeLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  def lockFor(storeDir: String): Object =
    storeLocks.computeIfAbsent(
      Paths.get(storeDir).toAbsolutePath.normalize.toString, _ => new Object)

  /** The store's writer critical section: the JVM monitor ([[lockFor]])
    * plus an OS-level advisory file lock on `<store>/_lock`, so two Spark
    * APPLICATIONS publishing/compacting one store directory serialize
    * instead of interleaving swaps (the JVM monitor alone only covers one
    * process — the round-11 gap). The monitor is taken FIRST, so within a
    * process only one thread ever touches the file lock (same-JVM overlap
    * would throw OverlappingFileLockException rather than block);
    * re-entrant per thread, because compactions call locked helpers from
    * already-locked batch sinks. `FileChannel.lock()` BLOCKS until the
    * other process releases — writer sections are read-modify-write
    * cycles that must serialize, not fail. Readers never take any lock
    * (versioned swaps + the grace window are what protect them). The
    * `_lock` file itself is neither a version dir nor legacy data, so
    * [[swap]]'s GC never touches it. */
  private val lockHolds = new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
    override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
  }
  def withStoreLock[T](storeDir: String)(body: => T): T = {
    val key = Paths.get(storeDir).toAbsolutePath.normalize.toString
    lockFor(storeDir).synchronized {
      val holds = lockHolds.get()
      if (holds.getOrElse(key, 0) > 0) {
        holds(key) += 1
        try body finally holds(key) -= 1
      } else {
        val root = Paths.get(storeDir)
        Files.createDirectories(root)
        val ch = java.nio.channels.FileChannel.open(root.resolve("_lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val l = ch.lock()
          holds(key) = 1
          try body finally { holds(key) = 0; l.release() }
        } finally ch.close()
      }
    }
  }

  /** How many superseded versions survive each swap. A reader must
    * straddle GraceVersions+1 swaps between resolving the pointer and
    * finishing its scan before its files can vanish; swaps are retention
    * cycles or admin ops (seconds-to-minutes apart) while serving scans
    * are sub-second, so 2 is already far beyond the observable window. */
  val GraceVersions = 2

  private val CurrentPtr = "_current"

  def currentVersion(root: Path): Option[String] = {
    val ptr = root.resolve(CurrentPtr)
    if (Files.exists(ptr))
      Some(new String(Files.readAllBytes(ptr),
        java.nio.charset.StandardCharsets.UTF_8).trim)
    else None
  }

  /** The directory holding the store's CURRENT version files; appends and
    * reads both resolve through here. Falls back to the root itself for a
    * legacy (never-swapped) store. */
  def versionDir(storeDir: String): String = {
    val root = Paths.get(storeDir)
    currentVersion(root).map(v => root.resolve(v).toString).getOrElse(storeDir)
  }

  private def writePointer(root: Path, version: String): Unit = {
    val tmp = root.resolve(CurrentPtr + ".tmp")
    Files.write(tmp, version.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve(CurrentPtr),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Land the next version: `writeVersion` populates a `.tmp` directory
    * beside the live data, which is then moved into place, the pointer
    * atomically flipped, and everything older than the versions readers
    * may still be streaming garbage-collected. Caller holds [[lockFor]].
    *
    * Version numbers are derived from the predecessor (not wall/monotonic
    * clocks — System.nanoTime may be negative and would produce a name
    * the GC regex treats as garbage), and allocate PAST any version dir
    * already on disk, not just past the pointer: a crash between the
    * version move and the pointer flip leaves an orphan _v(prev+1), and
    * re-allocating that name would make the swap's Files.move collide
    * forever after. The orphan itself is GC'd (a version name outside
    * the keep window).
    *
    * `isLegacy` names the pre-versioning files THIS store itself wrote
    * under the root (cleaned up once legacy readers have had a full swap
    * to drain) — a foreign file someone parks under the store root is
    * not ours to delete, even though the directory is store-owned. */
  def swap(storeDir: String, writeVersion: Path => Unit,
      isLegacy: String => Boolean = _ => false): Unit = {
    val root = Paths.get(storeDir)
    Files.createDirectories(root)
    val prev = currentVersion(root)
    val prevNum = prev.map(_.stripPrefix("_v").toLong).getOrElse(0L)
    // (name, number) pairs straight off the listing: keep-set membership
    // is by the LITERAL directory name, never a re-format of the parsed
    // number — a version dir written under a different digit-width must
    // still be protected by the grace window
    val onDisk = {
      val s = Files.list(root)
      try s.toArray.map(_.asInstanceOf[Path].getFileName.toString)
        .filter(_.matches("_v\\d+")).map(n => n -> n.stripPrefix("_v").toLong).toSeq
      finally s.close()
    }
    val nextNum = (prevNum +: onDisk.map(_._2)).max + 1
    val next = f"_v$nextNum%019d"
    val tmp = root.resolve(next + ".tmp")
    writeVersion(tmp)
    Files.move(tmp, root.resolve(next))
    writePointer(root, next)
    // grace: keep the newest GraceVersions superseded versions THAT EXIST
    // (in-flight readers) — derived from the on-disk list, not arithmetic:
    // crash-recovery gaps or a numbering-scheme change would otherwise
    // shrink the window below the documented GraceVersions+1 swaps — and
    // drop older ones plus any stale *.tmp (under the lock the current
    // swap's tmp is already moved, so every remaining tmp is a crash
    // leftover). Orphans (> prevNum) are never a reader's version: the
    // pointer never named them.
    val keep = Set(next) ++
      onDisk.filter(_._2 <= prevNum).sortBy(_._2).takeRight(GraceVersions)
        .map(_._1)
    val s = Files.list(root)
    try s.forEach { p =>
      val name = p.getFileName.toString
      val isVersion = name.matches("_v\\d+")
      if (isVersion && !keep(name)) deleteRecursively(p)
      else if (name.endsWith(".tmp")) deleteRecursively(p)
      else if (!isVersion && name != CurrentPtr && prev.isDefined &&
          isLegacy(name))
        deleteRecursively(p)
    } finally s.close()
  }

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }
}
