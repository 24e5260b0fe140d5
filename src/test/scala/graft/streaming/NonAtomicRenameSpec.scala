package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The atomic-rename deployment contract, proven from both sides.
  *
  * Every pointer-class publish in the store plane (the `_current` flip,
  * the cycle manifest, the screen-verdict marker — all routed through
  * [[StoreFs.publishString]]) and every version-directory commit
  * ([[VersionedStore.swap]]'s no-overwrite rename) assumes the backing
  * filesystem renames atomically. That holds on HDFS and POSIX; on raw
  * object stores Hadoop EMULATES rename as copy+delete, and the
  * protocols are unsound there — which is why
  * [[StoreFs.requireAtomicRename]] refuses those schemes at store open.
  *
  * This suite replaces that argument with execution: `torn://`
  * ([[TornOssFs]]) is a mock object store whose rename really is
  * copy+delete with injectable windows, and the tests drive the real
  * publish primitives over it to show (1) the torn window EXISTS — a
  * hammering reader observes the pointer absent and partial mid-publish,
  * while the identical workload on a contract-satisfying FS observes
  * neither; (2) when the gate is deliberately overridden, every READER
  * degrades (absent / stale / uncached) rather than corrupting or
  * throwing, and generations never regress; (3) the crash shapes
  * copy+delete adds (duplicated staging, partial version directory) are
  * swept by the protocols' existing startup/GC passes. The gate plus
  * these degrade paths are the complete story; the supported
  * object-store deployment remains a table format whose commit is a
  * transaction-log entry (see StoreFs's scaladoc and README §deploy).
  */
class NonAtomicRenameSpec extends AnyFunSuite {

  private def withTornStore(test: String => Unit): Unit = {
    val local = Files.createTempDirectory("graft-torn")
    val dir = s"torn://bucket:9001$local/store"
    System.setProperty("graft.store.allowNonAtomicRename", "true")
    try test(dir)
    finally {
      System.clearProperty("graft.store.allowNonAtomicRename")
      TornRenameHooks.reset()
    }
  }

  test("extra-scheme gate: graft.store.extraNonAtomicSchemes puts torn:// behind the refusal") {
    // torn is not on the built-in blocklist (it is a test scheme), so
    // without the extension the gate would wave it through — the knob
    // exists precisely so a deployment can fence a connector the
    // built-in list does not know about
    StoreFs.requireAtomicRename("torn://bucket:9001/tmp/x")
    System.setProperty("graft.store.extraNonAtomicSchemes", " Torn , other ")
    try {
      val e = intercept[IllegalArgumentException](
        StoreFs.requireAtomicRename("torn://bucket:9001/tmp/x"))
      assert(e.getMessage.contains("non-atomic"), e.getMessage)
      // the deliberate override still opens the gate
      System.setProperty("graft.store.allowNonAtomicRename", "true")
      try StoreFs.requireAtomicRename("torn://bucket:9001/tmp/x")
      finally System.clearProperty("graft.store.allowNonAtomicRename")
      // and local schemes pass untouched with the extension set
      StoreFs.requireAtomicRename("/tmp/local-store")
    } finally System.clearProperty("graft.store.extraNonAtomicSchemes")
  }

  /** Hammer `read` from a background thread while `body` runs; returns
    * the number of reads outside `expected`. */
  private def hammer[T](read: () => T, expected: T => Boolean)
      (body: => Unit): Int = {
    val anomalies = new java.util.concurrent.atomic.AtomicInteger
    @volatile var stop = false
    val t = new Thread(() => while (!stop) {
      val ok =
        try expected(read())
        catch { case _: java.io.IOException => false } // raced the delete
      if (!ok) anomalies.incrementAndGet()
    })
    t.setDaemon(true)
    t.start()
    try body finally { stop = true; t.join(10000) }
    anomalies.get
  }

  test("the torn window is real: a hammering reader sees the pointer absent or partial mid-publish") {
    withTornStore { dir =>
      val root = new Path(dir)
      StoreFs.mkdirs(root)
      val ptr = new Path(root, "_current")
      val vA = "_v0000000000000000001"
      val vB = "_v0000000000000000002"
      StoreFs.publishString(ptr, vA, "_current.tmp")
      // widen the copy's half-written state so the reader reliably lands
      // in it; the absent state (OVERWRITE's delete-dst-first) needs no
      // widening — the reader catches it between iterations
      TornRenameHooks.midCopy = () => Thread.sleep(10)
      val torn = hammer(
        () => VersionedStore.currentVersion(root),
        (o: Option[String]) => o.contains(vA) || o.contains(vB)) {
        (1 to 20).foreach { i =>
          StoreFs.publishString(ptr, if (i % 2 == 0) vA else vB, "_current.tmp")
        }
      }
      assert(torn > 0,
        "copy+delete rename must expose an absent-or-partial pointer " +
          "to a concurrent reader — if this ever reads 0, the mock has " +
          "stopped simulating the hazard the scheme gate exists for")

      // the IDENTICAL workload on a filesystem that honors the rename
      // contract (the local FS) shows zero anomalies — the publish
      // primitive is atomic where the contract holds; the scheme is
      // what breaks it
      val goodLocal = Files.createTempDirectory("graft-atomic")
      val groot = new Path(goodLocal.toString)
      val gptr = new Path(groot, "_current")
      StoreFs.publishString(gptr, vA, "_current.tmp")
      val clean = hammer(
        () => VersionedStore.currentVersion(groot),
        (o: Option[String]) => o.contains(vA) || o.contains(vB)) {
        (1 to 200).foreach { i =>
          StoreFs.publishString(gptr, if (i % 2 == 0) vA else vB, "_current.tmp")
        }
      }
      assert(clean == 0,
        s"atomic-rename FS must never expose a torn pointer, saw $clean")
    }
  }

  test("manifest on torn renames: replica degrades to uncached, never throws, gens never regress") {
    withTornStore { dir =>
      StoreFs.mkdirs(new Path(dir))
      val writer = new CycleManifest.Writer(dir)
      writer.persist(0, Map("feed" -> 0L))
      val reader = new CycleManifest.Reader(dir, statIntervalMs = 0)
      TornRenameHooks.midCopy = () => Thread.sleep(5)
      val observed =
        new java.util.concurrent.ConcurrentLinkedQueue[Option[Long]]()
      @volatile var failure: Throwable = null
      @volatile var stop = false
      val t = new Thread(() => while (!stop) {
        try observed.add(reader.snapshot().map(_._1))
        catch { case e: Throwable => failure = e; stop = true }
      })
      t.setDaemon(true)
      t.start()
      try (1 to 15).foreach(g => writer.persist(g.toLong, Map("feed" -> g.toLong)))
      finally { stop = true; t.join(10000) }
      assert(failure == null,
        s"replica request threw under torn manifest renames: $failure")
      import scala.jdk.CollectionConverters._
      val seq = observed.asScala.toVector
      val gens = seq.flatten
      assert(gens.nonEmpty)
      // monotone: the reader's gen fence + the writer's monotone counters
      // mean no replica ever adopts an older generation
      gens.sliding(2).foreach {
        case Vector(a, b) => assert(b >= a, s"gen regressed $a -> $b")
        case _ =>
      }
      // the degrade is visible: some requests inside the windows found
      // the manifest absent or partial and served uncached (None)
      val degrades = seq.indexWhere(_.isEmpty, seq.indexWhere(_.isDefined))
      assert(degrades >= 0,
        "expected at least one uncached degrade inside a torn window")
    }
  }

  test("duplicated staging: crash-before-delete leaves both files; the successor sweeps and stays monotone") {
    withTornStore { dir =>
      StoreFs.mkdirs(new Path(dir))
      val writer = new CycleManifest.Writer(dir)
      writer.persist(0, Map("feed" -> 1L))
      val before = CycleManifest.read(dir).map(_._1).get
      // the copy half lands, the delete half never runs — rename
      // "succeeded" from the store's point of view, but the staging file
      // is still there (there is no transaction tying the halves)
      TornRenameHooks.crashBeforeDeleteSrc = true
      writer.persist(1, Map("feed" -> 2L))
      TornRenameHooks.crashBeforeDeleteSrc = false
      val names = StoreFs.listNames(new Path(dir))
      assert(names.exists(_.startsWith("_graft_cycles.staging.")),
        s"crash shape must leave the staging duplicate, saw $names")
      // the destination still carries the COMPLETE newer manifest
      val (g1, c1) = CycleManifest.read(dir).get
      assert(g1 == before + 1 && c1("feed") == 2L)
      // a successor incarnation's constructor sweep removes the
      // duplicate and resumes generations above the whole history
      val writer2 = new CycleManifest.Writer(dir)
      assert(!StoreFs.listNames(new Path(dir)).exists(_.contains(".staging.")),
        "successor must sweep crash-duplicated staging files")
      writer2.persist(0, Map("feed" -> 3L))
      val (g2, c2) = CycleManifest.read(dir).get
      assert(g2 > g1 && c2("feed") == 3L)
    }
  }

  test("version-dir commit crash mid-copy: pointer never names the partial dir; the next swap GCs it") {
    withTornStore { dir =>
      val root = new Path(dir)
      def writeFiles(n: Int, tag: String)(tmp: Path): Unit =
        (1 to n).foreach(i =>
          StoreFs.writeString(new Path(tmp, s"part-$i.txt"), s"$tag-$i"))
      // seed one good version end-to-end over torn (single-writer, no
      // concurrent reader: the commit completes, windows unobserved)
      VersionedStore.swap(dir, writeFiles(2, "good"))
      val v1 = VersionedStore.currentVersion(root).get
      // mid-copy process death: one child file copied, then the "crash"
      TornRenameHooks.dirCrashAfterFiles = 1
      intercept[java.io.IOException] {
        VersionedStore.swap(dir, writeFiles(3, "doomed"))
      }
      TornRenameHooks.reset()
      // the pointer still names the good version — a reader resolving
      // through it never sees the partial directory
      assert(VersionedStore.currentVersion(root).contains(v1))
      assert(VersionedStore.versionDir(dir) == s"$dir/$v1")
      val leftovers = StoreFs.listNames(root)
      assert(leftovers.exists(n => n.matches("_v\\d+") && n != v1),
        s"crash must leave the partial orphan version, saw $leftovers")
      assert(leftovers.exists(_.contains(".tmp")),
        s"crash must leave the intact staging dir, saw $leftovers")
      // the next successful swap allocates PAST the orphan and GCs both
      // it and the staging leftover
      VersionedStore.swap(dir, writeFiles(2, "next"))
      val v3 = VersionedStore.currentVersion(root).get
      assert(v3 != v1)
      val after = StoreFs.listNames(root)
      assert(!after.exists(_.contains(".tmp")),
        s"staging leftover must be GC'd, saw $after")
      val orphan = leftovers.find(n => n.matches("_v\\d+") && n != v1).get
      assert(!after.contains(orphan), s"orphan $orphan must be GC'd")
      assert(v3.stripPrefix("_v").toLong > orphan.stripPrefix("_v").toLong,
        "allocation must never reuse a crashed version's name")
    }
  }
}
