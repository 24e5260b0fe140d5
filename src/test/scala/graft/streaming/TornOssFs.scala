package graft.streaming

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** Injection points for [[TornOssFileSystem]]'s simulated copy+delete
  * rename — the knobs `NonAtomicRenameSpec` turns to make the torn
  * window and the crash-duplication observable deterministically
  * instead of hoping a hammering reader lands inside a microsecond gap.
  *
  * All hooks are process-global (Hadoop constructs FileSystem instances
  * reflectively, so per-instance injection can't reach them) and must be
  * reset in the spec's `finally`. Defaults are inert: with no hook set,
  * `torn://` behaves like a slightly slower local FS whose renames are
  * still copy+delete (non-atomic, just with a narrow natural window).
  */
object TornRenameHooks {
  /** Called after the destination exists but holds only the FIRST HALF
    * of the bytes — the middle of the emulated copy, where a concurrent
    * reader sees a present-but-partial destination. */
  @volatile var midCopy: () => Unit = () => ()
  /** When true, the "rename" stops after the copy lands and before the
    * source delete — the crash shape that leaves BOTH the staging file
    * and the destination (object-store copy+delete has no transaction
    * tying the two halves together). The rename still reports success,
    * as a crashed process would simply never observe the result. */
  @volatile var crashBeforeDeleteSrc: Boolean = false
  /** For DIRECTORY renames: throw after copying this many child files
    * (−1 = never) — the mid-copy process death that leaves a partial
    * destination directory AND the intact source. */
  @volatile var dirCrashAfterFiles: Int = -1

  def reset(): Unit = {
    midCopy = () => ()
    crashBeforeDeleteSrc = false
    dirCrashAfterFiles = -1
  }
}

/** A mock object-store scheme whose rename is REALLY copy+delete — the
  * semantics Hadoop's S3A/GCS connectors emulate — not the atomic POSIX
  * rename [[MockOssFileSystem]] inherits. `torn://bucket:9001/...`
  * delegates storage to the machine-local filesystem (the path under
  * the authority is the real local path), but `rename`:
  *
  *   - file → file: create dst, write half, [[TornRenameHooks.midCopy]],
  *     write the rest, then delete src (skipped when
  *     [[TornRenameHooks.crashBeforeDeleteSrc]]). Combined with
  *     `FileSystem.rename(src, dst, OVERWRITE)`'s delete-dst-first
  *     default, an overwrite-publish on this scheme passes through BOTH
  *     non-atomic states a raw object store exposes: dst absent, then
  *     dst partial.
  *   - dir → dir: copy child files one at a time (throwing after
  *     [[TornRenameHooks.dirCrashAfterFiles]] if set), then delete src —
  *     a version-directory commit that can die with a partial dst and
  *     the intact src on disk.
  *
  * Registered on the test classpath via `core-site.xml`; never on the
  * main classpath. `NonAtomicRenameSpec` puts `torn` behind the store
  * gate with `-Dgraft.store.extraNonAtomicSchemes=torn` and then drives
  * [[StoreFs.publishString]], [[CycleManifest]], and
  * [[VersionedStore.swap]] over it to prove what the gate exists to
  * prevent — and that every reader degrades instead of corrupting when
  * the gate is deliberately overridden. */
class TornOssFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("torn://bucket:9001")
  override def getDefaultPort: Int = 9001

  private def localOf(p: Path): java.io.File =
    new java.io.File(p.toUri.getPath)

  override def rename(src: Path, dst: Path): Boolean = {
    val s = localOf(src)
    val d = localOf(dst)
    if (!s.exists()) return false
    Option(d.getParentFile).foreach(_.mkdirs())
    if (s.isDirectory) renameDir(s, d) else renameFile(s, d)
    true
  }

  private def renameFile(s: java.io.File, d: java.io.File): Unit = {
    val bytes = java.nio.file.Files.readAllBytes(s.toPath)
    val out = new java.io.FileOutputStream(d)
    try {
      val half = bytes.length / 2
      out.write(bytes, 0, half)
      out.flush()
      TornRenameHooks.midCopy() // dst exists, holds half the bytes
      out.write(bytes, half, bytes.length - half)
    } finally out.close()
    if (!TornRenameHooks.crashBeforeDeleteSrc)
      java.nio.file.Files.delete(s.toPath)
  }

  private def renameDir(s: java.io.File, d: java.io.File): Unit = {
    d.mkdirs()
    var copied = 0
    // children in a stable order so dirCrashAfterFiles is deterministic
    s.listFiles().sortBy(_.getName).foreach { child =>
      if (TornRenameHooks.dirCrashAfterFiles >= 0 &&
          copied >= TornRenameHooks.dirCrashAfterFiles)
        throw new java.io.IOException(
          s"simulated mid-copy crash after $copied files")
      val dc = new java.io.File(d, child.getName)
      if (child.isDirectory) renameDir(child, dc)
      else java.nio.file.Files.copy(child.toPath, dc.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      copied += 1
    }
    if (!TornRenameHooks.crashBeforeDeleteSrc) {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete(); ()
      }
      del(s)
    }
  }
}

/** The `AbstractFileSystem` (FileContext) registration of
  * [[TornOssFileSystem]] — the resolver [[StoreFs]] actually uses. */
class TornOssFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new TornOssFileSystem, conf, "torn", true)
