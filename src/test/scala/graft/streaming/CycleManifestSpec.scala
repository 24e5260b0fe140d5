package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Failure-mode contract of the persisted cycle manifest: a corrupt or
  * regressed `_graft_cycles` file must DEGRADE (replica serves uncached,
  * successor writer resumes above the unreadable history) — never throw
  * into Writer construction or a replica's request path, and never let a
  * deposed drain's late write regress a replica's version tokens.
  */
class CycleManifestSpec extends AnyFunSuite {

  private def tmpStore(): String =
    Files.createTempDirectory("graft-manifest").toString

  private def writeRaw(dir: String, body: String): Unit = {
    Thread.sleep(5) // distinct mtime for the reader's (mtime, len) stat
    StoreFs.writeString(CycleManifest.manifestPath(dir), body)
  }

  private def manifestJson(gen: Long, counts: (String, Long)*): String =
    s"""{"gen":$gen,"counts":{${
      counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""

  test("corrupt manifest degrades: read None, replica uncached, writer resumes above history") {
    val dir = tmpStore()

    // a healthy history first: gen 4, one feed counter
    writeRaw(dir, manifestJson(4L, "f1" -> 2L))
    assert(CycleManifest.read(dir) == Some((4L, Map("f1" -> 2L))))

    // corruption lands (torn write, bitrot): read() and the replica
    // reader both degrade to "absent", nothing throws
    writeRaw(dir, """{"gen":4,"counts":{"f1""")
    assert(CycleManifest.read(dir).isEmpty,
      "a corrupt manifest must read as absent, not throw")
    val reader = new CycleManifest.Reader(dir)
    assert(reader.snapshot().isEmpty, "replica must serve uncached")
    assert(reader.snapshot().isEmpty, "…and stay calm on every request")
    assert(reader.keyCycle("f1").isEmpty)

    // Writer construction over the corruption must not fail the drain,
    // and its generations must land ABOVE anything the unreadable
    // history could have issued (gen 4 + any bounded count)
    val w = new CycleManifest.Writer(dir)
    w.persist(0L, Map("f1" -> 1L))
    val recovered = CycleManifest.read(dir)
    assert(recovered.isDefined, "the successor's persist must heal the file")
    assert(recovered.get._1 > 4L,
      s"successor gens must stay monotone past the corrupt history, got gen ${recovered.get._1}")
    // and the replica recovers on the same reader instance
    assert(reader.keyCycle("f1").contains(s"${recovered.get._1}:1"))
  }

  test("reader fences a regressed generation (late write from a deposed drain)") {
    val dir = tmpStore()
    val reader = new CycleManifest.Reader(dir)

    writeRaw(dir, manifestJson(7L, "f1" -> 3L))
    assert(reader.snapshot() == Some((7L, Map("f1" -> 3L))))

    // a deposed writer's stale rename lands AFTER the successor's: the
    // replica must keep the newer generation — adopting gen 5 would let
    // an old cached head token re-validate as current
    writeRaw(dir, manifestJson(5L, "f1" -> 9L))
    assert(reader.snapshot() == Some((7L, Map("f1" -> 3L))),
      "a regressed gen must not replace the newer cached one")
    assert(reader.keyCycle("f1").contains("7:3"))

    // the live writer's next persist moves forward again and wins
    writeRaw(dir, manifestJson(8L, "f1" -> 4L))
    assert(reader.snapshot() == Some((8L, Map("f1" -> 4L))))
  }

  test("a throttled reader bounds staleness to the stat interval") {
    val dir = tmpStore()
    val reader = new CycleManifest.Reader(dir, statIntervalMs = 50L)
    writeRaw(dir, manifestJson(1L, "f1" -> 1L))
    assert(reader.snapshot() == Some((1L, Map("f1" -> 1L))))
    // within the interval the cached answer is served without a stat —
    // a change lands but is not yet visible (the documented bound)
    writeRaw(dir, manifestJson(2L, "f1" -> 2L))
    assert(reader.snapshot() == Some((1L, Map("f1" -> 1L))),
      "inside the stat interval the reader serves the cached snapshot")
    Thread.sleep(60L)
    assert(reader.snapshot() == Some((2L, Map("f1" -> 2L))),
      "past the interval the change is visible")
  }
}
