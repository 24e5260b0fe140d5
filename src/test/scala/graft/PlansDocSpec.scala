package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** PLANS.md is the first artifact a new contributor reads; this pins the
  * full-coverage invariant — every catalog query appears, either as a
  * formatted headline section or a derived plan note — so the document
  * cannot silently rot as the catalog grows. Regenerate with
  * `sbt "runMain graft.Plans"`. */
class PlansDocSpec extends AnyFunSuite {

  test("PLANS.md covers every catalog query") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run `sbt \"runMain graft.Plans\"`")
    val text = new String(Files.readAllBytes(path), "UTF-8")
    val missing = SparkEntry.all.map(_.name).filterNot(text.contains)
    assert(missing.isEmpty,
      s"PLANS.md is stale — regenerate with `sbt \"runMain graft.Plans\"`; " +
        s"missing: ${missing.mkString(", ")}")
  }
}
