package graft

import org.scalatest.funsuite.AnyFunSuite

/** Forces every query module's `<clinit>` without a SparkSession, so a
  * forward-referenced val (object vals initialize in declaration order and
  * the oracle-SQL blocks evaluate eagerly) or a duplicate query name fails
  * here in milliseconds — as the FIRST reported failure — instead of
  * aborting the heavyweight suites minutes into the run. Round 7 lost its
  * entire correctness/bench record to exactly such an NPE. */
class CatalogInitSpec extends AnyFunSuite {

  test("SparkEntry catalog initializes and has the expected size") {
    assert(SparkEntry.all.size == 109,
      s"catalog size drifted: ${SparkEntry.all.size} (update this pin when adding queries)")
    assert(SparkEntry.oracleSql.size == 109,
      s"oracle count drifted: ${SparkEntry.oracleSql.size}")
  }

  test("every oracle SQL is non-empty and every name is well-formed") {
    SparkEntry.all.foreach { e =>
      assert(e.name.matches("[a-z0-9_]+"), s"odd query name: ${e.name}")
      e.oracle.foreach(sql => assert(sql.trim.nonEmpty, s"empty oracle for ${e.name}"))
    }
  }
}
