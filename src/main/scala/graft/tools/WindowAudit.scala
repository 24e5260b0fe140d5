package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-level audit: list every catalog query whose physical plan contains
  * an UNPARTITIONED window (empty partitionSpec ⇒ WindowExec moves the
  * whole input to one partition — a scale bug unless the frame is bounded
  * by construction). No query ACTION runs, but building a handful of
  * entries does execute real Spark jobs: operators with an eager
  * localCheckpoint in their construction path (ns53's banded simhash,
  * batchIds' rank frame) materialize that frame while the DataFrame is
  * being assembled, so the audit is cheap-but-not-free at large sfDir.
  * Run: sbt "runMain graft.tools.WindowAudit [sfDir]" */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local(threads = 4, shufflePartitions = 8)
    // AQE wraps plans in AdaptiveSparkPlanExec, whose inner plan is a
    // field, not a child — collect() would see no WindowExec at all
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      var hits = 0
      SparkEntry.all.foreach { e =>
        val plan = e.run(spark, dir).queryExecution.executedPlan
        // collectWithSubqueries: a window inside a scalar/IN subquery
        // would evade a plain collect over the main plan tree
        val bare = plan.collectWithSubqueries {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (bare.nonEmpty) {
          hits += bare.size
          println(s"[window-audit] ${e.name}: ${bare.size} unpartitioned window(s)")
          bare.foreach(w => println(s"  ${w.windowExpression.mkString("; ").take(160)}"))
        }
      }
      println(s"[window-audit] total unpartitioned windows: $hits")
    } finally spark.stop()
  }
}
