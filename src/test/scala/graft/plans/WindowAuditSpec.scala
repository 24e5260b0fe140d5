package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.window.WindowExec

/** Catalog-wide scale pin: an UNPARTITIONED window moves its whole input
  * to one partition, which is a 100 TB-killer unless the frame is bounded
  * by construction. The only such frames in the engine are the serving
  * page ordinals ([[graft.operators.Paging.withOrdinal]] — input capped at
  * k rows by topK's orderBy+limit). Planning only, nothing executes; AQE
  * is disabled for the walk because AdaptiveSparkPlanExec hides its inner
  * plan from collect(). */
class WindowAuditSpec extends SparkSpec {

  private val BoundedPageQueries =
    Set("dq18_topk_page", "dq20_pinned_union", "ns15_feed_pipeline")

  test("no catalog query has an unpartitioned window outside the bounded page sites") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.all.flatMap { e =>
        // collectWithSubqueries: plain collect skips plans hanging off
        // ScalarSubquery/InSubquery expressions — an unpartitioned window
        // inside a subquery must not evade the pin
        val bare = e.run(spark, sf0001).queryExecution.executedPlan
          .collectWithSubqueries { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (bare.nonEmpty) Some(e.name -> bare.size) else None
      }
      val unexpected = offenders.filterNot { case (n, _) => BoundedPageQueries(n) }
      assert(unexpected.isEmpty,
        s"unpartitioned windows outside the bounded page set: $unexpected — " +
          "either partition the window or, if the frame is bounded by " +
          "construction, document it and add the query here")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
