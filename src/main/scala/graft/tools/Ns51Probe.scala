package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Stage-by-stage wall-time decomposition of ns51 (sourceOverlap) at
  * ScaleSmoke scale, for performance work: each step re-runs the plan one
  * stage deeper, so (stageN − stageN−1) isolates that stage's cost.
  * Every stage is built from the operator's OWN package-private helpers
  * (overlapToks/overlapBits/overlapMasks/overlapFan) — the probe cannot
  * drift from the operator, because it has no replica to drift.
  *
  * {{{ sbt "runMain graft.tools.Ns51Probe 2000000" }}}
  */
object Ns51Probe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.ScaleSmoke.corpus(spark, n).localCheckpoint()
    println(s"[probe] corpus ready: ${docs.count()} rows")

    val toks = TextAnalysis.overlapToks(docs, "source", "text", n = 3)
    val srcNames = TextAnalysis.overlapSrcNames(docs, "source")
    val bits = TextAnalysis.overlapBits(toks, srcNames)
    val masks = TextAnalysis.overlapMasks(bits)
    val fan = TextAnalysis.overlapFan(masks)

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
    }
    // sorted-aggregate EXPERIMENT (not the operator's plan): one explicit
    // hash exchange + radix sort on the long key between the operator's
    // own bit projection and mask aggregation, then a streaming
    // SortAggregate (no 112M-entry hash table). replaceHashWithSortAgg
    // only rewrites aggs whose child ordering already covers the grouping,
    // i.e. exactly this shape.
    val masksSorted = TextAnalysis.overlapMasks(
      bits.repartition(col("__gk")).sortWithinPartitions(col("__gk")))

    time("toks_explode")(toks.count())
    time("masks_bitor_agg")(masks.count())
    time("masks_bitor_agg_2nd")(masks.count())
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "true")
    time("masks_sorted_agg")(masksSorted.count())
    time("masks_sorted_agg_2nd")(masksSorted.count())
    spark.conf.set("spark.sql.execution.replaceHashWithSortAgg.enabled", "false")
    time("fan_pairs_agg")(fan.count())
    time("full_sourceOverlap")(
      TextAnalysis.sourceOverlap(docs, "source", "text", n = 3).count())
    spark.stop()
  }
}
