package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Stage-by-stage wall-time decomposition of ns51 (sourceOverlap) at
  * ScaleSmoke scale, for performance work: each step re-runs the plan one
  * stage deeper, so (stageN − stageN−1) isolates that stage's cost.
  * Replicates the operator's internal steps (kept in sync by eye — this
  * is a throwaway diagnostic, the operator itself is the contract).
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

    val toks = docs
      .select(col("source").as("__src"), TextAnalysis.words(col("text")).as("__ws"))
      .select(col("__src"),
        explode(org.apache.spark.sql.graft.Md5GramKeys(col("__ws"), 3,
          distinct = true)).as("__gk"))
    val srcNames = docs.select(col("source").cast("string")).distinct()
      .collect().map(_.getString(0)).filter(_ != null).sorted
    val srcBit = typedLit(srcNames.zipWithIndex.toMap)
    val masks = toks
      .select(col("__gk"), element_at(srcBit, col("__src")).as("__bi"))
      .select(col("__gk"), expr("shiftleft(1L, __bi)").as("__m"))
      .groupBy(col("__gk")).agg(bit_or(col("__m")).as("__mask"))
    val fan = masks
      .withColumn("__bits", expr(
        s"""filter(transform(sequence(0, ${srcNames.length - 1}),
           |  b -> IF(((__mask >> b) & 1) = 1, b, -1)), x -> x >= 0)""".stripMargin))
      .select(explode(expr(
        """concat(
          |  transform(__bits, x -> named_struct('a', x, 'b', -1)),
          |  flatten(transform(__bits, (x, i) ->
          |    transform(slice(__bits, i + 2, size(__bits) - i - 1), y ->
          |      named_struct('a', x, 'b', y)))))""".stripMargin)).as("__p"))
      .groupBy(col("__p.a").as("__ba"), col("__p.b").as("__bb"))
      .agg(count(lit(1)).as("__cnt"))

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      println(f"[probe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
    }
    // sorted-aggregate variant: one explicit hash exchange + radix sort on
    // the long key, then a streaming SortAggregate (no 112M-entry hash
    // table). replaceHashWithSortAgg only rewrites aggs whose child
    // ordering already covers the grouping, i.e. exactly this shape.
    val masksSorted = toks
      .select(col("__gk"), element_at(srcBit, col("__src")).as("__bi"))
      .select(col("__gk"), expr("shiftleft(1L, __bi)").as("__m"))
      .repartition(col("__gk"))
      .sortWithinPartitions(col("__gk"))
      .groupBy(col("__gk")).agg(bit_or(col("__m")).as("__mask"))

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
