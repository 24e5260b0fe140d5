package graft

import org.apache.spark.sql.functions._

class OptimizerRuleSpec extends SparkSpec {

  // parquet-backed (LocalRelation inputs get constant-folded away before
  // the optimized plan can be inspected)
  private lazy val docs = Tables(spark, sf0001).documents

  test("regexp_count > 0 predicates optimize to RLIKE, results unchanged") {
    val pred = docs.filter(regexp_count(col("text"), lit("(spark|vector)")) > 0)
    val optimized = pred.queryExecution.optimizedPlan.toString
    assert(optimized.contains("RLIKE"), optimized)
    assert(!optimized.toLowerCase.contains("regexp_count"), optimized)
    assert(!optimized.contains("regexp_extract_all"), optimized)

    // identical result set to the unoptimizable count-and-compare form
    val viaCount = docs
      .withColumn("n", regexp_count(col("text"), lit("(spark|vector)")))
      .filter(col("n") > 0).select("doc_id")
    val got = pred.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == viaCount.collect().map(_.getLong(0)).toSet)
    assert(got.nonEmpty)

    // negated form rewrites too
    val none = docs.filter(regexp_count(col("text"), lit("zebra")) === 0)
    assert(none.queryExecution.optimizedPlan.toString.contains("RLIKE"))
    assert(none.count() == docs.count())

    // a query that USES the count keeps regexp_count
    val counted = docs.select(regexp_count(col("text"), lit("spark")).as("n"))
    val cPlan = counted.queryExecution.optimizedPlan.toString
    assert(cPlan.contains("regexp_count") || cPlan.contains("regexp_extract_all"), cPlan)
  }

  test("the cascade's include-regex benefits from the rewrite") {
    val posts = graft.queries.PipelineQueries.postViews(spark, sf0001)
    val out = graft.operators.FilterCascade(posts, graft.domain.Fixtures.cond(), None)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("RLIKE"), plan)
  }

  test("filter conjuncts reorder cheapest-first: structural before regex") {
    val f = docs.filter(
      col("text").rlike("spark") && col("lang") === "en" && col("n_chars") > 10)
    val filterLine = f.queryExecution.optimizedPlan.toString
      .linesIterator.find(_.trim.startsWith("Filter")).get
    // the written order put RLIKE first; the optimized Filter must not
    assert(filterLine.contains("RLIKE"), filterLine)
    assert(filterLine.indexOf("RLIKE") > filterLine.indexOf("n_chars"), filterLine)
    assert(filterLine.indexOf("RLIKE") > filterLine.indexOf("= en"), filterLine)
    // same rows as the hand-ordered form
    val manual = docs.filter(
      col("lang") === "en" && col("n_chars") > 10 && col("text").rlike("spark"))
    assert(f.count() == manual.count())
  }

  test("the cached-regex pair and the screen engine sort like their stock kin") {
    import org.apache.spark.sql.graft.{ContainsAnyFolded, RegexpCountCached, RLikeCached}
    // the fan-out predicate's exact hazard: rlike_cached is regex-class
    // machinery, and an unrecognized class-0 default would sort it BEFORE
    // the structural checks, undoing the reorder the rule exists for
    val f = docs.filter(
      RLikeCached(col("text"), lit("spark")) && col("lang") === "en" &&
        RegexpCountCached(col("text"), lit("a")) > 2 && col("n_chars") > 10 &&
        ContainsAnyFolded(lower(col("text")), Seq("spark", "vector")))
    val line = f.queryExecution.optimizedPlan.toString
      .linesIterator.find(_.trim.startsWith("Filter")).get
    val structural = math.max(line.indexOf("n_chars"), line.indexOf("= en"))
    val screen = line.indexOf("contains_any_folded")
    val regex = math.min(line.indexOf("rlike_cached"), line.indexOf("regexp_count_cached"))
    assert(structural >= 0 && screen >= 0 && regex >= 0, line)
    assert(structural < screen && screen < regex,
      s"expected structural < screen < cached-regex, got: $line")
  }
}
