package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

import graft.{SparkEntry, SparkSpec, Tables}
import graft.operators.TextAnalysis

/** Structural pins for the most expensive catalog plans (the VERDICT-r8
  * plan-audit shortlist): shuffle-exchange counts, broadcast-join counts,
  * and the presence of the operators that make each plan scale-right
  * (TakeOrderedAndProject, WindowGroupLimit). PLANS.md records these
  * shapes as prose; this makes a silently added exchange or a
  * broadcast-to-sort-merge demotion a test failure instead of a perf
  * regression discovered a round later.
  *
  * Conventions shared with [[WindowAuditSpec]]: AQE off while building
  * (AdaptiveSparkPlanExec hides its inner plan from collect) and
  * collectWithSubqueries (plans hanging off scalar/IN subqueries must not
  * evade the count). Counts are of PLAN NODES at sf0.001 — a frame
  * consumed by two branches is counted once per appearance (its runtime
  * cost is shared via ReusedExchange/materialization), so the pins are
  * plan-shape equality, not job-count claims. */
class PlanShapeSpec extends SparkSpec {

  private case class Shape(shuffles: Int, broadcastJoins: Int,
      sortMergeJoins: Int, objectHashAggs: Int, windows: Int,
      windowGroupLimits: Int, takeOrdered: Int)

  private def shapeOf(plan: SparkPlan): Shape = {
    def n(pf: PartialFunction[SparkPlan, Unit]): Int =
      plan.collectWithSubqueries(pf).size
    Shape(
      shuffles = n { case _: ShuffleExchangeExec => },
      broadcastJoins = n { case _: BroadcastHashJoinExec => },
      sortMergeJoins = n { case _: SortMergeJoinExec => },
      objectHashAggs = n { case _: ObjectHashAggregateExec => },
      windows = n { case _: WindowExec => },
      windowGroupLimits = n { case _: WindowGroupLimitExec => },
      takeOrdered = n { case _: TakeOrderedAndProjectExec => })
  }

  /** The executed plan with AQE off — ONE place for the toggle, and one
    * plan build serves both a Shape and any node-level assertions. */
  private def plannedOf(build: => DataFrame): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try build.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def pinned(build: => DataFrame): Shape = shapeOf(plannedOf(build))

  private def catalogPlan(name: String): SparkPlan =
    plannedOf(SparkEntry.queries(name)(spark, sf0001))

  private def catalog(name: String): Shape = shapeOf(catalogPlan(name))

  test("ns27 tf-idf top-terms: docfreq is an aggregate+join (never a term window), " +
      "final top-k is TopKPerKey") {
    // r12 rewrite, three steps: the per-doc row_number window became the
    // TopKPerKey physical pair (map-side heaps cut each partition to k
    // rows per doc BEFORE the per-doc exchange, nothing sorts whole
    // partitions); tf moved IN-ROW (TermCounts) — the (doc, term)
    // groupBy exchange vanished because a document's term frequencies
    // never needed to leave its row; and docfreq became
    // groupBy(term).count joined back — the count window it replaced
    // buffered whole term partitions, and the hottest term's partition is
    // ~the corpus (the window form OOM-killed the 20M smoke; map-side
    // combine collapses the same rows to one pair per task). windows = 0
    // is the load-bearing pin here; the broadcast is the df table at
    // bench scale (a web-scale vocabulary demotes it to a streaming
    // shuffle join, which is the point of leaving the join unhinted)
    import org.apache.spark.sql.graft.TopKPerKeyExec
    val name = "ns27_tfidf_topterms"
    val plan = catalogPlan(name)
    assert(shapeOf(plan) == Shape(
      shuffles = 4, broadcastJoins = 1, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    val heaps = plan.collectWithSubqueries { case t: TopKPerKeyExec => t.partial }
    assert(heaps.sorted == Seq(false, true),
      s"$name: expected the partial+final TopKPerKey pair, got $heaps")
  }

  test("ns52 bm25: one-scan base, in-row probe prune, stats broadcast, top-k is TakeOrdered") {
    // r12: tf moved in-row (TermCounts) — the (doc, term) groupBy
    // exchange and the downstream re-exchange it forced are gone.
    // r14: the probe SEMI-JOIN became an in-row filter over the term
    // counts and the corpus is tokenized exactly once into a checkpointed
    // (id, dl, pruned-counts) base every stat reads — the probe-join and
    // dl-join broadcasts fell out of the plan with it (4 → 2 broadcasts:
    // docfreq + the one-row stats), measured 28.3 s → 5.8 s at 2 M docs
    // and 250 s → 38.6 s at 20 M.
    assert(catalog("ns52_bm25_search") == Shape(
      shuffles = 3, broadcastJoins = 2, sortMergeJoins = 0,
      objectHashAggs = 2, windows = 0, windowGroupLimits = 0, takeOrdered = 1))
  }

  test("ns66 ivf-pq: query side broadcasts, candidate encode is a projection, rank is group-limit pruned") {
    // the composed index's plan contract: the corpus-sized candidate side
    // is a pure scan projection (cell + m codes) probed by BROADCAST
    // joins only — its 3 shuffles belong to the |Q|-sized ADC-table
    // aggregation and the final per-query window, never to the corpus
    assert(catalog("ns66_ann_ivf_pq") == Shape(
      shuffles = 3, broadcastJoins = 5, sortMergeJoins = 0,
      objectHashAggs = 2, windows = 1, windowGroupLimits = 2, takeOrdered = 0))
  }

  test("q08 top suppliers: one fact-fact shuffle, dims broadcast, top-k is TakeOrdered") {
    assert(catalog("q08_top_suppliers") == Shape(
      shuffles = 1, broadcastJoins = 3, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 1))
  }

  test("ns42 ann pq: encode is a projection, query tables broadcast, rank is group-limit pruned") {
    // r9 NearestCells rewrite: candidate encoding lost its broadcast
    // codebook join AND its per-corpus-key pivot shuffle (now a pure
    // projection); the two remaining broadcasts are the query-id semi-join
    // and the m×ks ADC-table join, both |Q|-sized
    assert(catalog("ns42_ann_pq") == Shape(
      shuffles = 3, broadcastJoins = 2, sortMergeJoins = 0,
      objectHashAggs = 2, windows = 1, windowGroupLimits = 2, takeOrdered = 0))
  }

  test("ns61 packed-code ivf: every join broadcast, rank is group-limit pruned, " +
      "no sort-merge anywhere") {
    // the scale path's load-bearing pins: the candidate side is scanned
    // once and never sort-merge-joined, and the per-query top-k prunes
    // through WindowGroupLimit rather than a global sort. Since the r15
    // cells pin the CATALOG entry reads the shared (id → cell)-joined
    // checkpoint, so its plan shows only the query-side joins (semi +
    // cell equi — broadcast at this SF; at 100 TB the cell equi-join
    // shuffles on cluster, which AQE picks over broadcast automatically);
    // the codes/assignment joins live in the pin build, asserted on the
    // UNCACHED operator below (the memory rule: inspect the underlying
    // plan, not the checkpoint that hides it).
    assert(catalog("ns61_ann_ivf_sq8") == Shape(
      shuffles = 2, broadcastJoins = 2, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 1, windowGroupLimits = 2, takeOrdered = 0))
    val t = Tables(spark, sf0001)
    val uncached = pinned(graft.operators.KMeansIvf.searchSq8(
      t.embeddings.filter(org.apache.spark.sql.functions.col("vec_id") < 5),
      t.embeddings, "vec_id", "embedding", k = 5, nCells = 8, iters = 2))
    // objectHashAggs = 2: with no boundsCacheKey the SQ8 bounds pass
    // (MinMaxVecAgg partial+final) stays in-plan too
    assert(uncached == Shape(
      shuffles = 2, broadcastJoins = 4, sortMergeJoins = 0,
      objectHashAggs = 2, windows = 1, windowGroupLimits = 2, takeOrdered = 0),
      "uncached searchSq8 must keep the all-broadcast dataflow the pin hides")
  }

  test("ns28 repetition: scan-only — zero corpus-keyed exchanges, no joins, no aggregates") {
    // r15 rewrite: every repetition signal is document-local, so the whole
    // operator is one projection over in-row TermCounts (words + bigrams).
    // The former shape exploded to a distinct-(doc, term) stream and moved
    // it through two corpus-sized exchanges plus a join to re-co-locate
    // rows that never left their row — at 100 TB that exchange WAS the
    // operator. The only exchange allowed is the presentation orderBy's
    // range partition.
    val plan = catalogPlan("ns28_repetition")
    assert(shapeOf(plan) == Shape(
      shuffles = 1, broadcastJoins = 0, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    assert(plan.collectWithSubqueries {
        case s: ShuffleExchangeExec
          if !s.outputPartitioning.toString.contains("range") => () }.isEmpty,
      "ns28: the one exchange must be the orderBy range partition, nothing corpus-keyed")
  }

  test("ns29/ns47 contamination family: tiny probes are scan-local — no joins, no Expand") {
    // r12 rewrite: a gate-tiny probe set becomes a sorted array LITERAL
    // intersected row-locally (IntersectSizeSorted), so the plan has NO
    // join of any kind and no per-doc aggregate; the screen's hit filter
    // is the contains-any predicate pushed into the scan (pushing
    // `n_hits > 0` instead inlines the O(words²) n-gram lambda — the trap
    // this pin guards). The former count_distinct Expand must not come
    // back either. The >gate probe path keeps the broadcast hash join
    // (covered by the operator specs).
    import org.apache.spark.sql.execution.ExpandExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    for (name <- Seq("ns29_contamination", "ns47_containment_score")) {
      val plan = catalogPlan(name)
      assert(plan.collectWithSubqueries { case _: ExpandExec => }.isEmpty,
        s"$name: count_distinct Expand machinery crept back in")
      assert(plan.collectWithSubqueries {
          case _: BroadcastHashJoinExec => ()
          case _: BroadcastNestedLoopJoinExec => ()
          case _: SortMergeJoinExec => () }.isEmpty,
        s"$name: tiny-probe path must be join-free (probe set is a literal)")
      assert(plan.collectWithSubqueries {
          case s: ShuffleExchangeExec
            if !s.outputPartitioning.toString.contains("range") => () }.isEmpty,
        s"$name: scan-local path must not shuffle (orderBy range exchange aside)")
    }
  }

  test("ns51 source overlap: two codegen aggregates, no set aggregate, no window, " +
      "sizes join broadcast") {
    // materialize = identity keeps the whole dataflow in ONE inspectable
    // plan; the two fan consumers then each embed the upstream (4 shuffle
    // nodes = 2 distinct exchanges × 2 appearances, reuse-deduped at
    // runtime). The load-bearing pins: no ObjectHashAggregate (the r8
    // collect_set shape), no sort-merge join, no window anywhere.
    val t = Tables(spark, sf0001)
    val shape = pinned(TextAnalysis.sourceOverlap(
      t.documents, "source", "text", 3, materialize = identity))
    assert(shape == Shape(
      shuffles = 4, broadcastJoins = 2, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
  }

  test("ns71 dsir scoring plane: zero exchanges — in-row BucketCounts + literal dots") {
    // the r13 rewrite: a document's whole DSIR feature map is one in-row
    // codegen'd BucketCounts vector, scoring is two in-row DotLongs
    // against the collected-stats literals — so the scoring plane has NO
    // shuffle, NO join, NO aggregate of any kind. (The former join form —
    // 256-row broadcast + per-doc re-group — and the HOF-literal form
    // that lost the 2 M race 49.0 s to 13.9 s are both superseded; this
    // keeps the join form's codegen md5 and the literal form's zero
    // exchanges.) The stats pass underneath is a separate config-sized
    // aggregate, cached per statsKey.
    val t = Tables(spark, sf0001)
    val shape = pinned(TextAnalysis.dsirWeights(t.documents, "doc_id", "text",
      org.apache.spark.sql.functions.col("lang") === "en", 256,
      "dsir-planshape-pin"))
    assert(shape == Shape(
      shuffles = 0, broadcastJoins = 0, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    // catalog entries share ONE pinned scored frame (SharedCache): each
    // adds only its presentation sort (ns72: plus a row-local filter)
    assert(catalog("ns71_dsir_weights") == Shape(
      shuffles = 1, broadcastJoins = 0, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    assert(catalog("ns72_dsir_sample") == Shape(
      shuffles = 1, broadcastJoins = 0, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
  }

  test("feed fan-out: posts scan-local, conditions broadcast into one nested-loop join, cached regex in the predicate") {
    // SURVEY §7.4#6's one-keyed-job form at any width: the post stream is
    // NEVER shuffled — the N standing conditions broadcast into a single
    // BroadcastNestedLoopJoin whose predicate runs the CACHED regex
    // expressions (a silent fallback to stock rlike/regexp_count would
    // reintroduce a Pattern.compile per (post × condition) — the width-
    // race loss recorded in SCALE.md's fanout section)
    val s = spark
    import s.implicits._
    val posts = graft.domain.Fixtures.posts.toDF()
    val conds = graft.operators.FilterCascade.conditionsDf(spark,
      graft.ScaleSmoke.standingConditions(8))
    val plan = plannedOf(
      graft.operators.FilterCascade.fanOut(posts, conds, None))
    assert(shapeOf(plan) == Shape(
      shuffles = 0, broadcastJoins = 0, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    assert(plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.size == 1, "conditions must broadcast into one nested-loop join")
    val txt = plan.toString
    assert(txt.contains("rlike_cached") && txt.contains("regexp_count_cached"),
      "fan-out predicate regressed to stock per-row-compile regex")
  }

  test("indexed fan-out: candidate ordinals explode into one broadcast HASH join — no nested loop, no shuffle") {
    // fanOutScreened's screenable branch is the inverted-index form: the
    // matched_conditions_folded scan emits candidate ordinals, so the
    // condition join is an EQUI join (BroadcastHashJoin), never the
    // |posts|×width BroadcastNestedLoopJoin, and the post side still
    // never shuffles
    val s = spark
    import s.implicits._
    val posts = graft.domain.Fixtures.posts.toDF()
    val plan = plannedOf(graft.operators.FilterCascade.fanOutScreened(
      spark, posts, graft.ScaleSmoke.standingConditions(8), None))
    assert(shapeOf(plan) == Shape(
      shuffles = 0, broadcastJoins = 1, sortMergeJoins = 0,
      objectHashAggs = 0, windows = 0, windowGroupLimits = 0, takeOrdered = 0))
    assert(plan.collectWithSubqueries {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, "screenable conditions must take the hash join, not the nested loop")
    val txt = plan.toString
    assert(txt.contains("matched_conditions_folded"),
      "the candidate scan regressed off the tagged automaton")
  }

  test("ns69 knn graph: one block-keyed pair join, per-node top-k through TopKPerKey heaps") {
    import org.apache.spark.sql.graft.TopKPerKeyExec
    // the catalog entry now reads the SharedCache-pinned graph (ns70
    // shares it), which hides the dataflow behind a checkpoint scan — so
    // the pin inspects the UNDERLYING knnGraph plan directly.
    // sf0.001 sizes put the block join under the broadcast gate (that's
    // the right local plan; at scale AQE re-decides from real sizes —
    // knnGraph's scaladoc carries the argument), the TopKPerKey pair
    // replaces any window, and nothing cartesians
    val t = Tables(spark, sf0001)
    val build = graft.operators.Similarity.knnGraph(t.embeddings,
      "vec_id", "embedding", blockCols = Seq("label"), k = 3, dim = Some(64))
    val plan = plannedOf(build)
    val s = shapeOf(plan)
    assert(s.windows == 0 && s.sortMergeJoins == 0 && s.takeOrdered == 0, s)
    assert(plan.collectWithSubqueries { case e: TopKPerKeyExec => e }.size == 2, plan)
  }
}
