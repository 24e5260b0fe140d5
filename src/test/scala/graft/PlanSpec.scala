package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan assertions: the catalog's queries must keep the plan
  * shapes that survive a 100× scale-up — predicate/column pushdown into
  * the parquet scan, broadcast joins for dimensions, TakeOrderedAndProject
  * for top-K (never a global sort), and partial (map-side) aggregation.
  */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    spark.catalog.clearCache() // other suites may have cached these tables
    val df: DataFrame = SparkEntry.queries(name)(spark, sf0001)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("dq01: predicates and column pruning reach the parquet scan") {
    val p = planOf("dq01_filter_scan")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value), EqualTo(event_type,purchase), GreaterThan(value,100.0)]"), p)
    assert(p.contains("ReadSchema: struct<event_id:bigint,user_id:bigint,event_type:string,value:double>"), p)
  }

  test("dq02: regex filter scans only the needed columns") {
    val p = planOf("dq02_regex_include")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("dq18: top-K page runs as partial+final bounded heaps, never a full-table sort") {
    val p = planOf("dq18_topk_page")
    // native keyless TopKPerKey: map-side heap below the single-partition
    // exchange, merge heap above — TakeOrderedAndProject's shape through
    // the custom operator; the only Sort orders the 50 surviving rows
    assert("TopKPerKey ".r.findAllIn(p).size == 2, p)
    assert(p.indexOf("TopKPerKey ") > p.indexOf("Sort "), p) // sort sits above the heaps
  }

  test("ns69: kNN graph is a blocked equi-join + TopKPerKey — no window, no cartesian") {
    // the catalog entry reads the SharedCache-pinned graph (ns70 shares
    // it), which hides the dataflow behind a checkpoint scan — inspect
    // the underlying operator plan, like PlanShapeSpec does
    spark.catalog.clearCache()
    val df = graft.operators.Similarity.knnGraph(Tables(spark, sf0001).embeddings,
      "vec_id", "embedding", blockCols = Seq("label"), k = 3, dim = Some(64))
    val qe = df.queryExecution
    val p = qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
    // every node is a query, so there is no small side to broadcast as a
    // nested loop: the pair generator must be an EQUI-join on the block
    // key, and the per-node top-k must be the heap pair (a row_number
    // window would buffer a hot node's whole candidate list)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("ns69/ns71 catalog entries read their SharedCache pin: one checkpoint scan + the presentation sort") {
    // the underlying operator shapes are pinned above (ns69) and in
    // PlanShapeSpec (ns71's zero-shuffle scoring plane); this pin guards
    // the CATALOG WIRING — if an entry stopped reading its shared fit
    // (wrong SharedCache key, parameter drift) its plan would re-grow the
    // join/aggregate dataflow instead of a bare checkpoint scan
    for (name <- Seq("ns69_knn_graph", "ns71_dsir_weights")) {
      val p = planOf(name)
      assert(p.contains("Scan ExistingRDD"), s"$name: not a checkpoint scan\n$p")
      assert(p.contains("Sort "), s"$name: missing the presentation sort\n$p")
      for (bad <- Seq("Join", "HashAggregate", "TopKPerKey", "DotLongs", "BucketCounts"))
        assert(!p.contains(bad),
          s"$name: catalog entry recomputes its fit ($bad in plan)\n$p")
    }
  }

  test("q09: the per-part average is an aggregate joined broadcast onto the fact") {
    val p = planOf("q09_small_qty_revenue")
    // the correlated scalar subquery must decorrelate to ONE per-part
    // aggregate (never a per-row subquery), and at this scale its
    // |parts|-sized result broadcasts; the fact table is scanned, never
    // cartesian-paired with itself
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("dq08: the profile dimension joins via broadcast hash join") {
    val p = planOf("dq08_profile_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dq10: catch-up dedup runs as a real anti join") {
    val p = planOf("dq10_anti_join")
    assert(p.contains("LeftAnti"), p)
  }

  test("q01: grouped aggregate does map-side partial aggregation") {
    val p = planOf("q01_pricing_summary")
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p) // partial + final
  }

  test("q02: star join uses two broadcast joins, no fact shuffle before agg") {
    val p = planOf("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ns15: the feed pipeline serves its page through the bounded-heap top-k") {
    val p = planOf("ns15_feed_pipeline")
    // the serving page rides Paging.topK → native partial+final heap pair
    assert("TopKPerKey ".r.findAllIn(p).size == 2, p)
  }

  test("ns03: LSH pair join is a broadcast hash join on long keys, no sort-merge") {
    val p = planOf("ns03_minhash_lsh_pairs")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("ns27: tfidf docfreq is aggregate+join — NO window over term partitions") {
    val p = planOf("ns27_tfidf_topterms")
    // docfreq is groupBy(term).count joined back onto the tf frame (a
    // count window over term must buffer the hottest term's ~corpus-sized
    // partition — it OOM-killed the 20M smoke), the corpus size N is a
    // one-row broadcast (nested-loop on 1 row, not a CartesianProduct
    // over data), and the per-doc top-k is the TopKPerKey physical pair
    // (r12: replaced the row_number window + WindowGroupLimit — the heap
    // passes never sort a partition and the map-side pass cuts to k rows
    // per doc before the exchange)
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ns34: vocab top-100 is TakeOrderedAndProject over a partial aggregate") {
    val p = planOf("ns34_vocab_top")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import org.apache.spark.sql.functions.col
    // At 100 TB a selective dimension filter becomes a bloom filter pushed
    // into the fact scan (InjectRuntimeFilter). The size thresholds that
    // gate it are cluster-scale; lower them to prove the plan shape here.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force the shuffle join shape
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val t = Tables(spark, sf0001)
      val sel = t.orders.filter(col("o_orderpriority") === "1-URGENT")
      val j = t.lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.toLowerCase.contains("bloom"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
