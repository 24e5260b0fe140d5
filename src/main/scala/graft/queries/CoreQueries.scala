package graft.queries

import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scan / filter / regex / top-K queries — SURVEY.md §2 DQ-01/02/03/09/14/18
  * plus the flagship pricing-summary aggregate used as the bench headline.
  *
  * Semantics source (what to compute): reference filter cascade at
  * /root/reference/src/subscription.ts:271-350 and the serving page at
  * /root/reference/src/algos/starrysky.ts:50-56; re-expressed over the
  * shared test tables per FIXTURES.md §A role mapping.
  */
object CoreQueries extends QueryModule {

  /** DQ-01 — equality predicates + projection (P1/P2): purchase events over
    * a value threshold. Catalyst pushes both predicates to the parquet scan.
    */
  private val dq01 = QueryEntry(
    "dq01_filter_scan",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .select(col("event_id"), col("user_id"), col("value"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT event_id, user_id, value FROM events
        |WHERE event_type = 'purchase' AND value > 100.0
        |ORDER BY event_id""".stripMargin),
    headline = true,
  )

  /** DQ-02 — include-regex match-count filter (P3,
    * subscription.ts:291-294): keep docs with >0 matches, return the count
    * itself (reused by the profileMatch conditional, DQ-08).
    */
  private val dq02 = QueryEntry(
    "dq02_regex_include",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .withColumn("n_matches", regexp_count(col("text"), lit("(spark|vector)")))
        .filter(col("n_matches") > 0)
        .select(col("doc_id"), col("n_matches"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, len(regexp_extract_all(text, '(spark|vector)')) AS n_matches
        |FROM documents
        |WHERE len(regexp_extract_all(text, '(spark|vector)')) > 0
        |ORDER BY doc_id""".stripMargin),
  )

  /** DQ-03 — exclude-regex filter (P4, subscription.ts:297-299): drop rows
    * whose text matches the invert pattern; empty pattern disables.
    */
  private val dq03 = QueryEntry(
    "dq03_regex_exclude",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .filter(col("lang") === "en" && !col("text").rlike("(slow|dup)"))
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, n_chars FROM documents
        |WHERE lang = 'en' AND NOT regexp_matches(text, '(slow|dup)')
        |ORDER BY doc_id""".stripMargin),
  )

  /** DQ-09 — language filter (P10, subscription.ts:218-222) as a grouped
    * count per source; the predicate reaches the parquet scan.
    */
  private val dq09 = QueryEntry(
    "dq09_lang_filter",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .filter(col("lang") === "en")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("source"))
    },
    Some(
      """SELECT source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin),
  )

  /** DQ-14 — counts + distinct collection (A1/A2, subscription.ts:241-252):
    * distinct actor count among purchase events.
    */
  private val dq14 = QueryEntry(
    "dq14_distinct_count",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .filter(col("event_type") === "purchase")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
    },
    Some(
      """SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_events
        |FROM events WHERE event_type = 'purchase'""".stripMargin),
  )

  /** DQ-18 — top-K newest-first page (K1, starrysky.ts:50-56): ORDER BY
    * event-time DESC with a unique tiebreak, LIMIT 50, served through
    * [[graft.operators.Paging.topK]] — by default the native keyless
    * TopKPerKey plan (per-partition bounded heaps + single-partition
    * merge; `spark.graft.topk.native=false` restores
    * TakeOrderedAndProject). The projection runs BEFORE the heap so the
    * parquet scan still prunes to three columns; the heap output is
    * unordered, so the page order is a final 50-row sort. Timestamps are
    * compared at microsecond precision on both engines (parquet ns is
    * truncated).
    */
  private val dq18 = QueryEntry(
    "dq18_topk_page",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val base = t.events
        .filter(col("event_type") === "purchase")
        .withColumn("ts_us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"), col("ts_us"))
      graft.operators.Paging.topK(base, col("ts_us"), col("event_id"), 50)
        .orderBy(col("ts_us").desc, col("event_id").desc)
    },
    Some(
      """SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY ts_us DESC, event_id DESC LIMIT 50""".stripMargin),
    headline = true,
  )

  /** Flagship pricing-summary aggregate (bench headline): exact decimal
    * arithmetic internally, DOUBLE at the boundary so both engines emit
    * bit-identical values regardless of aggregation order.
    */
  private val q1Pricing = QueryEntry(
    "q01_pricing_summary",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val d = (c: String) => col(c).cast("decimal(12,2)")
      t.lineitem
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(d("l_quantity")).cast("double").as("sum_qty"),
          sum(d("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(d("l_extendedprice") * (lit(1).cast("decimal(12,2)") - d("l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),
    headline = true,
  )

  override def entries: Seq[QueryEntry] =
    Seq(dq01, dq02, dq03, dq09, dq14, dq18, q1Pricing)
}
