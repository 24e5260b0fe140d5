package graft.queries

import graft.functions.MinHashAgg
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Multi-way join aggregates (classic analytics shapes for the bench
  * headline) + the Aggregator-based MinHash sketch (custom typed UDAF with
  * map-side partial aggregation).
  */
object AnalyticsQueries extends QueryModule {

  /** Revenue by nation: fact orders joined through two broadcast
    * dimensions — no fact-side shuffle before the aggregate. */
  private val q02 = QueryEntry(
    "q02_revenue_by_nation",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    },
    Some(
      """SELECT n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin),
    headline = true,
  )

  /** Order-priority counts per ship-mode-ish dimension over a fact-fact
    * join (orders ⋈ lineitem) — the one genuinely shuffled join in the
    * catalog; AQE picks the strategy at runtime. */
  private val q03 = QueryEntry(
    "q03_order_lineitem_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "R")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    },
    Some(
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l_returnflag = 'R'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
    headline = true,
  )

  /** Top suppliers by discounted revenue in a date window — the classic
    * warehouse ranking: a date-pruned fact-fact join (lineitem ⋈ orders,
    * AQE-planned like q03) with two broadcast dimension hops
    * (supplier, nation), decimal-exact revenue, and a bounded top-10
    * (TakeOrderedAndProject, never a global sort). */
  private val q08 = QueryEntry(
    "q08_top_suppliers",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val d = (c: String) => col(c).cast("decimal(12,2)")
      t.lineitem
        .join(t.orders.filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("s_suppkey"), col("s_name"), col("n_name"))
        .agg(
          sum(d("l_extendedprice") * (lit(1).cast("decimal(12,2)") - d("l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
        .limit(10)
    },
    Some(
      """SELECT s_suppkey, s_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY s_suppkey, s_name, n_name
        |ORDER BY revenue DESC, s_suppkey LIMIT 10""".stripMargin),
  )

  /** Per-source MinHash sketch via the typed Aggregator — the sketch of a
    * group equals the elementwise min of member signatures, which the
    * oracle states directly. */
  private val ns16 = QueryEntry(
    "ns16_minhash_group_sketch",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val sk = t.documents.groupBy(col("source"))
        .agg(MinHashAgg.sketch(col("text"), 8).as("sketch"))
      sk.select(col("source") +:
        (0 until 8).map(i => element_at(col("sketch"), i + 1).as(s"mh$i")): _*)
        .orderBy(col("source"))
    },
    Some {
      val per = (0 until 8).map(i =>
        s"list_aggregate(list_transform(w, x -> md5(x || ':$i')), 'min') AS mh$i").mkString(", ")
      val mins = (0 until 8).map(i => s"min(mh$i) AS mh$i").mkString(", ")
      s"""SELECT source, $mins FROM (
         |  SELECT source, $per
         |  FROM (SELECT source, list_distinct(string_split(lower(text), ' ')) AS w FROM documents))
         |GROUP BY source ORDER BY source""".stripMargin
    },
  )

  /** Hierarchical totals via ROLLUP (grand total + per-flag + per-flag-
    * status). Spark sorts NULLS FIRST ascending by default; the oracle
    * says so explicitly because DuckDB defaults to NULLS LAST. */
  private val q04 = QueryEntry(
    "q04_rollup",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.lineitem
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
  )

  /** Full CUBE over two dimensions (all grouping sets). */
  private val q05 = QueryEntry(
    "q05_cube",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .cube(col("event_type"), col("user_id") % 10)
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value")).cast("long")).as("sum_vfloor"))
        .withColumnRenamed("(user_id % 10)", "user_mod")
        .orderBy(col("event_type"), col("user_mod"))
    },
    Some(
      """SELECT event_type, user_id % 10 AS user_mod, count(*) AS n,
        |  CAST(sum(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_vfloor
        |FROM events
        |GROUP BY CUBE (event_type, user_id % 10)
        |ORDER BY event_type NULLS FIRST, user_mod NULLS FIRST""".stripMargin),
  )

  /** Edit-distance fuzzy matching (curation-style entity dedup): nation
    * name pairs within Levenshtein ≤ 5 — identical DP ints on both
    * engines. */
  private val ns25 = QueryEntry(
    "ns25_edit_distance",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val a = t.nation.select(col("n_nationkey").as("id_a"), col("n_name").as("name_a"))
      val b = t.nation.select(col("n_nationkey").as("id_b"), col("n_name").as("name_b"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
        .filter(col("dist") <= 5)
        .select(col("id_a"), col("id_b"), col("dist"))
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      """SELECT a.n_nationkey AS id_a, b.n_nationkey AS id_b,
        |  CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
        |WHERE levenshtein(a.n_name, b.n_name) <= 5
        |ORDER BY id_a, id_b""".stripMargin),
  )

  /** Left-semi join (membership, the positive twin of dq10's anti-join). */
  private val q06 = QueryEntry(
    "q06_semi_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val errored = t.events.filter(col("event_type") === "error").select(col("user_id"))
      t.events
        .join(errored, Seq("user_id"), "left_semi")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT e.event_id, e.user_id FROM events e
        |WHERE e.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events s WHERE s.event_type = 'error' AND s.user_id = e.user_id)
        |ORDER BY e.event_id""".stripMargin),
  )

  /** Conditional aggregation (FILTER-clause shape). */
  private val q07 = QueryEntry(
    "q07_filtered_agg",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          sum(when(col("event_type") === "purchase", floor(col("value")).cast("long"))
            .otherwise(lit(0L))).as("purchase_vfloor"))
        .orderBy(col("user_id"))
    },
    Some(
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |  CAST(coalesce(sum(CAST(FLOOR(value) AS BIGINT)) FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_vfloor
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
  )

  /** Exact interpolated percentiles per group: Spark `percentile` and
    * DuckDB `quantile_cont` share the textbook lower + (upper-lower)·frac
    * formula at pos = q·(n-1), so the doubles agree bit-for-bit. */
  private val ns39 = QueryEntry(
    "ns39_length_percentiles",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents.groupBy(col("source"))
        .agg(
          expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.9)").as("p90"),
          expr("percentile(n_chars, 0.99)").as("p99"))
        .orderBy(col("source"))
    },
    Some(
      """SELECT source,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.9) AS p90,
        |  quantile_cont(n_chars, 0.99) AS p99
        |FROM documents GROUP BY source ORDER BY source""".stripMargin),
  )

  /** TPC-H Q17's shape — revenue locked in small-quantity orders: lines
    * whose quantity sits under 20 % of their part's average. The
    * correlated scalar subquery becomes a per-part aggregate joined back
    * onto the fact (unhinted: the agg side is |parts| rows — broadcast at
    * bench scale, a keyed shuffle join at warehouse scale), and the
    * threshold compares in EXACT INTEGER space — `5·qty·cnt < Σqty` with
    * integral TPC-H quantities as longs — so no 0.2·avg double ever
    * exists to drift between engines; the one division (sum/7) is the
    * final IEEE op on identical exact inputs. */
  private val q09 = QueryEntry(
    "q09_small_qty_revenue",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val qtyL = col("l_quantity").cast("long")
      val pa = t.lineitem
        .groupBy(col("l_partkey"))
        .agg(sum(qtyL).as("sq"), count(lit(1)).as("cq"))
      t.lineitem
        .join(pa, "l_partkey")
        .filter(qtyL * lit(5L) * col("cq") < col("sq"))
        .agg(
          (sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double") / 7.0)
            .as("avg_yearly"),
          count(lit(1)).as("n_items"))
    },
    Some(
      """SELECT
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN (SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        |        count(*) AS cq
        |      FROM lineitem GROUP BY l_partkey) p
        |  ON l.l_partkey = p.l_partkey
        |WHERE CAST(l.l_quantity AS BIGINT) * 5 * p.cq < p.sq""".stripMargin),
    headline = true,
  )

  override def entries: Seq[QueryEntry] =
    Seq(q02, q03, q04, q05, q06, q07, q08, q09, ns16, ns25, ns39)
}
