package graft.queries

import graft.operators.Sessionize
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Event-time operators beyond the reference surface: tumbling-window
  * aggregation (Spark's `window()`), gap sessionization, and HLL approx
  * distinct (rows-only check — sketches differ across engines by design).
  */
object TemporalQueries extends QueryModule {

  /** Tumbling 1-hour window counts (the streaming windowed-agg shape, run
    * batch here; `window()` aligns to epoch hours = date_trunc in UTC). */
  private val ns18 = QueryEntry(
    "ns18_time_window",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value")).cast("long")).as("sum_vfloor"))
        .select(unix_micros(col("w.start")).as("win_us"), col("event_type"),
          col("n"), col("sum_vfloor"))
        .orderBy(col("win_us"), col("event_type"))
    },
    Some(
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS win_us,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(FLOOR(value) AS BIGINT)) AS BIGINT) AS sum_vfloor
        |FROM events
        |GROUP BY 1, 2 ORDER BY win_us, event_type""".stripMargin),
  )

  /** Gap sessionization (1-hour gap) — lag + running-sum windows; the
    * streaming flatMapGroupsWithState twin is spec-tested for parity. */
  private val ns19 = QueryEntry(
    "ns19_sessionize",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
      Sessionize.batch(e, "user_id", "ts_us", "event_id", gapUs = 3600000000L)
        .orderBy(col("user_id"), col("session_id"))
    },
    Some(
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id FROM events),
        |l AS (SELECT user_id, ts_us, event_id,
        |        lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev FROM e),
        |n AS (SELECT user_id, ts_us, event_id,
        |        CASE WHEN prev IS NULL OR ts_us - prev > 3600000000 THEN 1 ELSE 0 END AS nw FROM l),
        |s AS (SELECT user_id, ts_us,
        |        CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM n)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM s GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin),
  )

  /** HLL approx distinct vs exact. The raw sketch estimate is
    * engine-specific, so the hashed output carries the exact count plus an
    * error-bound verdict (|approx−exact| ≤ 10% — double the default 5% rsd):
    * the oracle states the exact counts and asserts the bound holds, which
    * verifies both the grouping and the sketch's accuracy contract. */
  private val ns17 = QueryEntry(
    "ns17_approx_distinct",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx") - col("exact_users")).cast("double") <=
            col("exact_users").cast("double") * 0.10).as("approx_ok"))
        .orderBy(col("event_type"))
    },
    Some(
      """SELECT event_type, count(DISTINCT user_id) AS exact_users, TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
  )

  /** As-of attribution: each purchase matched to the user's latest view
    * at-or-before it. The oracle states the identical union+window form. */
  private val ns21 = QueryEntry(
    "ns21_asof_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
      val purchases = e.filter(col("event_type") === "purchase")
      val views = e.filter(col("event_type") === "view")
      graft.operators.AsOfJoin.lastAtOrBefore(
          purchases, views, "user_id", "ts_us", "event_id")
        .select(col("id").as("event_id"), col("key").as("user_id"),
          col("matched_id").as("view_id"), col("matched_ts_us").as("view_ts_us"))
        .orderBy(col("event_id"))
    },
    Some(
      """WITH tagged AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, event_id,
        |    CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |w AS (
        |  SELECT user_id, ts_us, event_id, side,
        |    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_id,
        |    last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts_us, side, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_ts_us
        |  FROM tagged)
        |SELECT event_id, user_id, view_id, view_ts_us
        |FROM w WHERE side = 1 ORDER BY event_id""".stripMargin),
  )

  override def entries: Seq[QueryEntry] = Seq(ns17, ns18, ns19, ns21)
}
