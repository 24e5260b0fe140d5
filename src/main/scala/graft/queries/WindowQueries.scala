package graft.queries

import graft.operators.{Retention, Upsert}
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Window-rank queries — SURVEY.md §2 DQ-12 (newest-N delete, S10/W2),
  * DQ-13 (per-key retention cap, S11/W1/A4), DQ-15 (fixed-size batching,
  * A3). All implemented through the Retention/Upsert operators.
  */
object WindowQueries extends QueryModule {

  /** DQ-12 — refresh delete: drop each user's 3 newest events, count the
    * survivors per user. */
  private val dq12 = QueryEntry(
    "dq12_delete_newest",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val kept = Retention.dropNewest(
        t.events.withColumn("ts_us", unix_micros(col("ts"))),
        Seq(col("user_id")), col("ts_us"), col("event_id"), 3)
      kept.groupBy(col("user_id"))
        .agg(count(lit(1)).as("kept"))
        .orderBy(col("user_id"))
    },
    Some(
      """SELECT user_id, count(*) AS kept FROM (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn > 3 GROUP BY user_id ORDER BY user_id""".stripMargin),
  )

  /** DQ-13 — retention cap: keep each user's newest 5 events. */
  private val dq13 = QueryEntry(
    "dq13_retention_cap",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Retention.keepNewest(
        t.events.withColumn("ts_us", unix_micros(col("ts"))),
        Seq(col("user_id")), col("ts_us"), col("event_id"), 5)
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 5 ORDER BY user_id, event_id""".stripMargin),
  )

  /** DQ-15 — fixed-size batching of distinct keys (25 per batch, matching
    * the reference's profile-fetch flush). */
  private val dq15 = QueryEntry(
    "dq15_batching",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Upsert.batchIds(t.events, "user_id", 25)
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n_dids"), min(col("user_id")).as("first_did"))
        .orderBy(col("batch_id"))
    },
    Some(
      """SELECT batch_id, count(*) AS n_dids, min(user_id) AS first_did FROM (
        |  SELECT user_id,
        |    CAST(FLOOR((row_number() OVER (ORDER BY user_id) - 1) / 25) AS BIGINT) AS batch_id
        |  FROM (SELECT DISTINCT user_id FROM events))
        |GROUP BY batch_id ORDER BY batch_id""".stripMargin),
  )

  /** dq13's retention semantics through the custom whole-operator plan
    * (TopKPerKeyNode → TopKPerKeyStrategy → bounded-heap TopKPerKeyExec,
    * SURVEY §4.3 ladder rung (c)) — same oracle, no sort in the plan. */
  private val ns40 = QueryEntry(
    "ns40_topk_custom_plan",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
      org.apache.spark.sql.graft.TopKPerKey(
          e, Seq("user_id"), Seq("ts_us" -> true, "event_id" -> true), 5)
        .select(col("user_id"), col("event_id"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn <= 5 ORDER BY user_id, event_id""".stripMargin),
  )

  override def entries: Seq[QueryEntry] = Seq(dq12, dq13, dq15, ns40)
}
