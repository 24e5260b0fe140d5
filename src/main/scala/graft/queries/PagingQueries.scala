package graft.queries

import graft.operators.Paging
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-page queries — SURVEY.md §2 DQ-19 (keyset cursor decode/encode +
  * tuple predicate, K2/K3) and DQ-20 (pinned-post union with explicit
  * ordinal, U1). DQ-19 exercises the REAL cursor machinery: page 1 is
  * served, its cursor string is encoded, decoded, and applied as the keyset
  * predicate for page 2 — the oracle states the same rows positionally
  * (rows 51-100 of the total order).
  */
object PagingQueries extends QueryModule {

  private def purchases(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .filter(col("event_type") === "purchase")
      .withColumn("ts_us", unix_micros(col("ts")))

  private val dq19 = QueryEntry(
    "dq19_keyset_page",
    (spark, dir) => {
      val base = purchases(spark, dir)
      val page1 = Paging.page(base, col("ts_us"), col("event_id"), 50, None)
      val cursor = Paging.encodeCursor(page1, col("ts_us"), col("event_id"))
      Paging.page(base, col("ts_us"), col("event_id"), 50, cursor, _.toLong)
        .select(col("event_id"), col("ts_us"))
        .orderBy(col("ts_us").desc, col("event_id").desc)
    },
    Some(
      """SELECT event_id, ts_us FROM (
        |  SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    row_number() OVER (ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn BETWEEN 51 AND 100
        |ORDER BY ts_us DESC, event_id DESC""".stripMargin),
  )

  private val dq20 = QueryEntry(
    "dq20_pinned_union",
    (spark, dir) => {
      val s = spark
      import s.implicits._
      val base = purchases(spark, dir)
      val page = Paging.page(base, col("ts_us"), col("event_id"), 10, None)
      val pageOrd = Paging.withOrdinal(page, col("ts_us"), col("event_id"), startAt = 2L)
        .select(col("ord"), col("event_id"))
      val pinned = Seq((0L, 1L), (1L, 2L)).toDF("ord", "event_id")
      pinned.unionByName(pageOrd).orderBy(col("ord"))
    },
    Some(
      """WITH page AS (
        |  SELECT event_id,
        |    row_number() OVER (ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC, event_id DESC) AS rn
        |  FROM events WHERE event_type = 'purchase' QUALIFY rn <= 10)
        |SELECT ord, event_id FROM (
        |  SELECT CAST(0 AS BIGINT) AS ord, CAST(1 AS BIGINT) AS event_id
        |  UNION ALL SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT)
        |  UNION ALL SELECT CAST(rn + 1 AS BIGINT), event_id FROM page)
        |ORDER BY ord""".stripMargin),
  )

  override def entries: Seq[QueryEntry] = Seq(dq19, dq20)
}
