package graft.queries

import graft.operators.Upsert
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Join queries — SURVEY.md §2 DQ-08 (profileMatch two-regex over a
  * broadcast profile join, J1/P9) and DQ-10 (anti-join dedup/catch-up,
  * J2/P12/S8/U2).
  */
object JoinQueries extends QueryModule {

  /** DQ-08 — posts ⋈ profiles with the conditional two-regex gate
    * (subscription.ts:319-350): docs play posts, customers play profiles
    * (author key = doc_id % 150 + 1). Keep a row unless the text matches
    * ONLY the narrow term (m1>0 and m0==m1) and the profile text fails the
    * profile regex. The dimension is broadcast — no shuffle of the fact side.
    */
  private val dq08 = QueryEntry(
    "dq08_profile_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val docs = t.documents
        .withColumn("author_key", col("doc_id") % 150 + 1)
        .withColumn("m0", regexp_count(col("text"), lit("(spark|vector)")))
        .withColumn("m1", regexp_count(col("text"), lit("vector")))
      val profiles = broadcast(t.customer)
      docs
        .join(profiles, docs("author_key") === profiles("c_custkey"), "left")
        .filter(
          !(col("m0") > 0 && col("m0") === col("m1")) ||
            coalesce(col("c_mktsegment"), lit("")).rlike("(BUILDING|MACHINERY)"))
        .select(col("doc_id"), col("m0").cast("long").as("m0"),
          col("m1").cast("long").as("m1"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, m0, m1, c_name, c_mktsegment FROM (
        |  SELECT d.doc_id,
        |    CAST(len(regexp_extract_all(d.text, '(spark|vector)')) AS BIGINT) AS m0,
        |    CAST(len(regexp_extract_all(d.text, 'vector')) AS BIGINT) AS m1,
        |    c.c_name, c.c_mktsegment
        |  FROM documents d LEFT JOIN customer c ON d.doc_id % 150 + 1 = c.c_custkey)
        |WHERE NOT (m0 > 0 AND m0 = m1)
        |   OR regexp_matches(coalesce(c_mktsegment, ''), '(BUILDING|MACHINERY)')
        |ORDER BY doc_id""".stripMargin),
  )

  /** DQ-10 — anti-join catch-up/dedup (stored-uri exclusion): the "stored"
    * set is every 7th event; the incoming batch keeps only unseen keys.
    * Runs as a real left_anti join in the Spark plan.
    */
  private val dq10 = QueryEntry(
    "dq10_anti_join",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val stored = t.events.filter(col("event_id") % 7 === 0)
        .select(col("event_id"))
      Upsert.newRows(stored, t.events, Seq("event_id"))
        .select(col("event_id"), col("user_id"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT e.event_id, e.user_id FROM events e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events s WHERE s.event_id % 7 = 0 AND s.event_id = e.event_id)
        |ORDER BY e.event_id""".stripMargin),
  )

  /** MERGE semantics (S12): stale stored rows (values doubled) are
    * replaced by fresh incoming rows on key match; unmatched stored rows
    * survive; unmatched incoming rows insert. */
  private val ns35 = QueryEntry(
    "ns35_merge_upsert",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val e = t.events.select(col("event_id"), col("user_id"), col("value"))
      val stored = e.filter(col("event_id") % 3 === 0)
        .withColumn("value", col("value") * 2)
      val incoming = e.filter(col("event_id") % 2 === 0)
      Upsert.merge(stored, incoming, Seq("event_id"))
        .orderBy(col("event_id"))
    },
    Some(
      """WITH stored AS (
        |  SELECT event_id, user_id, value * 2 AS value FROM events WHERE event_id % 3 = 0),
        |inc AS (
        |  SELECT event_id, user_id, value FROM events WHERE event_id % 2 = 0)
        |SELECT s.event_id, s.user_id, s.value FROM stored s
        |WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.event_id = s.event_id)
        |UNION ALL SELECT event_id, user_id, value FROM inc
        |ORDER BY event_id""".stripMargin),
  )

  override def entries: Seq[QueryEntry] = Seq(dq08, dq10, ns35)
}
