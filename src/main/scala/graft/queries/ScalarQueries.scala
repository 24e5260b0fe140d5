package graft.queries

import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function / predicate queries — SURVEY.md §2 DQ-04/05/06/07/11/16/
  * 17/21/22 (§2.2 P5-P8/P11/P13, §2.7 U2, §2.8 F2-F10), mapped onto the
  * shared test tables per FIXTURES.md §A.
  */
object ScalarQueries extends QueryModule {

  /** DQ-04 — ALT-text concat (P5, subscription.ts:284-288): search text is
    * base text + '\n' + alt text. */
  private val dq04 = QueryEntry(
    "dq04_alt_concat",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.part
        .withColumn("search_text", concat(col("p_brand"), lit("\n"), col("p_name")))
        .select(col("p_partkey"), col("search_text"))
        .orderBy(col("p_partkey"))
    },
    Some(
      """SELECT p_partkey, p_brand || chr(10) || p_name AS search_text
        |FROM part ORDER BY p_partkey""".stripMargin),
  )

  /** DQ-05 — nested-array presence/size filter (P6, subscription.ts:301-307):
    * image-count analog = word-array size threshold. */
  private val dq05 = QueryEntry(
    "dq05_array_size",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .withColumn("n_words", size(split(col("text"), " ")).cast("long"))
        .filter(col("n_words") >= 60)
        .select(col("doc_id"), col("n_words"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
        |FROM documents
        |WHERE len(string_split(text, ' ')) >= 60
        |ORDER BY doc_id""".stripMargin),
  )

  /** DQ-06 — label filter via document field access (P7/F8,
    * subscription.ts:309-312): extract a field from the JSON-ish props
    * payload, predicate on it. */
  private val dq06 = QueryEntry(
    "dq06_label_filter",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("int"))
        .filter(col("k") < 10)
        .select(col("event_id"), col("k"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT event_id, CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k
        |FROM events
        |WHERE CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) < 10
        |ORDER BY event_id""".stripMargin),
  )

  /** DQ-07 — null-presence filter (P8, subscription.ts:314-317): reply
    * filter analog via nullif + IS NOT NULL. */
  private val dq07 = QueryEntry(
    "dq07_reply_filter",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .withColumn("et", expr("nullif(event_type, 'error')"))
        .filter(col("et").isNotNull)
        .select(col("event_id"), col("et"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT event_id, nullif(event_type, 'error') AS et
        |FROM events
        |WHERE nullif(event_type, 'error') IS NOT NULL
        |ORDER BY event_id""".stripMargin),
  )

  /** DQ-11 — input-validation predicates (P13, databaseUtil.ts:17-75):
    * shape-check via anchored regex + null-safe numeric extraction. */
  private val dq11 = QueryEntry(
    "dq11_validation",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .withColumn("is_valid",
          when(col("props").rlike("^\\{\"k\": [0-9]+\\}$"), lit(1L)).otherwise(lit(0L)))
        .withColumn("value_int", floor(col("value")).cast("long"))
        .select(col("event_id"), col("is_valid"), col("value_int"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT event_id,
        |  CASE WHEN regexp_matches(props, '^\{"k": [0-9]+\}$') THEN 1 ELSE 0 END AS is_valid,
        |  CAST(FLOOR(value) AS BIGINT) AS value_int
        |FROM events ORDER BY event_id""".stripMargin),
  )

  /** DQ-16 — comma-split allowlist membership (P11, starrysky.ts:26-40). */
  private val dq16 = QueryEntry(
    "dq16_allowlist",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.region
        .filter(array_contains(split(lit("ASIA,EUROPE"), ","), col("r_name")))
        .select(col("r_regionkey"), col("r_name"))
        .orderBy(col("r_regionkey"))
    },
    Some(
      """SELECT r_regionkey, r_name FROM region
        |WHERE list_contains(string_split('ASIA,EUROPE', ','), r_name)
        |ORDER BY r_regionkey""".stripMargin),
  )

  /** DQ-17 — array-overlap test (A5, subscription.ts:414-416):
    * set-intersection size between the doc's word set and a fixed set. */
  private val dq17 = QueryEntry(
    "dq17_array_overlap",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .withColumn("n_overlap",
          size(array_intersect(
            array_distinct(split(col("text"), " ")),
            array(lit("spark"), lit("vector"), lit("hash")))).cast("long"))
        .filter(col("n_overlap") > 0)
        .select(col("doc_id"), col("n_overlap"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, n_overlap FROM (
        |  SELECT doc_id,
        |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |                            ['spark','vector','hash'])) AS BIGINT) AS n_overlap
        |  FROM documents)
        |WHERE n_overlap > 0 ORDER BY doc_id""".stripMargin),
  )

  /** DQ-21 — defaulting via coalesce/nullif (F6, subscription.ts:73-92). */
  private val dq21 = QueryEntry(
    "dq21_defaults",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.events
        .withColumn("et", coalesce(expr("nullif(event_type, 'view')"), lit("unknown")))
        .withColumn("v", coalesce(col("value"), lit(0.0)))
        .select(col("event_id"), col("et"), col("v"))
        .orderBy(col("event_id"))
    },
    Some(
      """SELECT event_id,
        |  coalesce(nullif(event_type, 'view'), 'unknown') AS et,
        |  coalesce(value, 0.0) AS v
        |FROM events ORDER BY event_id""".stripMargin),
  )

  /** DQ-22 — AT-URI construction + rkey extraction (F10,
    * util/subscription.ts:86-87, methods/feed-generation.ts:9,33). */
  private val dq22 = QueryEntry(
    "dq22_uri_ops",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .withColumn("uri",
          concat(lit("at://did:plc:"), col("source"), lit("/app.bsky.feed.post/"),
            col("doc_id").cast("string")))
        .withColumn("rkey", regexp_extract(col("uri"), "([^/]+)$", 1))
        .select(col("doc_id"), col("uri"), col("rkey"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, uri, regexp_extract(uri, '([^/]+)$', 1) AS rkey FROM (
        |  SELECT doc_id,
        |    'at://did:plc:' || source || '/app.bsky.feed.post/' || CAST(doc_id AS VARCHAR) AS uri
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin),
  )

  override def entries: Seq[QueryEntry] =
    Seq(dq04, dq05, dq06, dq07, dq11, dq16, dq17, dq21, dq22)
}
