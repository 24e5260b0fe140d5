package graft.queries

import graft.model.Condition
import graft.operators.FeedPage
import graft.streaming.Ingest
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship end-to-end slice (SURVEY.md §7.2 M1): documents become
  * PostView-shaped wire rows, one standing condition runs the full filter
  * cascade through the ingest upsert, and the serving plane answers page 1
  * with ordinals. The oracle states the equivalent relational pipeline.
  */
object PipelineQueries extends QueryModule {

  /** documents → PostView wire shape: synthetic event times (doc_id
    * minutes past 2024-01-01), md5 cid, nested nulls typed to the lexicon
    * schema. */
  def postViews(spark: SparkSession, dir: String): DataFrame = {
    val replyT = "struct<root:struct<uri:string,cid:string>,parent:struct<uri:string,cid:string>>"
    val embedT = "struct<images:array<struct<alt:string,aspectRatio:struct<width:int,height:int>,fullsize:string,thumb:string>>>"
    val labelsT = "array<struct<src:string,uri:string,val:string,cts:string>>"
    Tables(spark, dir).documents.select(
      concat(lit("at://did:plc:"), col("source"), lit("/app.bsky.feed.post/"),
        col("doc_id").cast("string")).as("uri"),
      md5(col("text")).as("cid"),
      struct(
        col("source").as("did"),
        lit(null).cast("string").as("displayName"),
        lit(null).cast("string").as("description")).as("author"),
      struct(
        col("text").as("text"),
        date_format(
          expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,cast(doc_id as int),0)"),
          "yyyy-MM-dd HH:mm:ss").as("createdAt"),
        array(col("lang")).as("langs"),
        lit(null).cast(replyT).as("reply"),
        lit(null).cast(embedT).as("embed")).as("record"),
      lit(null).cast(labelsT).as("labels"))
  }

  def feedCondition: Condition = Condition(
    key = "flagship", recordName = "flagship", query = "spark",
    inputRegex = "spark|vector", invertRegex = "", refresh = 0, lang = None,
    labelDisable = false, replyDisable = false, imageOnly = "",
    includeAltText = false, initPost = 100, limitCount = 2000,
    pinnedPost = Nil, privateFeed = Nil, profileMatch = None)

  /** Full pipeline: wire rows → cascade fan-out → dedup upsert → page 1. */
  def firstPage(spark: SparkSession, dir: String, limit: Int = 50): DataFrame = {
    val store = Ingest.processBatch(
      spark, Ingest.emptyStore(spark), postViews(spark, dir),
      Seq(feedCondition), profiles = None)
    FeedPage.page(spark, store, feedCondition, limit, cursor = None)
  }

  private val ns15 = QueryEntry(
    "ns15_feed_pipeline",
    (spark, dir) => firstPage(spark, dir, 50),
    Some(
      """WITH posts AS (
        |  SELECT 'at://did:plc:' || source || '/app.bsky.feed.post/' || CAST(doc_id AS VARCHAR) AS uri,
        |    md5(text) AS cid,
        |    epoch_us(TIMESTAMP '2024-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE) AS ts_us
        |  FROM documents
        |  WHERE len(regexp_extract_all(text, '(?i)(spark|vector)')) > 0)
        |SELECT CAST(rn - 1 AS BIGINT) AS ord, uri AS post FROM (
        |  SELECT uri, row_number() OVER (ORDER BY ts_us DESC, cid DESC) AS rn FROM posts)
        |WHERE rn <= 50 ORDER BY ord""".stripMargin),
    headline = true,
  )

  override def entries: Seq[QueryEntry] = Seq(ns15)
}
