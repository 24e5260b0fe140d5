package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Firehose decode + op routing (/root/reference/src/util/subscription.ts:
  * 16-122, S2-S4): the wire's CBOR/CAR commit blocks arrive here as one
  * JSON document per repo op; schema-on-read `from_json` in PERMISSIVE mode
  * replaces lexicon runtime validation — invalid messages become null rows
  * and are skipped, mirroring the reference's catch-and-continue
  * (util/subscription.ts:24-33). Ops route by collection into typed
  * create/delete frames for posts / reposts / likes / follows.
  */
object Firehose {

  val Collections: Seq[String] = Seq(
    "app.bsky.feed.post", "app.bsky.feed.repost",
    "app.bsky.feed.like", "app.bsky.graph.follow")

  /** One decoded repo op (FIXTURES.md §B6). */
  val opSchema: StructType = StructType(Seq(
    StructField("seq", LongType),
    StructField("action", StringType),
    StructField("collection", StringType),
    StructField("uri", StringType),
    StructField("cid", StringType),
    StructField("author", StringType),
    StructField("record", StructType(Seq(
      StructField("text", StringType),
      StructField("createdAt", StringType),
      StructField("langs", ArrayType(StringType)),
      StructField("reply", StructType(Seq(
        StructField("root", StructType(Seq(
          StructField("uri", StringType), StructField("cid", StringType)))),
        StructField("parent", StructType(Seq(
          StructField("uri", StringType), StructField("cid", StringType))))))),
      StructField("embed", StructType(Seq(
        StructField("images", ArrayType(StructType(Seq(
          StructField("alt", StringType),
          StructField("aspectRatio", StructType(Seq(
            StructField("width", IntegerType), StructField("height", IntegerType)))),
          StructField("fullsize", StringType),
          StructField("thumb", StringType)))))))),
    ))),
  ))

  /** Decode raw JSON messages (column `value`); invalid/incomplete messages
    * are dropped (the type-guard skip, S4). */
  def decode(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), opSchema).as("m"))
      .select("m.*")
      .filter(col("seq").isNotNull && col("uri").isNotNull &&
        col("action").isin("create", "delete") &&
        col("collection").isin(Collections: _*))

  /** Route decoded ops: creates of one collection. */
  def creates(ops: DataFrame, collection: String): DataFrame =
    ops.filter(col("action") === "create" && col("collection") === collection)

  def deletes(ops: DataFrame, collection: String): DataFrame =
    ops.filter(col("action") === "delete" && col("collection") === collection)
      .select(col("uri"))

  /** Post creates as the PostView wire shape the filter cascade consumes
    * (labels are not carried on the firehose — null, treated unlabeled). */
  def postViews(ops: DataFrame): DataFrame =
    creates(ops, "app.bsky.feed.post").select(
      col("uri"),
      col("cid"),
      struct(
        col("author").as("did"),
        lit(null).cast("string").as("displayName"),
        lit(null).cast("string").as("description")).as("author"),
      col("record"),
      lit(null).cast("array<struct<src:string,uri:string,val:string,cts:string>>").as("labels"))

  /** The flat searchPosts source rows (graft-search) as PostView wire shape
    * — bridges the DSv2 source into the same ingest pipeline (S1 → §3.2). */
  def searchHitsAsPostViews(hits: DataFrame): DataFrame = {
    val replyT = "struct<root:struct<uri:string,cid:string>,parent:struct<uri:string,cid:string>>"
    val embedT = "struct<images:array<struct<alt:string,aspectRatio:struct<width:int,height:int>,fullsize:string,thumb:string>>>"
    hits.select(
      col("uri"),
      col("cid"),
      struct(col("did"),
        lit(null).cast("string").as("displayName"),
        lit(null).cast("string").as("description")).as("author"),
      struct(
        col("text"),
        date_format(col("createdAt"), "yyyy-MM-dd HH:mm:ss").as("createdAt"),
        array(col("lang")).as("langs"),
        lit(null).cast(replyT).as("reply"),
        lit(null).cast(embedT).as("embed")).as("record"),
      lit(null).cast("array<struct<src:string,uri:string,val:string,cts:string>>").as("labels"))
  }
}
