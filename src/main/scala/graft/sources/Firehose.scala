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

  /** REAL wire path: binary firehose frames (two concatenated CBOR items —
    * the `{op, t}` header and the commit body whose `blocks` field is a
    * CARv1 archive) → repo ops, mirroring `getOpsByType`
    * (/root/reference/src/util/subscription.ts:76-122): per op, `create`
    * looks its record block up in the CAR by CID and CBOR-decodes it,
    * `delete` carries only the uri, `update` is skipped, and a frame or op
    * that fails to parse is dropped — the reference's catch-and-continue
    * (subscription.ts:24-33, 41-46). Runs in `mapPartitions` (a byte codec
    * is per-row imperative work, same boundary as the multimodal codecs);
    * each decoded op becomes one JSON line feeding the SAME schema-on-read
    * [[decode]] the JSON stand-in uses, so both paths share one guard
    * surface. */
  def decodeCborFrames(raw: DataFrame, bytesCol: String = "frame"): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val jsons = raw.select(col(bytesCol)).as[Array[Byte]].mapPartitions { frames =>
      frames.flatMap { bytes =>
        try frameToOpJsons(bytes)
        catch { case _: Exception => Iterator.empty } // skipped invalid message
      }
    }.toDF("value")
    decode(jsons)
  }

  /** One binary frame → JSON op lines (empty for non-commit frames). */
  private[sources] def frameToOpJsons(frame: Array[Byte]): Iterator[String] = {
    import Cbor._
    val r = new Reader(frame)
    val header = r.decode() match { case m: CMap => m; case _ => return Iterator.empty }
    val isCommit = header.get("op").contains(CInt(1)) &&
      header.get("t").contains(CText("#commit"))
    if (!isCommit || r.remaining == 0) return Iterator.empty
    val body = r.decode() match { case m: CMap => m; case _ => return Iterator.empty }
    val seq = body.get("seq") match { case Some(CInt(s)) => s; case _ => return Iterator.empty }
    val repo = body.get("repo") match { case Some(CText(s)) => s; case _ => return Iterator.empty }
    val blocks = body.get("blocks") match {
      case Some(CBytes(b)) => readCar(b)
      case _ => Map.empty[String, Array[Byte]]
    }
    val ops = body.get("ops") match { case Some(CArr(xs)) => xs; case _ => Vector.empty }
    ops.iterator.flatMap {
      case op: CMap =>
        val action = op.get("action").collect { case CText(s) => s }
        val path = op.get("path").collect { case CText(s) => s }
        (action, path) match {
          case (Some("create"), Some(p)) =>
            val cidStr = op.get("cid").collect { case CTag(42, CBytes(b)) => cidToString(b.drop(1)) }
            for {
              cid <- cidStr // op without a cid: skipped (subscription.ts:93)
              recordBytes <- blocks.get(cid) // block missing from CAR: skipped (:95)
              record <- try Some(new Reader(recordBytes).decode())
                        catch { case _: Exception => None }
            } yield opJson(seq, "create", p, repo, Some(cid), Some(record))
          case (Some("delete"), Some(p)) =>
            Some(opJson(seq, "delete", p, repo, None, None))
          case _ => None // updates not supported yet (subscription.ts:90)
        }
      case _ => None
    }
  }

  private def opJson(seq: Long, action: String, path: String, repo: String,
      cid: Option[String], record: Option[Cbor.Value]): String = {
    val collection = path.split('/').head
    // path/repo/action/cid are WIRE-CONTROLLED strings: interpolating
    // them raw would let a hostile relay inject JSON fields (a quote in
    // `path` can forge a record/cid on a delete op — Jackson keeps the
    // last duplicate) or break the frame so PERMISSIVE from_json silently
    // nulls it. Quote through the same escaper record content uses.
    val q: String => String = Cbor.jsonQuote
    val fields = Seq(
      s""""seq":$seq""",
      s""""action":${q(action)}""",
      s""""collection":${q(collection)}""",
      s""""uri":${q(s"at://$repo/$path")}""",
      s""""author":${q(repo)}""") ++
      cid.map(c => s""""cid":${q(c)}""") ++
      record.map(rec => s""""record":${Cbor.toJson(rec)}""")
    fields.mkString("{", ",", "}")
  }

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
        // ISO-8601 with fractional seconds, like the firehose path passes
        // through verbatim: the former second-truncating format tied
        // millisecond-distinct posts, so the two ingest paths ranked
        // identical data differently (FilterCascade's indexedAt is
        // to_timestamp over this string)
        date_format(col("createdAt"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").as("createdAt"),
        array(col("lang")).as("langs"),
        lit(null).cast(replyT).as("reply"),
        lit(null).cast(embedT).as("embed")).as("record"),
      lit(null).cast("array<struct<src:string,uri:string,val:string,cts:string>>").as("labels"))
  }
}
