package graft.model

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import scala.jdk.CollectionConverters._
import scala.util.Try

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Conditions control-plane I/O (S6/S12 — /root/reference/src/
  * subscription.ts:58-112, databaseUtil.ts:9-113): restore standing
  * queries from a JSON config OR a remote Admin Console, validate at the
  * boundary, default missing fields, and merge insert-on-conflict-ignore
  * against the running set.
  */
object ConditionStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  val rawSchema = Encoders.product[ConditionRaw].schema

  /** Validate with a SIGNAL on drop: the reference rejects invalid rows
    * at its CRUD boundary with a 4xx the admin sees, but the load/
    * restore paths have no requester to answer — and since r19 the
    * dialect fence can newly invalidate a PREVIOUSLY-STORED pattern
    * (possessive quantifiers, `\p`, `\Q` were formerly accepted with
    * Java-only semantics), so a feed silently vanishing on restart
    * would be undiagnosable. One pointed WARN per dropped row. */
  private def validateLogged(r: ConditionRaw): Option[ConditionRaw] =
    Condition.validate(r) match {
      case Right(ok) => Some(ok)
      case Left(err) =>
        log.warn(s"dropping stored condition '${r.key}' " +
          s"(recordName '${r.recordName}'): $err — the feed will not " +
          "serve until the pattern is fixed via setQuery")
        None
    }

  /** Load + validate + normalize; invalid rows are dropped (the reference
    * rejects them at the CRUD boundary with a 4xx) — each drop WARNs. */
  def load(spark: SparkSession, path: String): Seq[Condition] = {
    import spark.implicits._
    spark.read.schema(rawSchema).json(path)
      .as[ConditionRaw].collect().toSeq // control plane: few rows by design
      .flatMap(validateLogged)
      .map(Condition.normalize)
  }

  private val mapper = new ObjectMapper()

  /** Remote Admin-Console restore — the transport half of S6
    * (/root/reference/src/subscription.ts:58-112): POST
    * `{"serverUrl": <serverUrl>}` to `{consoleUrl}/api/getD1Query`, and
    * if the body answers `{"result":"OK","resultRecord":[…]}` run every
    * record through the SAME validate/normalize gate as the file path
    * (invalid rows dropped, defaults applied). An unreachable console, a
    * non-2xx status, a non-OK result, or malformed JSON restores nothing
    * — the reference logs the error and continues with local state, and
    * so do we (the caller merges `Nil`).
    */
  def restoreRemote(consoleUrl: String, serverUrl: String,
      timeoutMs: Long = 10000): Seq[Condition] =
    restoreRemoteWithMeta(consoleUrl, serverUrl, timeoutMs)._1

  /** [[restoreRemote]] plus each restored row's display passthrough
    * fields (feedName/feedAvatar/feedDescription — the reference's insert
    * carries them, subscription.ts:86-88, and getQuery reports them), so
    * a deployment can seed its control plane's meta alongside the
    * conditions. */
  def restoreRemoteWithMeta(consoleUrl: String, serverUrl: String,
      timeoutMs: Long = 10000): (Seq[Condition], Map[String, Map[String, String]]) =
    Try {
      val client = HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(timeoutMs)).build()
      val req = HttpRequest.newBuilder(
          URI.create(consoleUrl.stripSuffix("/") + "/api/getD1Query"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(
          mapper.writeValueAsString(
            mapper.createObjectNode().put("serverUrl", serverUrl)),
          StandardCharsets.UTF_8))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2) (Nil, Map.empty[String, Map[String, String]])
      else {
        val root = mapper.readTree(resp.body())
        if (root == null || !root.path("result").asText("").equals("OK"))
          (Nil, Map.empty[String, Map[String, String]])
        else {
          val nodes = root.path("resultRecord").elements().asScala.toSeq
          val conds = nodes.map(rawFromNode)
            .flatMap(validateLogged)
            .map(Condition.normalize)
          val keys = conds.map(_.key).toSet
          val metas = nodes.flatMap { n =>
            val key = Option(n.path("key")).filterNot(_.isMissingNode).map(_.asText(""))
            key.filter(keys.contains).map { k =>
              k -> Seq("feedName", "feedAvatar", "feedDescription").flatMap { f =>
                val v = n.path(f)
                if (v.isMissingNode || v.isNull || v.asText("").isEmpty) None
                else Some(f -> v.asText())
              }.toMap
            }
          }.filter(_._2.nonEmpty).toMap
          (conds, metas)
        }
      }
    }.getOrElse((Nil, Map.empty[String, Map[String, String]]))

  /** One console record → the wire form, with the reference's `|| ''` /
    * `|| 0` coalescing (subscription.ts:73-92). D1 may hand numbers back
    * as strings, so ints parse from either shape. */
  private[model] def rawFromNode(n: JsonNode): ConditionRaw = {
    def str(f: String): Option[String] = {
      val v = n.path(f)
      if (v.isMissingNode || v.isNull) None else Some(v.asText())
    }
    def int(f: String): Option[Int] = {
      val v = n.path(f)
      if (v.isMissingNode || v.isNull) None
      else if (v.isNumber) Some(v.asInt())
      else v.asText().toIntOption
    }
    ConditionRaw(
      key = str("key").getOrElse(""),
      recordName = str("recordName").getOrElse(""),
      query = str("query").getOrElse(""),
      inputRegex = str("inputRegex").getOrElse(""),
      invertRegex = str("invertRegex"),
      refresh = int("refresh"),
      lang = str("lang"),
      labelDisable = str("labelDisable"),
      replyDisable = str("replyDisable"),
      imageOnly = str("imageOnly"),
      includeAltText = str("includeAltText"),
      initPost = int("initPost"),
      pinnedPost = str("pinnedPost"),
      limitCount = int("limitCount"),
      privateFeed = str("privateFeed"),
      profileMatch = str("profileMatch"))
  }

  /** Insert-on-conflict-ignore by key: existing rows win (subscription.ts:
    * 95-99). */
  def mergeRestore(existing: Seq[Condition], restored: Seq[Condition]): Seq[Condition] = {
    val have = existing.map(_.key).toSet
    existing ++ restored.filterNot(c => have.contains(c.key))
  }

  /** Full-replace upsert for the CRUD path (delete+insert, databaseUtil.ts:
    * 77-108). */
  def setQuery(existing: Seq[Condition], c: Condition): Seq[Condition] =
    existing.filterNot(_.key == c.key) :+ c

  /** The conditions dimension as a DataFrame (broadcast on use). */
  def toDf(spark: SparkSession, cs: Seq[Condition]): DataFrame = {
    import spark.implicits._
    cs.toDF()
  }
}
