package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model.Condition
import graft.operators.FeedPage
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** The XRPC serving layer (/root/reference/src/server.ts:33-69 and the
  * src/methods handlers) over the Spark store — the HTTP shell around
  * [[FeedPage]]:
  *
  *   - `GET /xrpc/app.bsky.feed.getFeedSkeleton?feed=<at-uri>&limit&cursor`
  *     → `{feed: [{post}], cursor?}` (feed-generation.ts:8-39; algo
  *     dispatch by the at-uri's rkey, InvalidRequest for unknown feeds and
  *     malformed cursors, starrysky.ts:60-62)
  *   - `GET /xrpc/app.bsky.feed.describeFeedGenerator` → `{did, feeds}`
  *     (describe-generator.ts:5-27)
  *   - `GET /.well-known/did.json` → the did:web document, 404 unless the
  *     service DID matches the hostname (well-known.ts:7-22)
  *
  * Private feeds require a verified service JWT ([[Auth.validateAuth]]);
  * public feeds skip auth exactly like the reference's commented-out
  * example (feed-generation.ts:23-31 — auth only where user-specific).
  *
  * Built on the JDK's HttpServer — zero new dependencies. One server
  * thread pool fronts the Spark session; each request runs one serving
  * query (partition-pruned scan + bounded-heap top-k). At scale this tier
  * is N stateless replicas over the same store table; everything
  * stateful lives in the store and the conditions, exactly like the
  * reference's express app over sqlite.
  */
final class FeedServer(spark: SparkSession, store: () => DataFrame,
    conditions: () => Seq[Condition], cfg: FeedServer.Config) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/xrpc/app.bsky.feed.getFeedSkeleton", exchange =>
      handle(exchange)(getFeedSkeleton))
    server.createContext("/xrpc/app.bsky.feed.describeFeedGenerator", exchange =>
      handle(exchange)(_ => describe()))
    server.createContext("/.well-known/did.json", exchange =>
      handle(exchange)(_ => wellKnown()))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private final case class Reply(status: Int, body: ObjectNode)

  private def handle(exchange: HttpExchange)(f: HttpExchange => Reply): Unit = {
    val reply =
      try f(exchange)
      catch {
        case Auth.AuthError(status, code, msg) => error(status, code, msg)
        case e: IllegalArgumentException =>
          error(400, "InvalidRequest", Option(e.getMessage).getOrElse("bad request"))
        case e: Exception =>
          error(500, "InternalServerError", Option(e.getMessage).getOrElse("error"))
      }
    val bytes = mapper.writeValueAsBytes(reply.body)
    exchange.getResponseHeaders.set("Content-Type", "application/json")
    exchange.sendResponseHeaders(reply.status, bytes.length)
    exchange.getResponseBody.write(bytes)
    exchange.close()
  }

  private def error(status: Int, code: String, message: String): Reply = {
    val n = mapper.createObjectNode()
    n.put("error", code)
    n.put("message", message)
    Reply(status, n)
  }

  private def queryParams(exchange: HttpExchange): Map[String, String] =
    Option(exchange.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  /** at://did/app.bsky.feed.generator/rkey → (hostDid, collection, rkey). */
  private def parseAtUri(uri: String): (String, String, String) =
    uri.stripPrefix("at://").split('/') match {
      case Array(did, collection, rkey) => (did, collection, rkey)
      case _ => throw new IllegalArgumentException(s"malformed feed at-uri: $uri")
    }

  private def getFeedSkeleton(exchange: HttpExchange): Reply = {
    val params = queryParams(exchange)
    val feedUri = params.getOrElse("feed",
      throw new IllegalArgumentException("missing feed param"))
    val (hostDid, collection, rkey) = parseAtUri(feedUri)
    val condition = conditions().find(_.recordName == rkey)
    if (hostDid != cfg.publisherDid || collection != "app.bsky.feed.generator" ||
        condition.isEmpty)
      return error(400, "UnsupportedAlgorithm", "Unsupported algorithm")
    val c = condition.get
    val limit = math.min(params.get("limit").map(_.toInt).getOrElse(50), 100)
    val cursor = params.get("cursor").filter(_.nonEmpty)

    // private feeds authenticate; public feeds stay anonymous
    val requesterDid =
      if (c.privateFeed.nonEmpty)
        Some(Auth.validateAuth(
          Option(exchange.getRequestHeaders.getFirst("Authorization")),
          cfg.serviceDid, cfg.keyResolver, cfg.verifier))
      else None

    val (page, nextCursor) = FeedPage.pageWithCursor(
      spark, store(), c, limit, cursor, requesterDid)
    val body = mapper.createObjectNode()
    nextCursor.foreach(body.put("cursor", _))
    val feed = body.putArray("feed")
    page.orderBy(org.apache.spark.sql.functions.col("ord"))
      .select("post").collect()
      .foreach(r => feed.addObject().put("post", r.getString(0)))
    Reply(200, body)
  }

  private def describe(): Reply = {
    val body = mapper.createObjectNode()
    body.put("did", cfg.serviceDid)
    val feeds = body.putArray("feeds")
    FeedPage.describe(spark, conditions(), cfg.publisherDid)
      .collect().foreach(r => feeds.addObject().put("uri", r.getString(0)))
    Reply(200, body)
  }

  private def wellKnown(): Reply = {
    if (!cfg.serviceDid.endsWith(cfg.hostname))
      return error(404, "NotFound", "service DID does not match hostname")
    val body = mapper.createObjectNode()
    body.putArray("@context").add("https://www.w3.org/ns/did/v1")
    body.put("id", cfg.serviceDid)
    val svc = body.putArray("service").addObject()
    svc.put("id", "#bsky_fg")
    svc.put("type", "BskyFeedGenerator")
    svc.put("serviceEndpoint", s"https://${cfg.hostname}")
    Reply(200, body)
  }
}

object FeedServer {
  final case class Config(
      serviceDid: String,
      hostname: String,
      publisherDid: String,
      keyResolver: Auth.KeyResolver = Auth.StaticKeyResolver(Map.empty),
      verifier: Auth.Verifier = Auth.Hs256Verifier)
}
