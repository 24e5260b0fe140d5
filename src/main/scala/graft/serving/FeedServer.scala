package graft.serving

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.model.{Condition, ConditionRaw, ControlPlane}
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
  * With an [[FeedServer.Admin]] attached, the reference's admin CRUD trio
  * (/root/reference/src/databaseUtil.ts:9-192) is exposed too:
  *
  *   - `POST /setQuery` — validate (reference order and result codes),
  *     then full-replace upsert: delete + insert with `recordCount` reset
  *     to 0 while the key's POSTS ARE RETAINED (the databaseUtil.ts:77-108
  *     quirk, kept on purpose)
  *   - `POST /getQuery` — the stored row in wire shape (string booleans,
  *     comma-joined lists) + `recordCount` + `queryEngineVersion`;
  *     `result: NOT_FOUND` for unknown keys (still HTTP 200, like the
  *     reference)
  *   - `POST /deleteCondition` — drop the condition AND its posts
  *     (deletes from both tables, databaseUtil.ts:169-192)
  *
  * Admin auth is the reference's shared-secret header
  * `x-starrtsky-webpasskey` (typo included — wire compatibility) checked
  * against `Admin.passkey`; `None` disables the check exactly like an
  * unset `EDIT_WEB_PASSKEY`. One deviation: the reference's
  * deleteCondition writes a second response body after the 401 (a latent
  * double-respond bug) — here a failed check replies 401 once.
  *
  * Built on the JDK's HttpServer — zero new dependencies. One server
  * thread pool fronts the Spark session; each request runs one serving
  * query (partition-pruned scan + bounded-heap top-k). At scale this tier
  * is N stateless replicas over the same store table; everything
  * stateful lives in the store and the conditions, exactly like the
  * reference's express app over sqlite.
  */
final class FeedServer(spark: SparkSession, store: () => DataFrame,
    conditions: () => Seq[Condition], cfg: FeedServer.Config,
    admin: Option[FeedServer.Admin] = None,
    headCache: Option[FeedHeadCache] = None) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    // TCP_NODELAY on the server's sockets: the JDK HttpServer writes
    // headers and body as separate segments, and with Nagle on (the
    // default) the body write stalls behind the peer's delayed ACK —
    // a flat ~40 ms added to EVERY response, which dwarfed the actual
    // page cost once the head cache removed the per-request Spark
    // action (ServeSmoke at width: p50 112 ms → 70.7 with this flag →
    // 4.8 with flag + head cache; the in-process head hit is ~4 µs).
    // ServerConfig reads the property once in a
    // static initializer, so set it before the first create(); if
    // another HttpServer loaded the class earlier this is a no-op and
    // the deployment must pass -Dsun.net.httpserver.nodelay=true.
    if (System.getProperty("sun.net.httpserver.nodelay") == null)
      System.setProperty("sun.net.httpserver.nodelay", "true")
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    // ...and verify it TOOK: the set above is a silent no-op if any
    // HttpServer class loaded earlier in this JVM (the static init
    // already froze noDelay=false), leaving the stall with no signal.
    FeedServer.verifyNoDelay()
    server.createContext("/xrpc/app.bsky.feed.getFeedSkeleton", exchange =>
      handle(exchange)(getFeedSkeleton))
    server.createContext("/xrpc/app.bsky.feed.describeFeedGenerator", exchange =>
      handle(exchange)(_ => describe()))
    server.createContext("/.well-known/did.json", exchange =>
      handle(exchange)(_ => wellKnown()))
    admin.foreach { a =>
      server.createContext("/setQuery", exchange =>
        handle(exchange)(ex => adminGate(ex, a)(setQuery(_, a))))
      server.createContext("/getQuery", exchange =>
        handle(exchange)(ex => adminGate(ex, a)(getQuery(_, a))))
      server.createContext("/deleteCondition", exchange =>
        handle(exchange)(ex => adminGate(ex, a)(deleteCondition(_, a))))
    }
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) {
    val ex = server.getExecutor
    server.stop(0)
    // the fixed pool from start() is non-daemon: leaking it keeps an
    // embedding JVM alive after stop()
    ex match {
      case es: java.util.concurrent.ExecutorService => es.shutdown()
      case _ => ()
    }
  }

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
    // lexicon range is 1..100 (default 50): a sub-1 limit must 400 here —
    // letting it reach the engine surfaced as a 500 AnalysisException from
    // df.limit(-1), or leaked TopKPerKey's internal require message,
    // depending on the engine flag. Over-limit keeps the documented clamp.
    val limit = params.get("limit").map(_.toInt).getOrElse(50) match {
      case n if n < 1 => throw new IllegalArgumentException(s"limit must be >= 1, got $n")
      case n => math.min(n, 100)
    }
    val cursor = params.get("cursor").filter(_.nonEmpty)

    // private feeds authenticate; public feeds stay anonymous
    val requesterDid =
      if (c.privateFeed.nonEmpty)
        Some(Auth.validateAuth(
          Option(exchange.getRequestHeaders.getFirst("Authorization")),
          cfg.serviceDid, cfg.keyResolver, cfg.verifier))
      else None

    // ONE Spark action per request (rows + cursor from one collect) —
    // the two-action pageWithCursor path measured ~2× the request wall.
    // With a head cache wired in, in-head pages take ZERO Spark actions
    // (the per-request Catalyst planning floor was the residual cost)
    val (page, nextCursor) = headCache match {
      case Some(hc) => hc.page(c, limit, cursor, requesterDid)
      case None => FeedPage.pageCollected(spark, store(), c, limit, cursor, requesterDid)
    }
    val body = mapper.createObjectNode()
    nextCursor.foreach(body.put("cursor", _))
    val feed = body.putArray("feed")
    page.sortBy(_._1).foreach { case (_, post) =>
      feed.addObject().put("post", post)
    }
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

  // ---- admin CRUD (databaseUtil.ts:9-192) ----

  /** Shared-secret gate: header `x-starrtsky-webpasskey` vs the configured
    * passkey; a `None` passkey disables the check like an unset
    * EDIT_WEB_PASSKEY (databaseUtil.ts:13-15). */
  private def adminGate(exchange: HttpExchange, a: FeedServer.Admin)
      (f: JsonNode => Reply): Reply =
    a.passkey match {
      case Some(expected)
        if Option(exchange.getRequestHeaders.getFirst("x-starrtsky-webpasskey"))
          // constant-time compare: String.equals short-circuits at the
          // first mismatch, a byte-position timing oracle on the secret
          .forall(got => !java.security.MessageDigest.isEqual(
            got.getBytes(StandardCharsets.UTF_8), expected.getBytes(StandardCharsets.UTF_8))) =>
        error(401, "Unauthorized", "invalid web passkey")
      case _ =>
        // malformed JSON is a client error, not a 500 — the reference's
        // express.json layer rejects it before the handler runs
        val parsed =
          try mapper.readTree(new String(
            exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
          catch { case e: com.fasterxml.jackson.core.JsonProcessingException =>
            return error(400, "InvalidRequest", s"malformed JSON body: ${e.getOriginalMessage}")
          }
        f(parsed)
    }

  private def text(body: JsonNode, field: String): Option[String] =
    Option(body.get(field)).filterNot(_.isNull).map(_.asText())

  /** `result`-coded 500, the reference's validation-failure shape. */
  private def resultError(code: String, message: String): Reply = {
    val n = mapper.createObjectNode()
    n.put("result", code)
    n.put("message", message)
    Reply(500, n)
  }

  private def compiles(p: String): Boolean =
    scala.util.Try(java.util.regex.Pattern.compile(
      p, java.util.regex.Pattern.CASE_INSENSITIVE)).isSuccess

  /** JS `Number(x)` for the count fields, NaN modeled as None (the
    * reference gates with `isNaN(Number(x))` — databaseUtil.ts:49): empty
    * string is 0; the JS numeric grammar parses (decimal with exponent,
    * 0x/0o/0b integers, signed Infinity); everything else — INCLUDING the
    * literal "NaN" and Java-only syntaxes like "5d" or "0x1p3" that a bare
    * `toDoubleOption` wrongly admits — is NaN → validation error. */
  private def jsNumber(v: Option[String]): Option[Double] = v match {
    case None => None
    case Some(s0) =>
      val s = s0.trim
      if (s.isEmpty) Some(0d)
      else if (s.matches("[+-]?Infinity"))
        Some(if (s.startsWith("-")) Double.NegativeInfinity else Double.PositiveInfinity)
      else if (s.matches("0[xX][0-9A-Fa-f]+")) Some(BigInt(s.drop(2), 16).toDouble)
      else if (s.matches("0[oO][0-7]+")) Some(BigInt(s.drop(2), 8).toDouble)
      else if (s.matches("0[bB][01]+")) Some(BigInt(s.drop(2), 2).toDouble)
      else if (s.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?")) s.toDoubleOption
      else None
  }

  /** Full-replace upsert with reference-ordered validation and result
    * codes (databaseUtil.ts:17-108). */
  private def setQuery(body: JsonNode, a: FeedServer.Admin): Reply = {
    val key = text(body, "key").filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException("missing key"))
    val inputRegex = text(body, "inputRegex").getOrElse("")
    val invertRegex = text(body, "invertRegex").getOrElse("")
    val recordName = text(body, "recordName").getOrElse("")
    val refresh = text(body, "refresh").getOrElse("")
    val profileMatch = text(body, "profileMatch").filter(_.nonEmpty)

    if (!compiles(inputRegex))
      return resultError("INPUT_REGEX_ERROR", "inputRegex error. Please input valid regex.")
    if (!compiles(invertRegex))
      return resultError("INVERT_REGEX_ERROR", "invertRegex error. Please input valid regex.")
    // r19 dialect fence (Condition.javaOnlyConstruct): constructs that
    // compile under Java but can never mean the same on the reference's
    // non-'u' JS wire — possessive quantifiers (a JS SyntaxError, so the
    // reference itself would answer this code) and \p/\P/\Q/\E (literal-
    // letter identity escapes there). Same result codes the reference
    // uses for an uncompilable regex, with the construct named.
    Condition.javaOnlyConstruct(inputRegex) match {
      case Some(err) =>
        return resultError("INPUT_REGEX_ERROR", s"inputRegex error. $err")
      case None => ()
    }
    Condition.javaOnlyConstruct(invertRegex) match {
      case Some(err) =>
        return resultError("INVERT_REGEX_ERROR", s"invertRegex error. $err")
      case None => ()
    }
    if (!recordName.matches("^[a-z0-9-]{1,15}$"))
      return resultError("RECORDNAME_NOTALPHA", "RecordName should be 15 digit lowercase alphabets.")
    if (!refresh.matches("^-?\\d+$"))
      return resultError("NOT_NUMBER_REFRESH", "Refresh should be an integer.")
    // missing ≡ Number(undefined) = NaN on the reference side → error
    val initPost = jsNumber(text(body, "initPost"))
    if (initPost.isEmpty)
      return resultError("NOT_NUMBER_INITPOST", "Initial post count should be number.")
    val limitCount = jsNumber(text(body, "limitCount"))
    if (limitCount.isEmpty)
      return resultError("NOT_NUMBER_LIMITCOUNT", "Limit post count should be number.")
    if (profileMatch.exists { pm =>
        val parts = pm.split("::", 2)
        // JS: new RegExp(undefined) compiles, so a missing half never fails
        !parts.forall(compiles)
      })
      return resultError("PROFILE_MATCH_REGEX_ERROR", "profileMatch error. Please input valid regex.")
    // both halves compile with 'i' on the reference too
    // (databaseUtil.ts:66-69) — same dialect fence as input/invert
    profileMatch.flatMap(_.split("::", 2).toSeq
        .flatMap(Condition.javaOnlyConstruct).headOption) match {
      case Some(err) =>
        return resultError("PROFILE_MATCH_REGEX_ERROR", s"profileMatch error. $err")
      case None => ()
    }

    val raw = ConditionRaw(
      key = key,
      recordName = recordName,
      query = text(body, "query").getOrElse(""),
      inputRegex = inputRegex,
      invertRegex = Some(invertRegex),
      // saturating parse: the regex admits any digit count, and the
      // reference's Number() accepts magnitudes toInt would throw on
      refresh = Some(BigInt(refresh).min(Int.MaxValue).max(Int.MinValue).toInt),
      lang = text(body, "lang"),
      labelDisable = text(body, "labelDisable"),
      replyDisable = text(body, "replyDisable"),
      imageOnly = text(body, "imageOnly"),
      includeAltText = text(body, "includeAltText"),
      initPost = initPost.map(_.toInt),
      pinnedPost = text(body, "pinnedPost"),
      limitCount = limitCount.map(_.toInt),
      privateFeed = text(body, "privateFeed"),
      profileMatch = profileMatch)
    a.control.setQuery(Condition.normalize(raw))
    a.control.setMeta(key, Seq("feedName", "feedAvatar", "feedDescription")
      .flatMap(f => text(body, f).map(f -> _)).toMap)

    val n = mapper.createObjectNode()
    n.put("result", "OK")
    n.put("message", "update succeeded")
    Reply(200, n)
  }

  /** Stored row in wire shape + recordCount + engine version
    * (databaseUtil.ts:115-166). Unknown key is `result: NOT_FOUND` at
    * HTTP 200 — the reference replies res.json without a status. */
  private def getQuery(body: JsonNode, a: FeedServer.Admin): Reply = {
    val key = text(body, "key").getOrElse("")
    val n = mapper.createObjectNode()
    a.control.get(key) match {
      case None =>
        n.put("result", "NOT_FOUND")
        n.put("message", s"Specified key not found. $key")
        n.put("queryEngineVersion", FeedServer.EngineVersion)
      case Some(c) =>
        val meta = a.control.meta(key)
        n.put("result", "OK")
        n.put("key", c.key)
        n.put("recordName", c.recordName)
        n.put("query", c.query)
        n.put("inputRegex", c.inputRegex)
        n.put("invertRegex", c.invertRegex)
        n.put("refresh", c.refresh)
        n.put("lang", c.lang.getOrElse(""))
        n.put("labelDisable", c.labelDisable.toString) // wire string-bools
        n.put("replyDisable", c.replyDisable.toString)
        n.put("imageOnly", c.imageOnly)
        n.put("includeAltText", c.includeAltText.toString)
        n.put("initPost", c.initPost)
        n.put("pinnedPost", c.pinnedPost.mkString(","))
        a.control.lastExecTime(key) match { // null until a cycle timed it
          case Some(t) => n.put("lastExecTime", t)
          case None => n.putNull("lastExecTime")
        }
        n.put("feedAvatar", meta.getOrElse("feedAvatar", ""))
        n.put("feedName", meta.getOrElse("feedName", ""))
        n.put("feedDescription", meta.getOrElse("feedDescription", ""))
        n.put("privateFeed", c.privateFeed.mkString(","))
        n.put("limitCount", c.limitCount)
        n.put("recordCount", a.control.recordCount(key))
        n.put("profileMatch",
          c.profileMatch.map(p => s"${p.textTerm}::${p.profileRegex}").getOrElse(""))
        n.put("queryEngineVersion", FeedServer.EngineVersion)
    }
    Reply(200, n)
  }

  /** Drop the condition AND the key's posts (databaseUtil.ts:169-192). */
  private def deleteCondition(body: JsonNode, a: FeedServer.Admin): Reply = {
    val key = text(body, "key").getOrElse("")
    a.control.delete(key)
    a.deletePosts(key)
    val n = mapper.createObjectNode()
    n.put("result", "OK")
    Reply(200, n)
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

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[FeedServer])

  /** What `sun.net.httpserver.ServerConfig` actually latched for
    * noDelay, read reflectively — `None` when the jdk.httpserver
    * internals aren't opened to us (the default outside our own test
    * JVMs, which pass `--add-opens jdk.httpserver/sun.net.httpserver`).
    * Package-visible for FeedServerSpec. */
  private[serving] def noDelayStatus(): Option[Boolean] =
    try {
      val m = Class.forName("sun.net.httpserver.ServerConfig")
        .getDeclaredMethod("noDelay")
      m.setAccessible(true)
      Some(m.invoke(null).asInstanceOf[Boolean])
    } catch { case scala.util.control.NonFatal(_) => None }

  /** start() sets `sun.net.httpserver.nodelay`, but ServerConfig reads
    * it ONCE in a static initializer — if another HttpServer class
    * loaded first, the set is silently ineffective and every response
    * pays the ~40 ms Nagle stall (headers and body are two TCP
    * segments; the body write stalls behind the peer's delayed ACK).
    * Surface that instead of leaving deployments to rediscover it with
    * a profiler. */
  private def verifyNoDelay(): Unit = noDelayStatus() match {
    case Some(false) => log.warn(
      "sun.net.httpserver.nodelay was set too late — ServerConfig's " +
      "static initializer already ran without it, so every response " +
      "pays a ~40 ms Nagle stall; pass -Dsun.net.httpserver.nodelay=true " +
      "on the JVM command line")
    case None => log.info(
      "could not verify sun.net.httpserver.nodelay took effect " +
      "(jdk.httpserver internals not opened to reflection); if feed " +
      "responses stall ~40 ms, pass -Dsun.net.httpserver.nodelay=true " +
      "at JVM start")
    case Some(true) => ()
  }

  /** Reported as `queryEngineVersion` by getQuery, the analog of the
    * reference's package.json version (subscription.ts:9-11). */
  val EngineVersion = "0.1.0"

  final case class Config(
      serviceDid: String,
      hostname: String,
      publisherDid: String,
      keyResolver: Auth.KeyResolver = Auth.StaticKeyResolver(Map.empty),
      // DefaultVerifier BY DEFAULT: wiring a DidResolver (which returns
      // PUBLIC point bytes) while the default verifier is HS256-only was
      // the alg-confusion forgery footgun its own scaladoc warns about —
      // the safe dispatch-on-key-shape verifier must not be opt-in
      verifier: Auth.Verifier = Auth.DefaultVerifier)

  /** Admin wiring: the mutable control plane plus a hook that deletes a
    * key's posts from the store (the engine side of deleteCondition's
    * second DELETE). `passkey = None` leaves the endpoints open, matching
    * an unset EDIT_WEB_PASSKEY. */
  final case class Admin(
      control: ControlPlane,
      deletePosts: String => Unit,
      passkey: Option[String] = None)
}
