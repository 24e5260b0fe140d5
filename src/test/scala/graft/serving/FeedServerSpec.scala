package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import graft.SparkSpec
import graft.domain.Fixtures
import graft.streaming.Ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** Drives the real HTTP surface end-to-end: JDK HttpClient against the
  * running [[FeedServer]], store seeded through the actual ingest path. */
class FeedServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private val secret = "spec-shared-secret".getBytes("UTF-8")
  private val cfg = FeedServer.Config(
    serviceDid = "did:web:feeds.example.com",
    hostname = "feeds.example.com",
    publisherDid = "did:plc:publisher",
    keyResolver = Auth.StaticKeyResolver(Map("did:plc:alice" -> secret)))

  private def get(port: Int, path: String, auth: Option[String] = None)
      : (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET()
    auth.foreach(t => b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def feedUri(recordName: String) =
    s"at://${cfg.publisherDid}/app.bsky.feed.generator/$recordName"

  private def withServer(conditions: Seq[graft.model.Condition])
      (body: Int => Unit): Unit = {
    val s = spark
    import s.implicits._
    val store = Ingest.processBatch(spark, Ingest.emptyStore(spark),
      Fixtures.posts.toDF(), conditions, Some(Fixtures.profiles.toDF()))
      .cache()
    val server = new FeedServer(spark, () => store, () => conditions, cfg)
    val port = server.start()
    try body(port) finally server.stop()
  }

  test("getFeedSkeleton serves pages with cursors over HTTP; unknown feed is 400") {
    val conditions = Seq(Fixtures.cond(key = "f1"))
    withServer(conditions) { port =>
      val (st1, p1) = get(port, s"/xrpc/app.bsky.feed.getFeedSkeleton?feed=${feedUri("f1")}&limit=2")
      assert(st1 == 200, p1.toString)
      assert(p1.get("feed").size() == 2)
      assert(p1.get("feed").get(0).get("post").asText().startsWith("at://"))
      val cursor = p1.get("cursor").asText()
      assert(cursor.contains("::"))

      // cursor walk: no overlap with page 1
      val enc = java.net.URLEncoder.encode(cursor, "UTF-8")
      val (st2, p2) = get(port,
        s"/xrpc/app.bsky.feed.getFeedSkeleton?feed=${feedUri("f1")}&limit=50&cursor=$enc")
      assert(st2 == 200, p2.toString)
      val page1 = (0 until p1.get("feed").size()).map(p1.get("feed").get(_).get("post").asText()).toSet
      val page2 = (0 until p2.get("feed").size()).map(p2.get("feed").get(_).get("post").asText()).toSet
      assert(page1.intersect(page2).isEmpty)

      val (st3, e3) = get(port, s"/xrpc/app.bsky.feed.getFeedSkeleton?feed=${feedUri("nope")}")
      assert(st3 == 400 && e3.get("error").asText() == "UnsupportedAlgorithm")

      val (st4, e4) = get(port,
        s"/xrpc/app.bsky.feed.getFeedSkeleton?feed=${feedUri("f1")}&cursor=garbage")
      assert(st4 == 400 && e4.get("error").asText() == "InvalidRequest", e4.toString)
    }
  }

  test("private feeds gate on a verified service JWT (auth.ts semantics)") {
    val conditions = Seq(Fixtures.cond(key = "p1", privateFeed = Seq("did:plc:alice")))
    withServer(conditions) { port =>
      val path = s"/xrpc/app.bsky.feed.getFeedSkeleton?feed=${feedUri("p1")}"
      // no token → 401 AuthRequired
      val (st1, e1) = get(port, path)
      assert(st1 == 401 && e1.get("error").asText() == "AuthRequired")
      // valid token for an allowlisted DID → page served
      val good = Auth.signHs256("did:plc:alice", cfg.serviceDid,
        System.currentTimeMillis() / 1000 + 600, secret)
      val (st2, p2) = get(port, path, Some(good))
      assert(st2 == 200 && p2.get("feed").size() > 0, p2.toString)
      // tampered signature → 401
      val (st3, _) = get(port, path, Some(good.dropRight(2) + "xx"))
      assert(st3 == 401)
      // expired token → 401
      val expired = Auth.signHs256("did:plc:alice", cfg.serviceDid,
        System.currentTimeMillis() / 1000 - 10, secret)
      assert(get(port, path, Some(expired))._1 == 401)
      // wrong audience → 401
      val wrongAud = Auth.signHs256("did:plc:alice", "did:web:other",
        System.currentTimeMillis() / 1000 + 600, secret)
      assert(get(port, path, Some(wrongAud))._1 == 401)
      // verified but NOT allowlisted DID → empty feed (the gate, not auth)
      val eve = Auth.signHs256("did:plc:eve", cfg.serviceDid,
        System.currentTimeMillis() / 1000 + 600, secret)
      // eve's key is unresolvable → still 401 (resolver is the identity source)
      assert(get(port, path, Some(eve))._1 == 401)
    }
  }

  test("describeFeedGenerator and /.well-known/did.json match the reference shapes") {
    val conditions = Seq(Fixtures.cond(key = "f1"), Fixtures.cond(key = "f2"))
    withServer(conditions) { port =>
      val (st1, d) = get(port, "/xrpc/app.bsky.feed.describeFeedGenerator")
      assert(st1 == 200 && d.get("did").asText() == cfg.serviceDid)
      val uris = (0 until d.get("feeds").size()).map(d.get("feeds").get(_).get("uri").asText())
      assert(uris.toSet == Set(feedUri("f1"), feedUri("f2")))

      val (st2, w) = get(port, "/.well-known/did.json")
      assert(st2 == 200 && w.get("id").asText() == cfg.serviceDid)
      assert(w.get("service").get(0).get("type").asText() == "BskyFeedGenerator")
      assert(w.get("service").get(0).get("serviceEndpoint").asText() ==
        s"https://${cfg.hostname}")
    }
  }

  test("well-known 404s when the service DID does not match the hostname (well-known.ts:8-10)") {
    val other = cfg.copy(serviceDid = "did:web:elsewhere.example.org")
    val server = new FeedServer(spark, () => Ingest.emptyStore(spark), () => Nil, other)
    val port = server.start()
    try assert(get(port, "/.well-known/did.json")._1 == 404)
    finally server.stop()
  }
}
