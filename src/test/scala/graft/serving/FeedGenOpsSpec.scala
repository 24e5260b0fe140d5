package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The ops scripts against a local PDS stub over real HTTP — session
  * login, blob upload, record put/delete, auth headers. No Spark needed. */
class FeedGenOpsSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Minimal PDS: createSession issues a token; putRecord/deleteRecord/
    * uploadBlob record what they were sent and require that token. */
  private def withPds(body: (String, java.util.Map[String, String]) => Unit): Unit = {
    val seen = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: com.sun.net.httpserver.HttpExchange, status: Int, json: String): Unit = {
      val b = json.getBytes("UTF-8")
      ex.sendResponseHeaders(status, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/xrpc/com.atproto.server.createSession", ex => {
      val req = mapper.readTree(ex.getRequestBody.readAllBytes())
      seen.put("login", req.get("identifier").asText() + ":" + req.get("password").asText())
      reply(ex, 200, """{"did":"did:plc:publisher","accessJwt":"session-token-1"}""")
    })
    Seq("putRecord", "deleteRecord").foreach { m =>
      server.createContext(s"/xrpc/com.atproto.repo.$m", ex => {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        if (auth != "Bearer session-token-1") reply(ex, 401, """{"error":"AuthRequired"}""")
        else {
          seen.put(m, new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          reply(ex, 200, """{"ok":true}""")
        }
      })
    }
    server.createContext("/xrpc/com.atproto.repo.uploadBlob", ex => {
      seen.put("uploadBlob", ex.getRequestHeaders.getFirst("Content-Type") + ":" +
        ex.getRequestBody.readAllBytes().length)
      reply(ex, 200, """{"blob":{"$type":"blob","ref":{"$link":"bafyblob1"},"mimeType":"image/png","size":3}}""")
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", seen)
    finally server.stop(0)
  }

  test("publish logs in, uploads the avatar, and puts the reference-shaped record") {
    withPds { (base, seen) =>
      val uri = FeedGenOps.publish(new FeedGenOps.HttpTransport(base),
        handle = "pub.example.com", password = "app-pass-1234",
        recordName = "whats-hot", displayName = "What's Hot",
        description = "top stuff¥nsecond line",
        avatar = Some(("icon.png", Array[Byte](1, 2, 3))),
        hostname = Some("feeds.example.com"),
        nowIso = "2026-08-12T00:00:00Z")
      assert(uri == "at://did:plc:publisher/app.bsky.feed.generator/whats-hot")
      assert(seen.get("login") == "pub.example.com:app-pass-1234")
      assert(seen.get("uploadBlob") == "image/png:3")
      val put = mapper.readTree(seen.get("putRecord"))
      assert(put.get("repo").asText() == "did:plc:publisher")
      assert(put.get("collection").asText() == "app.bsky.feed.generator")
      assert(put.get("rkey").asText() == "whats-hot")
      val rec = put.get("record")
      assert(rec.get("did").asText() == "did:web:feeds.example.com")
      assert(rec.get("displayName").asText() == "What's Hot")
      assert(rec.get("description").asText() == "top stuff\nsecond line") // ¥n unsmuggled
      assert(rec.get("avatar").get("ref").get("$link").asText() == "bafyblob1")
      assert(rec.get("createdAt").asText() == "2026-08-12T00:00:00Z")
    }
  }

  test("delete sends the reference-shaped deleteRecord; validation rejects bad inputs") {
    withPds { (base, seen) =>
      val uri = FeedGenOps.delete(new FeedGenOps.HttpTransport(base),
        "pub.example.com", "app-pass-1234", "whats-hot")
      assert(uri.endsWith("/whats-hot"))
      val del = mapper.readTree(seen.get("deleteRecord"))
      assert(del.get("collection").asText() == "app.bsky.feed.generator")
      assert(del.get("rkey").asText() == "whats-hot")

      val t = new FeedGenOps.HttpTransport(base)
      intercept[IllegalArgumentException](FeedGenOps.publish(
        t, "h", "p", "Bad Name!", "x", hostname = Some("h")))
      intercept[IllegalArgumentException](FeedGenOps.avatarEncoding("icon.gif"))
      intercept[IllegalArgumentException](FeedGenOps.feedGenDid(None, None))
      assert(FeedGenOps.feedGenDid(Some("did:web:svc"), Some("ignored")) == "did:web:svc")
    }
  }
}
