package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.domain.Fixtures
import graft.serving.FeedServer
import graft.sources.{SubscribeReposStub, WireFixtures}
import graft.streaming.Ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

/** The reference's full admin lifecycle over ONE running durable process
  * (databaseUtil.ts:9-192 + subscription.ts:114-239 + algos/starrysky.ts:
  * 10-84): a feed is born over HTTP (setQuery), filled by the searchPosts
  * initial run to its initPost cap, served and paged by getFeedSkeleton,
  * reports its cycle metrics through getQuery, and dies by deleteCondition
  * — which cascades to its stored posts while the streaming sink stays
  * live. Every hop is the real transport: WebSocket wire, HTTP admin,
  * XRPC serving, parquet store under the store lock.
  */
class ControlPlaneLifecycleSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  private def post(port: Int, path: String, body: String) =
    http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", "application/json")
      .header("x-starrtsky-webpasskey", "pk")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def skeleton(port: Int, publisher: String, rkey: String, limit: Int,
      cursor: Option[String]) = {
    val feedUri = java.net.URLEncoder.encode(
      s"at://$publisher/app.bsky.feed.generator/$rkey", "UTF-8")
    val cur = cursor.map(c =>
      "&cursor=" + java.net.URLEncoder.encode(c, "UTF-8")).getOrElse("")
    val resp = http.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$port/xrpc/app.bsky.feed.getFeedSkeleton?feed=$feedUri&limit=$limit$cur"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  test("setQuery → search backfill → paged skeleton → getQuery metrics → deleteCondition cascade") {
    // 3 consecutive full passes (the round-8 gate: green three times in a
    // row, not green once) — each on a fresh data dir and fresh ports.
    for (pass <- 1 to 3) {
      val dir = Files.createTempDirectory(s"graft-lifecycle$pass").toString
      val frames = (1L to 6L).map(i =>
        i -> WireFixtures.commitFrame(i, s"spark lifecycle $i"))
      val stub = new SubscribeReposStub(frames)
      val cfg = FeedServer.Config("did:web:lc.example.com", "lc.example.com", "did:plc:pub")
      val p = new DurablePipeline(spark,
        Seq(Fixtures.cond(key = "base", inputRegex = "spark")), cfg,
        s"ws://127.0.0.1:${stub.port}", dir, adminPasskey = Some("pk"))
      try {
        val port = p.start(reconnectDelayMs = 100, maxRestarts = 3, idleTimeoutMs = 5000)
        assert(p.client.awaitStopped(120000), s"pass $pass: wire did not finish")
        p.flushSpool()
        p.query.processAllAvailable()
        assert(p.storedRows == 6L, s"pass $pass: base feed must hold the wire posts")

        // ---- born over HTTP: a new feed with a small initPost cap
        val r1 = post(port, "/setQuery",
          """{"key":"vec","recordName":"vec","query":"vector","inputRegex":"vector",
            |"invertRegex":"","refresh":"0","initPost":"5","limitCount":"2000"}""".stripMargin)
        assert(r1.statusCode() == 200, s"pass $pass: ${r1.body()}")

        // ---- initial run: searchPosts fills ONLY the new feed, capped at
        // initPost; the established base feed is delta-mode and untouched
        val hits = spark.read.format("graft-search").option("totalPosts", 200).load()
        assert(p.backfillFromSearch(hits) == 5L, s"pass $pass: initPost cap")
        assert(p.backfillFromSearch(hits) == 0L, s"pass $pass: backfill must be idempotent")
        assert(p.storedRows == 11L, s"pass $pass: 6 base + 5 backfilled")

        // ---- served and paged: 3 + cursor → 2, no overlap, newest-first
        val (s1, b1) = skeleton(port, cfg.publisherDid, "vec", 3, None)
        assert(s1 == 200 && b1.get("feed").size() == 3, s"pass $pass: $b1")
        val cur = b1.get("cursor").asText()
        assert(cur.nonEmpty)
        val (s2, b2) = skeleton(port, cfg.publisherDid, "vec", 3, Some(cur))
        assert(s2 == 200 && b2.get("feed").size() == 2, s"pass $pass: $b2")
        val page1 = (0 until 3).map(b1.get("feed").get(_).get("post").asText()).toSet
        val page2 = (0 until 2).map(b2.get("feed").get(_).get("post").asText()).toSet
        assert((page1 & page2).isEmpty, s"pass $pass: cursor pages must not overlap")

        // ---- metrics flowed from the backfill run into getQuery
        val q = mapper.readTree(post(port, "/getQuery", """{"key":"vec"}""").body())
        assert(q.get("lastExecTime").asText().matches("[1-9][0-9]*ms"), s"pass $pass: $q")
        assert(q.get("recordCount").asLong() == 5L, s"pass $pass: $q")

        // ---- and dies: the condition row AND its stored posts go, while
        // the streaming sink is still attached to the same store
        assert(post(port, "/deleteCondition", """{"key":"vec"}""").statusCode() == 200)
        assert(p.control.get("vec").isEmpty, s"pass $pass")
        assert(p.storedRows == 6L, s"pass $pass: cascade must drop exactly vec's posts")
        assert(Ingest.readStore(spark, s"$dir/store")
          .filter(org.apache.spark.sql.functions.col("key") === "base").count() == 6L)
      } finally { p.stop(); stub.stop() }
    }
  }
}
