package graft

import com.fasterxml.jackson.databind.ObjectMapper

import graft.domain.Fixtures
import graft.serving.{Auth, FeedServer}
import graft.sources.{SubscribeReposStub, WireFixtures}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The whole application in one spec: wire-format CBOR frames served by a
  * real WebSocket stub → [[LivePipeline]] (subscribe, decode, cascade,
  * dedup upsert) → a feed page fetched over real XRPC HTTP. The reference
  * process (index.ts) does exactly this loop; every hop here is the real
  * implementation, no shortcuts between the socket and the HTTP response.
  */
class LivePipelineSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  test("wire → websocket → micro-batch ingest → served XRPC feed page") {
    // 10 commits; texts 1-6 say "spark", 7-10 do not → cascade keeps 6
    val frames = (1L to 10L).map { i =>
      val text = if (i <= 6) s"spark post number $i" else s"plain post number $i"
      i -> WireFixtures.commitFrame(i, text)
    }
    val stub = new SubscribeReposStub(frames)
    val conditions = Seq(Fixtures.cond(key = "live1", inputRegex = "spark"))
    val cfg = FeedServer.Config(
      serviceDid = "did:web:feeds.example.com",
      hostname = "feeds.example.com",
      publisherDid = "did:plc:publisher",
      keyResolver = Auth.StaticKeyResolver(Map.empty))
    val live = new LivePipeline(spark, conditions, cfg,
      service = s"ws://127.0.0.1:${stub.port}", cursorEvery = 2)
    try {
      val port = live.start(reconnectDelayMs = 100, maxRestarts = 3, idleTimeoutMs = 5000)
      assert(live.client.awaitStopped(120000), "subscription did not finish")
      assert(live.storedCursor == 10L)

      // before the first drain the served store is empty
      val feedUri = java.net.URLEncoder.encode(
        s"at://${cfg.publisherDid}/app.bsky.feed.generator/live1", "UTF-8")
      def page(limit: Int) = {
        val resp = http.send(HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/xrpc/app.bsky.feed.getFeedSkeleton?feed=$feedUri&limit=$limit"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
        (resp.statusCode(), mapper.readTree(resp.body()))
      }
      val (st0, p0) = page(50)
      assert(st0 == 200 && p0.get("feed").size() == 0, p0.toString)

      // one micro-batch drains the buffer: 6 of 10 posts pass the cascade
      assert(live.drainBatch() == 6L)
      assert(live.storedRows == 6L)
      val (st1, p1) = page(50)
      assert(st1 == 200 && p1.get("feed").size() == 6, p1.toString)
      val uris = (0 until 6).map(p1.get("feed").get(_).get("post").asText())
      assert(uris.forall(_.startsWith("at://did:plc:u")))

      // an empty drain is a no-op, and the store count is stable
      assert(live.drainBatch() == 0L)
      assert(live.storedRows == 6L)
    } finally {
      live.stop()
      stub.stop()
    }
  }

  test("admin CRUD is live: a setQuery lands on the next drain, deleteCondition drops the feed") {
    // The reference re-reads the conditions table every cycle
    // (subscription.ts:133-137), so a console edit needs no restart. Same
    // here: the pipeline's control plane is mutated over real HTTP and the
    // NEXT drainBatch cascades with the updated set.
    val f = (1L to 6L).map { i =>
      val text = if (i <= 3) s"spark live $i" else s"vector live $i"
      i -> WireFixtures.commitFrame(i, text)
    }
    val stub = new SubscribeReposStub(f)
    val conditions = Seq(Fixtures.cond(key = "base", inputRegex = "spark"))
    val cfg = FeedServer.Config("did:web:c.example.com", "c.example.com", "did:plc:pub")
    val live = new LivePipeline(spark, conditions, cfg,
      service = s"ws://127.0.0.1:${stub.port}", cursorEvery = 2,
      adminPasskey = Some("pk"))
    try {
      val port = live.start(reconnectDelayMs = 100, maxRestarts = 3, idleTimeoutMs = 5000)
      assert(live.client.awaitStopped(120000))
      assert(live.drainBatch() == 3L) // only "spark" matches the base feed

      def post(path: String, body: String) =
        http.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
          .header("Content-Type", "application/json")
          .header("x-starrtsky-webpasskey", "pk")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
          HttpResponse.BodyHandlers.ofString())

      // add a feed over the wire; replay the frames (at-least-once seam):
      // the new feed captures the vector posts, base dedups to zero
      val r1 = post("/setQuery",
        """{"key":"vec","recordName":"vec","query":"vector","inputRegex":"vector",
          |"invertRegex":"","refresh":"0","initPost":"100","limitCount":"2000"}""".stripMargin)
      assert(r1.statusCode() == 200, r1.body())
      f.foreach { case (_, bytes) => live.offer(bytes) }
      assert(live.drainBatch() == 3L, "the next drain must cascade with the new condition")
      assert(live.storedRows == 6L)

      // metrics flowed through to getQuery (lastExecTime + recordCount)
      val r2 = mapper.readTree(post("/getQuery", """{"key":"vec"}""").body())
      assert(r2.get("lastExecTime").asText().matches("[1-9][0-9]*ms"), r2.toString)
      assert(r2.get("recordCount").asLong() == 3L, r2.toString)

      // deleteCondition drops the row AND the feed's served posts
      assert(post("/deleteCondition", """{"key":"vec"}""").statusCode() == 200)
      assert(live.control.get("vec").isEmpty)
      assert(live.storedRows == 3L, "the deleted feed's posts must leave the store")
    } finally { live.stop(); stub.stop() }
  }

  test("backfillFromSearch fills a fresh feed to initPost, then stays idempotent (T2)") {
    val cfg = FeedServer.Config("did:web:bf.example.com", "bf.example.com", "did:plc:pub")
    val live = new LivePipeline(spark,
      Seq(Fixtures.cond(key = "bf", inputRegex = "vector", initPost = 4)),
      cfg, service = "ws://127.0.0.1:1") // never started: backfill is batch-side
    val search = spark.read.format("graft-search").option("totalPosts", 200).load()
    assert(live.backfillFromSearch(search) == 4L)
    assert(live.storedRows == 4L)
    assert(live.backfillFromSearch(search) == 0L, "a filled feed must not re-backfill")
  }

  test("replayed frames fall out of the dedup anti-join across batches") {
    val f = (1L to 4L).map(i => i -> WireFixtures.commitFrame(i, s"spark echo $i"))
    val stub = new SubscribeReposStub(f)
    val conditions = Seq(Fixtures.cond(key = "live2", inputRegex = "spark"))
    val cfg = FeedServer.Config("did:web:f.example.com", "f.example.com", "did:plc:pub")
    val live = new LivePipeline(spark, conditions, cfg,
      service = s"ws://127.0.0.1:${stub.port}", cursorEvery = 2)
    try {
      live.start(reconnectDelayMs = 100, maxRestarts = 3, idleTimeoutMs = 5000)
      assert(live.client.awaitStopped(120000))
      assert(live.drainBatch() == 4L)
      // redeliver the identical frames (the backfill seam = the same
      // buffer the socket fills): at-least-once upstream, zero new rows
      f.foreach { case (_, bytes) => live.offer(bytes) }
      assert(live.drainBatch() == 0L, "replayed commits must dedup to zero new rows")
      assert(live.storedRows == 4L)
    } finally { live.stop(); stub.stop() }
  }

  test("1,000 standing conditions drain as one keyed job; metrics land on every feed (width wiring)") {
    // The WIDTH contract end-to-end at the application layer (SURVEY
    // §7.4#6; the throughput race lives in ScaleSmoke's fanout section):
    // a control plane holding 1 000 conditions, wire frames through the
    // real CBOR decode, ONE drain — no per-feed driver loop — and the
    // cycle metrics recorded for every standing feed.
    val conditions = ScaleSmoke.standingConditions(1000)
    val cfg = FeedServer.Config(
      serviceDid = "did:web:feeds.example.com",
      hostname = "feeds.example.com",
      publisherDid = "did:plc:publisher",
      keyResolver = Auth.StaticKeyResolver(Map.empty))
    val live = new LivePipeline(spark, conditions, cfg,
      service = "ws://127.0.0.1:1") // never started: frames are offered directly
    try {
      // 40 frames, each matching exactly ONE feed's include regex
      // (topic<k>\b; topic1 does not match topic10 — \b sees the digit)
      (1L to 40L).foreach(i =>
        live.offer(WireFixtures.commitFrame(i, s"topic${i - 1} width probe")))
      assert(live.drainBatch() == 40L, "each frame lands on exactly its own feed")
      assert(live.storedRows == 40L)
      // the cycle's metrics cover ALL 1 000 conditions (the reference
      // UPDATEs every feed's row per cycle), with per-feed counts only
      // where rows landed
      val snap = live.metrics.snapshot
      assert(snap.size == 1000, s"metrics rows: ${snap.size}")
      assert(snap("feed7").recordCount == 1L)
      assert(snap("feed999").recordCount == 0L)
      assert(snap.values.forall(_.lastExecTime.endsWith("ms")))
      // and the control plane serves the width: getQuery state was
      // published for a feed that captured nothing too
      assert(live.control.conditions.size == 1000)
    } finally live.stop()
  }
}
