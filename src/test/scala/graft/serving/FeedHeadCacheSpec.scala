package graft.serving

import graft.SparkSpec
import graft.domain.Fixtures
import graft.operators.FeedPage
import org.apache.spark.sql.DataFrame

/** The head-block serving cache must be REQUEST-INDISTINGUISHABLE from
  * the per-request Spark path ([[FeedPage.pageCollected]]) — rows,
  * ordinals, cursors — across full cursor walks, including pinned
  * prepends, private gates, null timestamps, non-ASCII cid ties, the
  * truncated-head fallback, and store-version invalidation. */
class FeedHeadCacheSpec extends SparkSpec {

  private def ts(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  /** key, uri, cid, indexedAt — 30 rows for f1 (with a ts tie on
    * non-ASCII cids and one null ts), 3 rows for f2 (complete tiny
    * feed). */
  private def storeDf: DataFrame = {
    val s = spark
    import s.implicits._
    val f1 = (0 until 28).map { i =>
      ("f1", s"at://u/$i", f"c$i%03d", ts(f"2024-03-01T10:${i / 60}%02d:${i % 60}%02dZ"))
    } ++ Seq(
      ("f1", "at://u/tie-supp", "🧶a", ts("2024-03-01T09:00:00Z")),
      ("f1", "at://u/tie-bmp", "a", ts("2024-03-01T09:00:00Z")))
    val f2 = (0 until 3).map { i =>
      ("f2", s"at://v/$i", s"d$i", ts(s"2024-03-02T0$i:00:00Z"))
    }
    (f1 ++ f2).toDF("key", "uri", "cid", "indexedAt")
      // one null-ts row: sorts last, never cursors, excluded when cursored
      .unionByName(Seq(("f1", "at://u/null-ts", "zzz",
        null.asInstanceOf[java.sql.Timestamp])).toDF("key", "uri", "cid", "indexedAt"))
  }

  private def walk(pageFn: (graft.model.Condition, Int, Option[String]) =>
      (Seq[(Long, String)], Option[String]), c: graft.model.Condition,
      limit: Int): Seq[Seq[(Long, String)]] = {
    var cur: Option[String] = None
    val out = Seq.newBuilder[Seq[(Long, String)]]
    var done = false
    var pages = 0
    while (!done && pages < 40) {
      val (rows, next) = pageFn(c, limit, cur)
      out += rows
      pages += 1
      if (next.isEmpty || rows.isEmpty) done = true else cur = next
    }
    out.result()
  }

  test("full-walk parity with pageCollected: rows, ordinals, cursors (pinned, ties, null ts)") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f1", pinnedPost = Seq("at://pin/1"))
    for (headSize <- Seq(7, 31, 400); limit <- Seq(3, 10)) {
      val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"), headSize)
      val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, limit)
      val direct = walk((cc, l, cur) =>
        FeedPage.pageCollected(spark, df, cc, l, cur), c, limit)
      assert(cached == direct,
        s"headSize=$headSize limit=$limit diverged:\n$cached\nvs\n$direct")
    }
  }

  test("truncated head (maxBlocks=1) falls back to Spark exactly when the walk runs past it") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f1")
    // head of 7 over a 31-row feed with chaining DISABLED: pages 1-2
    // (limit 3) are in-head, the walk past row 7 must fall back — and
    // stay correct
    val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"), headSize = 7,
      maxBlocks = 1)
    val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, 3)
    val direct = walk((cc, l, cur) =>
      FeedPage.pageCollected(spark, df, cc, l, cur), c, 3)
    assert(cached == direct)
    val (hits, builds, fallbacks) = hc.stats
    assert(builds == 1, s"one head build expected, got $builds")
    assert(fallbacks > 0, "the deep walk must have taken the fallback path")
    assert(hits > 0, "the early pages must have served from the head")
    assert(hc.extensions == 0, "maxBlocks=1 must never extend")
    // a limit above headSize never consults the head
    val before = hc.stats._3
    hc.page(c, 8, None)
    assert(hc.stats._3 == before + 1, "limit > headSize must fall back")
  }

  test("deep walk extends the chain block-by-block: zero fallbacks inside maxBlocks, " +
      "fallback only past the bound") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f1")
    // 31 f1 rows (incl. null-ts): headSize 7 × maxBlocks 5 = 35 covers
    // the feed, so the FULL walk must stay in-head — extensions replace
    // what used to be per-page fallbacks
    val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"), headSize = 7,
      maxBlocks = 5)
    val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, 3)
    val direct = walk((cc, l, cur) =>
      FeedPage.pageCollected(spark, df, cc, l, cur), c, 3)
    assert(cached == direct, "chained walk must be request-indistinguishable")
    assert(hc.stats._3 == 0, "no page inside the chain bound may fall back")
    assert(hc.stats._2 == 1 && hc.extensions >= 3,
      s"one build + block extensions expected, got ${hc.stats._2}/${hc.extensions}")
    // a second full walk re-serves the whole chain with ZERO new jobs
    val (_, builds0, _) = hc.stats
    val ext0 = hc.extensions
    assert(walk((cc, l, cur) => hc.page(cc, l, cur), c, 3) == direct)
    assert(hc.stats._2 == builds0 && hc.extensions == ext0 && hc.stats._3 == 0,
      "a re-walk over an unchanged token must be fully cached")
    // maxBlocks=2 (14 rows) over the same feed: the walk is exact but
    // must fall back once past row 14
    val hc2 = new FeedHeadCache(spark, _ => df, _ => Some("v1"), headSize = 7,
      maxBlocks = 2)
    assert(walk((cc, l, cur) => hc2.page(cc, l, cur), c, 3) == direct)
    assert(hc2.stats._3 > 0, "past maxBlocks the walk must fall back")
    assert(hc2.extensions == 1, "the chain must stop at maxBlocks-1 extensions")
  }

  test("complete tiny feed serves end-of-feed pages from the head (no fallback)") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f2")
    val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"), headSize = 50)
    val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, 2)
    val direct = walk((cc, l, cur) =>
      FeedPage.pageCollected(spark, df, cc, l, cur), c, 2)
    assert(cached == direct)
    assert(hc.stats._3 == 0, "a complete head must never fall back")
    assert(hc.stats._2 == 1, "one build for the whole walk")
  }

  test("version flip invalidates; same version serves the cached snapshot") {
    val s = spark
    import s.implicits._
    var rows = Seq(("f1", "at://u/1", "c1", ts("2024-03-01T10:00:00Z")))
    var v = "v1"
    def df = rows.toDF("key", "uri", "cid", "indexedAt")
    val hc = new FeedHeadCache(spark, _ => df, _ => Some(v), headSize = 50)
    val c = Fixtures.cond(key = "f1")
    assert(hc.page(c, 10, None)._1.map(_._2) == Seq("at://u/1"))
    // store grows but the pointer has not flipped: cached head serves
    rows = rows :+ (("f1", "at://u/2", "c2", ts("2024-03-01T11:00:00Z")))
    assert(hc.page(c, 10, None)._1.map(_._2) == Seq("at://u/1"),
      "an unflipped version must keep serving its snapshot")
    // pointer flip: rebuild picks up the new row
    v = "v2"
    assert(hc.page(c, 10, None)._1.map(_._2) == Seq("at://u/2", "at://u/1"))
    // no version source wired in -> always the Spark path
    val hcOff = new FeedHeadCache(spark, _ => df, _ => None, headSize = 50)
    assert(hcOff.page(c, 10, None)._1.nonEmpty && hcOff.stats._2 == 0)
  }

  test("single-flight: concurrent cold requests coalesce into ONE build; failures " +
      "propagate and never wedge the slot") {
    val s = spark
    import s.implicits._
    val df = (0 until 10).map(i =>
      ("f1", s"at://u/$i", s"c$i", ts(f"2024-03-01T10:0$i%d:00Z")))
      .toDF("key", "uri", "cid", "indexedAt").cache()
    df.count() // materialize before the slow thunk measures anything
    val slowStore: String => org.apache.spark.sql.DataFrame =
      _ => { Thread.sleep(300); df }
    val hc = new FeedHeadCache(spark, slowStore, _ => Some("v1"), headSize = 50)
    val c = Fixtures.cond(key = "f1")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map(_ => pool.submit(
        new java.util.concurrent.Callable[(Seq[(Long, String)], Option[String])] {
          def call() = hc.page(c, 3, None)
        }))
      val pages = futs.map(_.get())
      assert(pages.toSet.size == 1, "coalesced requests must serve identical pages")
      assert(hc.stats._2 == 1,
        s"4 concurrent cold requests must produce ONE build, got ${hc.stats._2}")
      assert(hc.stats._1 + hc.coalesced == 3,
        "the other three must have waited or hit, never rebuilt")
    } finally pool.shutdown()
    // a failed build rethrows (to the builder AND any waiter) and leaves
    // the slot usable — the next request builds cleanly
    var fail = true
    val flaky: String => org.apache.spark.sql.DataFrame =
      _ => { if (fail) throw new RuntimeException("store offline"); df }
    val hc2 = new FeedHeadCache(spark, flaky, _ => Some("v1"), headSize = 50)
    intercept[RuntimeException] { hc2.page(c, 3, None) }
    fail = false
    assert(hc2.page(c, 3, None)._1.nonEmpty, "a failed build must not wedge the feed")

    // error-surface parity: a request that COALESCED onto the failed
    // build must see the same exception type as the winning builder —
    // not join()'s CompletionException wrapper
    val slowFlaky: String => org.apache.spark.sql.DataFrame =
      _ => { Thread.sleep(200); throw new RuntimeException("store offline") }
    val hc3 = new FeedHeadCache(spark, slowFlaky, _ => Some("v1"), headSize = 50)
    val errs = (0 until 3).map(_ => pool2Submit(hc3, c)).map { f =>
      try { f.get(); null }
      catch { case e: java.util.concurrent.ExecutionException => e.getCause }
    }
    errs.foreach { t =>
      assert(t != null && t.isInstanceOf[RuntimeException] &&
        t.getMessage == "store offline",
        s"winner and waiters must surface the SAME raw exception, got $t")
    }
  }

  private def pool2Submit(hc: FeedHeadCache, c: graft.model.Condition) = {
    val pool = java.util.concurrent.Executors.newSingleThreadExecutor()
    try pool.submit(new java.util.concurrent.Callable[Unit] {
      def call(): Unit = { hc.page(c, 3, None); () }
    })
    finally pool.shutdown()
  }

  test("past maxFeeds, ONE least-recently-used head is evicted — hot feeds keep theirs") {
    val s = spark
    import s.implicits._
    val df = (1 to 4).flatMap { f =>
      (0 until 5).map(i => (s"f$f", s"at://u/$f/$i", s"c$i",
        ts(f"2024-03-01T10:0$i%d:00Z")))
    }.toDF("key", "uri", "cid", "indexedAt").cache()
    val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"),
      headSize = 50, maxFeeds = 3)
    def page(k: String) = hc.page(Fixtures.cond(key = k), 3, None)
    page("f1"); page("f2"); page("f3")
    assert(hc.stats._2 == 3 && hc.evictions == 0)
    // touch f1 and f3 so f2 is the LRU victim
    page("f1"); page("f3")
    assert(hc.stats == ((2L, 3L, 0L)))
    // the 4th feed crosses the bound: exactly ONE eviction, not a clear
    page("f4")
    assert(hc.stats._2 == 4 && hc.evictions == 1)
    // hot feeds survived — both serve from cache with zero new builds
    page("f1"); page("f3"); page("f4")
    assert(hc.stats == ((5L, 4L, 0L)) && hc.evictions == 1,
      "hot heads must survive an eviction (a wholesale clear would rebuild them)")
    // only the cold victim rebuilds (evicting the next LRU, f1)
    page("f2")
    assert(hc.stats._2 == 5 && hc.evictions == 2)
  }

  test("cross-process invalidation: a replica cache over the store sees drains " +
      "through the persisted cycle manifest (no shared process state)") {
    import graft.streaming.CycleManifest
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replica").toString
    def append(rows: Seq[(String, String, String, java.sql.Timestamp)]): Unit =
      rows.toDF("key", "uri", "cid", "indexedAt")
        .write.mode("append").parquet(dir)
    def store() = spark.read.parquet(dir)

    // ---- "drain process": in-process metrics + the manifest writer ----
    val drainMetrics = new graft.model.ConditionMetrics
    drainMetrics.persistWith(new CycleManifest.Writer(dir).persist)
    val conds = Seq(Fixtures.cond(key = "f1"), Fixtures.cond(key = "f2"))
    def drain(key: String, rows: Seq[(String, String, String, java.sql.Timestamp)]): Unit = {
      append(rows)
      Thread.sleep(5) // distinct manifest mtimes for the stat-check
      drainMetrics.record(conds.filter(_.key == key), Map(key -> rows.size.toLong), 1L)
    }

    // ---- "serving replica": fresh objects, version routed via the store ----
    // statIntervalMs = 0: this spec's drains are milliseconds apart and
    // assert IMMEDIATE visibility; the deployment default (250 ms) trades
    // that for zero namespace RPCs per request — CycleManifestSpec pins
    // the staleness bound
    val hc = new FeedHeadCache(spark, _ => store(),
      CycleManifest.replicaVersion(dir, statIntervalMs = 0L), headSize = 50)
    val c1 = Fixtures.cond(key = "f1")

    // no manifest yet: the replica must not cache (fallback path only)
    append(Seq(("f1", "at://u/0", "c0", ts("2024-03-01T09:00:00Z"))))
    assert(hc.page(c1, 10, None)._1.map(_._2) == Seq("at://u/0"))
    assert(hc.stats._2 == 0 && hc.stats._3 == 1,
      "without a persisted manifest a replica cannot cache")

    // first recorded drain: replica builds a head and serves from it
    drain("f1", Seq(("f1", "at://u/1", "c1", ts("2024-03-01T10:00:00Z"))))
    assert(hc.page(c1, 10, None)._1.map(_._2) == Seq("at://u/1", "at://u/0"))
    assert(hc.page(c1, 10, None)._1.map(_._2) == Seq("at://u/1", "at://u/0"))
    assert(hc.stats._1 == 1 && hc.stats._2 == 1)

    // a drain for f1 invalidates ONLY f1's head — and the replica's very
    // next page shows the new row (no stale page)
    drain("f2", Seq(("f2", "at://v/1", "d1", ts("2024-03-01T10:00:00Z"))))
    assert(hc.page(c1, 10, None)._1.map(_._2) == Seq("at://u/1", "at://u/0"),
      "a drain that landed nothing for f1 must keep f1's head")
    assert(hc.stats._1 == 2 && hc.stats._2 == 1, "f1 must have HIT, not rebuilt")
    drain("f1", Seq(("f1", "at://u/2", "c2", ts("2024-03-01T11:00:00Z"))))
    assert(hc.page(c1, 10, None)._1.map(_._2) ==
      Seq("at://u/2", "at://u/1", "at://u/0"),
      "the first page after a drain must include the drained row")
    assert(hc.stats._2 == 2)

    // cursor walk straddling a drain: keyset contract — rows landed
    // mid-walk are NEWER than the cursor, so the continuation is exact
    val (p1, cur1) = hc.page(c1, 2, None)
    assert(p1.map(_._2) == Seq("at://u/2", "at://u/1") && cur1.isDefined)
    drain("f1", Seq(("f1", "at://u/3", "c3", ts("2024-03-01T12:00:00Z"))))
    val (p2, _) = hc.page(c1, 2, cur1)
    assert(p2.map(_._2) == Seq("at://u/0"),
      "a continuation across a drain must neither duplicate nor lose rows")

    // "drain process restart": fresh metrics (counters re-climb from 0)
    // + fresh writer — the generation resumes MONOTONE, so the replica
    // rebuilds instead of trusting a colliding re-climbed token
    val restarted = new graft.model.ConditionMetrics
    restarted.persistWith(new CycleManifest.Writer(dir).persist)
    val buildsBefore = hc.stats._2
    append(Seq(("f1", "at://u/4", "c4", ts("2024-03-01T13:00:00Z"))))
    Thread.sleep(5)
    restarted.record(Seq(c1), Map("f1" -> 1L), 1L)
    assert(hc.page(c1, 10, None)._1.head._2 == "at://u/4",
      "post-restart drains must be visible to the replica")
    assert(hc.stats._2 == buildsBefore + 1)
  }

  test("private gate applies before any head work") {
    val df = storeDf.cache()
    val priv = Fixtures.cond(key = "f1", privateFeed = Seq("did:plc:ok"))
    val hc = new FeedHeadCache(spark, _ => df, _ => Some("v1"))
    assert(hc.page(priv, 10, None, None) == ((Nil, None)))
    assert(hc.stats == ((0L, 0L, 0L)), "a gated request must touch nothing")
    assert(hc.page(priv, 10, None, Some("did:plc:ok"))._1.nonEmpty)
  }
}
