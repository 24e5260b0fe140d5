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
      val hc = new FeedHeadCache(spark, () => df, _ => Some("v1"), headSize)
      val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, limit)
      val direct = walk((cc, l, cur) =>
        FeedPage.pageCollected(spark, df, cc, l, cur), c, limit)
      assert(cached == direct,
        s"headSize=$headSize limit=$limit diverged:\n$cached\nvs\n$direct")
    }
  }

  test("truncated head falls back to Spark exactly when the walk runs past it") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f1")
    // head of 7 over a 31-row feed: pages 1-2 (limit 3) are in-head, the
    // walk past row 7 must fall back — and stay correct
    val hc = new FeedHeadCache(spark, () => df, _ => Some("v1"), headSize = 7)
    val cached = walk((cc, l, cur) => hc.page(cc, l, cur), c, 3)
    val direct = walk((cc, l, cur) =>
      FeedPage.pageCollected(spark, df, cc, l, cur), c, 3)
    assert(cached == direct)
    val (hits, builds, fallbacks) = hc.stats
    assert(builds == 1, s"one head build expected, got $builds")
    assert(fallbacks > 0, "the deep walk must have taken the fallback path")
    assert(hits > 0, "the early pages must have served from the head")
    // a limit above headSize never consults the head
    val before = hc.stats._3
    hc.page(c, 8, None)
    assert(hc.stats._3 == before + 1, "limit > headSize must fall back")
  }

  test("complete tiny feed serves end-of-feed pages from the head (no fallback)") {
    val df = storeDf.cache()
    val c = Fixtures.cond(key = "f2")
    val hc = new FeedHeadCache(spark, () => df, _ => Some("v1"), headSize = 50)
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
    val hc = new FeedHeadCache(spark, () => df, _ => Some(v), headSize = 50)
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
    val hcOff = new FeedHeadCache(spark, () => df, _ => None, headSize = 50)
    assert(hcOff.page(c, 10, None)._1.nonEmpty && hcOff.stats._2 == 0)
  }

  test("private gate applies before any head work") {
    val df = storeDf.cache()
    val priv = Fixtures.cond(key = "f1", privateFeed = Seq("did:plc:ok"))
    val hc = new FeedHeadCache(spark, () => df, _ => Some("v1"))
    assert(hc.page(priv, 10, None, None) == ((Nil, None)))
    assert(hc.stats == ((0L, 0L, 0L)), "a gated request must touch nothing")
    assert(hc.page(priv, 10, None, Some("did:plc:ok"))._1.nonEmpty)
  }
}
