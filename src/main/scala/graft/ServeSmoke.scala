package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.serving.FeedServer
import org.apache.spark.sql.functions._

/** Serving-plane latency at WIDTH (VERDICT r16 item 7): end-to-end
  * `getFeedSkeleton` HTTP latency percentiles against a FeedServer over a
  * key-partitioned parquet store built by the production fan-out —
  * 1 000 standing feeds, a realistic post table, keyset pagination.
  *
  * {{{ sbt "runMain graft.ServeSmoke [nPosts] [width] [requests]" }}}
  *
  * The store is written `partitionBy("key")`, the durable pipeline's
  * layout, so a page is: partition-pruned scan of ONE feed's files →
  * keyset tuple predicate → TakeOrderedAndProject(limit) — never a
  * full-table scan (the representative plan is printed and grepped for
  * the partition filter). Requests walk feeds round-robin; every other
  * request follows the previous page's cursor, so both first-page and
  * keyset-cursor paths are in the sample. Sequential client = clean
  * per-request latency (the 4-thread server pool is not the variable
  * under test). */
object ServeSmoke {

  def main(args: Array[String]): Unit = {
    val nPosts = args.headOption.map(_.toLong).getOrElse(2000000L)
    val width = args.lift(1).map(_.toInt).getOrElse(1000)
    val requests = args.lift(2).map(_.toInt).getOrElse(1000)
    // optional fixed store dir: reuse an already-built store across runs
    val dir = args.lift(3).getOrElse(
      java.nio.file.Files.createTempDirectory("servesmoke").toString)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val cs = ScaleSmoke.standingConditions(width)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      val posts = ScaleSmoke.postViews(spark, nPosts)
      val t0 = System.nanoTime()
      // repartition by key before the partitioned write = ONE file per
      // key dir (the layout retentionCompact maintains): a 32-writer-task
      // layout left 32 tiny files per key and doubled page latency
      graft.operators.FilterCascade.fanOutScreened(spark, posts, cs, None)
        .repartition(org.apache.spark.sql.functions.col("key"))
        .write.mode("overwrite").partitionBy("key").parquet(dir)
      println(f"[serve] store build+write: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val store = spark.read.parquet(dir)
    println(s"[serve] store rows=${store.count()} over $width feeds from $nPosts posts")

    // the representative page plan: partition-pruned scan + top-k
    val plan = graft.operators.FeedPage.page(spark, store, cs.head, 30, None)
      .queryExecution.executedPlan.toString
    println("[serve] page plan (key lines):")
    plan.linesIterator
      .filter(l => l.contains("TakeOrdered") || l.contains("PartitionFilters") ||
        l.contains("Scan parquet"))
      .take(6).foreach(l => println("[serve]   " + l.trim.take(200)))

    val pub = "did:plc:pub"
    // 5th arg "cache": serve through the per-feed head-block cache (the
    // r18 planning-floor answer) — the smoke store is immutable, so a
    // static version pins every head for the run; production wires the
    // versioned store's pointer instead
    val headCache =
      if (args.lift(4).contains("cache"))
        Some(new graft.serving.FeedHeadCache(spark, _ => store,
          _ => Some("smoke-static"), headSize = 400))
      else None
    println(s"[serve] head cache: ${if (headCache.isDefined) "ON (headSize=400)" else "off"}")
    val server = new FeedServer(spark, () => store, () => cs,
      FeedServer.Config(serviceDid = "did:web:localhost", hostname = "localhost",
        publisherDid = pub), None, headCache)
    val port = server.start()
    val client = HttpClient.newHttpClient()
    val cursorRe = java.util.regex.Pattern.compile("\"cursor\"\\s*:\\s*\"([^\"]+)\"")
    def get(feed: Int, cursor: Option[String]): (Long, Option[String]) = {
      val uri = s"http://127.0.0.1:$port/xrpc/app.bsky.feed.getFeedSkeleton" +
        s"?feed=at://$pub/app.bsky.feed.generator/feed$feed&limit=30" +
        cursor.map(c => s"&cursor=${java.net.URLEncoder.encode(c, "UTF-8")}").getOrElse("")
      val t = System.nanoTime()
      val resp = client.send(HttpRequest.newBuilder(URI.create(uri)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val dt = System.nanoTime() - t
      require(resp.statusCode() == 200, s"feed$feed: HTTP ${resp.statusCode()} ${resp.body().take(200)}")
      val m = cursorRe.matcher(resp.body())
      (dt, if (m.find()) Some(m.group(1)) else None)
    }

    // warm: JIT + parquet footer caches + first-touch scheduler paths
    (0 until 50).foreach(i => get(i * 7 % width, None))

    val lat = new Array[Long](requests)
    // per-FEED cursor chain keyed to the feed's own VISIT count: the
    // first visit to a feed is a first page, every later visit follows
    // that feed's previous cursor — a true page walk of one feed's
    // partition. (A global request-parity rule degenerated: with
    // requests == width every feed is visited once and NO request was
    // cursored; per-visit parity fixes the mix for any request count.)
    val cursors = Array.fill[Option[String]](width)(None)
    val visits = new Array[Int](width)
    var cursored = 0
    var served = 0L
    val tAll = System.nanoTime()
    // walk a quarter of the feeds ~4 visits each, so roughly 3/4 of the
    // requests are genuine cursored follow-up pages
    val walked = math.max(1, width / 4)
    for (r <- 0 until requests) {
      val feed = (r * 37) % walked
      val useCursor = visits(feed) > 0 && cursors(feed).isDefined
      if (useCursor) cursored += 1
      val (dt, next) = get(feed, if (useCursor) cursors(feed) else None)
      lat(r) = dt
      cursors(feed) = next
      visits(feed) += 1
      served += 1
    }
    val wall = (System.nanoTime() - tAll) / 1e9
    java.util.Arrays.sort(lat)
    def pct(p: Double): Double = lat(math.min(lat.length - 1,
      (p * lat.length).toInt)) / 1e6
    println(f"[serve] $served%d requests over $walked%d of $width%d feeds " +
      f"($cursored%d cursored): " +
      f"p50=${pct(0.50)}%.1f ms p90=${pct(0.90)}%.1f ms p99=${pct(0.99)}%.1f ms " +
      f"max=${lat.last / 1e6}%.1f ms, ${served / wall}%.1f req/s sequential")

    // throughput at the server pool's width: 4 concurrent clients
    // (first-page requests; throughput is the replica-scaling number)
    val conc = 4
    val per = requests / conc
    val pool = java.util.concurrent.Executors.newFixedThreadPool(conc)
    val tC = System.nanoTime()
    val futs = (0 until conc).map { t =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          var n = 0L
          for (r <- 0 until per) { get((t * per + r * 41) % width, None); n += 1 }
          n
        }
      })
    }
    val total = futs.map(_.get()).sum
    val wallC = (System.nanoTime() - tC) / 1e9
    pool.shutdown()
    println(f"[serve] concurrency $conc: $total%d requests in $wallC%.1f s = " +
      f"${total / wallC}%.1f req/s")
    headCache.foreach { hc =>
      val (hits, builds, fallbacks) = hc.stats
      println(s"[serve] head cache stats: hits=$hits builds=$builds " +
        s"fallbacks=$fallbacks extensions=${hc.extensions} coalesced=${hc.coalesced}")
      // in-process hit latency (no HTTP): isolates the cache's own cost
      // from the network stack's
      val c0 = cs(1)
      hc.page(c0, 30, None)
      val tIn = System.nanoTime()
      var i = 0
      while (i < 1000) { hc.page(c0, 30, None); i += 1 }
      println(f"[serve] in-process head-hit: ${(System.nanoTime() - tIn) / 1e6 / 1000}%.3f ms/page")
    }
    server.stop()
    spark.stop()
  }
}
