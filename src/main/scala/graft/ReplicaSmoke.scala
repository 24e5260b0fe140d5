package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.serving.{FeedHeadCache, FeedServer}
import graft.streaming.{CycleManifest, Ingest, VersionedStore}
import org.apache.spark.sql.functions._

/** The TWO-JVM serving sitting (VERDICT r18 item 1): one process drains
  * into a shared store while a SECOND process serves feed pages with the
  * head cache ON, invalidation routed entirely through the persisted
  * [[CycleManifest]] — no shared memory. This is the deployment form
  * SCALE.md claims ("N stateless replicas over the same store"), run for
  * real.
  *
  * {{{
  * # terminal 1 (build store once, then drain forever):
  * sbt "runMain graft.ReplicaSmoke drain <dir> [nPosts] [width] [drainMs] [seconds]"
  * # terminal 2 (serving replica, cache ON, manifest-routed):
  * sbt "runMain graft.ReplicaSmoke serve <dir> [requests] [width]"
  * }}}
  *
  * The drain process appends a small batch for ONE rotating feed every
  * `drainMs` and records it (bumping that feed's persisted counter), so
  * at any moment at most one feed's head is stale-by-token — every other
  * feed must HIT. The serve process asserts freshness end-to-end: after
  * the run it re-reads a drained feed's first page and requires the
  * drain-landed URI to be present.
  */
object ReplicaSmoke {

  private val Pub = "did:plc:pub"

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("drain") => drain(args.drop(1))
    case Some("serve") => serve(args.drop(1))
    case _ => sys.error("usage: ReplicaSmoke drain|serve <dir> ...")
  }

  private def drain(args: Array[String]): Unit = {
    val dir = args(0)
    val nPosts = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val width = args.lift(2).map(_.toInt).getOrElse(1000)
    val drainMs = args.lift(3).map(_.toLong).getOrElse(500L)
    val seconds = args.lift(4).map(_.toInt).getOrElse(120)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val cs = ScaleSmoke.standingConditions(width)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      val t0 = System.nanoTime()
      graft.operators.FilterCascade.fanOutScreened(spark, ScaleSmoke.postViews(spark, nPosts), cs, None)
        .repartition(col("key"))
        .write.mode("overwrite").partitionBy("key").parquet(dir)
      println(f"[drain] store build: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val metrics = new graft.model.ConditionMetrics
    // same wiring as DurablePipeline: the manifest write rides the async
    // single-flight publisher, off the record() path
    val publisher = new CycleManifest.AsyncPublisher(
      new CycleManifest.Writer(dir).persist)
    metrics.persistWith(publisher.submit)
    val s = spark
    import s.implicits._
    val deadline = System.nanoTime() + seconds * 1000000000L
    var i = 0
    println(s"[drain] appending 1 feed per ${drainMs} ms for $seconds s over $width feeds")
    while (System.nanoTime() < deadline) {
      val key = s"feed${i % width}"
      val now = new java.sql.Timestamp(System.currentTimeMillis())
      Seq(graft.model.Post(s"at://drained/$i", key, s"dc$i", None, None, now))
        .toDF()
        .write.mode("append").partitionBy("key")
        .parquet(VersionedStore.versionDir(dir))
      metrics.record(cs.filter(_.key == key), Map(key -> 1L), 1L)
      i += 1
      Thread.sleep(drainMs)
    }
    println(s"[drain] done: $i drains recorded, " +
      s"${publisher.published} manifests published")
    publisher.close()
  }

  private def serve(args: Array[String]): Unit = {
    val dir = args(0)
    val requests = args.lift(1).map(_.toInt).getOrElse(2000)
    val width = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val cs = ScaleSmoke.standingConditions(width)
    while (CycleManifest.read(dir).isEmpty) {
      println("[serve] waiting for the drain's first manifest...")
      Thread.sleep(500)
    }
    val hc = new FeedHeadCache(spark, key => Ingest.readStoreKey(spark, dir, key),
      CycleManifest.replicaVersion(dir), headSize = 400)
    val server = new FeedServer(spark, () => Ingest.readStore(spark, dir),
      () => cs, FeedServer.Config(serviceDid = "did:web:localhost",
        hostname = "localhost", publisherDid = Pub), None, Some(hc))
    val port = server.start()
    val client = HttpClient.newHttpClient()
    val cursorRe = java.util.regex.Pattern.compile("\"cursor\"\\s*:\\s*\"([^\"]+)\"")
    def get(feed: Int, cursor: Option[String]): (Long, Option[String], String) = {
      val uri = s"http://127.0.0.1:$port/xrpc/app.bsky.feed.getFeedSkeleton" +
        s"?feed=at://$Pub/app.bsky.feed.generator/feed$feed&limit=30" +
        cursor.map(c => s"&cursor=${java.net.URLEncoder.encode(c, "UTF-8")}").getOrElse("")
      val t = System.nanoTime()
      val resp = client.send(HttpRequest.newBuilder(URI.create(uri)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      val dt = System.nanoTime() - t
      require(resp.statusCode() == 200, s"feed$feed: HTTP ${resp.statusCode()}")
      val m = cursorRe.matcher(resp.body())
      (dt, if (m.find()) Some(m.group(1)) else None, resp.body())
    }
    (0 until 50).foreach(i => get(i * 7 % width, None)) // warm
    val lat = new Array[Long](requests)
    val cursors = Array.fill[Option[String]](width)(None)
    val visits = new Array[Int](width)
    val walked = math.max(1, width / 4)
    var cursored = 0
    val t0 = System.nanoTime()
    for (r <- 0 until requests) {
      val feed = (r * 37) % walked
      val useCursor = visits(feed) > 0 && cursors(feed).isDefined
      if (useCursor) cursored += 1
      val (dt, next, _) = get(feed, if (useCursor) cursors(feed) else None)
      lat(r) = dt
      cursors(feed) = next
      visits(feed) += 1
    }
    val wall = (System.nanoTime() - t0) / 1e9
    java.util.Arrays.sort(lat)
    def pct(p: Double): Double =
      lat(math.min(lat.length - 1, (p * lat.length).toInt)) / 1e6
    val (hits, builds, fallbacks) = hc.stats
    println(f"[serve] $requests%d requests ($cursored%d cursored) on the NON-INGEST " +
      f"replica: p50=${pct(0.50)}%.1f ms p90=${pct(0.90)}%.1f ms " +
      f"p99=${pct(0.99)}%.1f ms max=${lat.last / 1e6}%.1f ms, " +
      f"${requests / wall}%.1f req/s; cache hits=$hits builds=$builds " +
      f"fallbacks=$fallbacks evictions=${hc.evictions}")
    // freshness end-to-end: a feed the drain touched must serve the
    // drained row on its next first page (token flip -> rebuild)
    val manifest = CycleManifest.read(dir).get._2
    manifest.keys.headOption.foreach { key =>
      val feed = key.stripPrefix("feed").toInt
      val body = get(feed, None)._3
      require(body.contains("at://drained/"),
        s"replica served a STALE head for $key after its drain: ${body.take(300)}")
      println(s"[serve] freshness check: $key serves its drained row — ok")
    }
    server.stop()
    spark.stop()
  }
}
