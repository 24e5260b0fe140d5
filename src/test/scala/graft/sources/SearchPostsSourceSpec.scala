package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchPostsSourceSpec extends SparkSpec {

  test("batch read: deterministic posts, full count") {
    val df = spark.read.format("graft-search").option("totalPosts", 500).load()
    assert(df.count() == 500)
    assert(df.schema.fieldNames.toSeq ==
      Seq("uri", "cid", "did", "text", "lang", "createdAt"))
    // deterministic across reads
    val a = df.orderBy("uri").select("cid").collect().map(_.getString(0)).toSeq
    val b = spark.read.format("graft-search").option("totalPosts", 500).load()
      .orderBy("uri").select("cid").collect().map(_.getString(0)).toSeq
    assert(a == b)
  }

  test("lang equality predicate is pushed into the source scan") {
    val df = spark.read.format("graft-search").option("totalPosts", 500).load()
      .filter(col("lang") === "en")
    assert(df.count() == 100) // 1 of 5 langs
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushedLang=en"), s"pushdown missing in plan:\n$plan")
  }

  test("micro-batch stream honors the per-trigger page budget and loses nothing") {
    val store = java.nio.file.Files.createTempDirectory("graft-search-out").toString
    var batchSizes = Vector.empty[Long]
    val q = spark.readStream.format("graft-search")
      .option("totalPosts", 350).option("pageSize", 100).option("pagesPerTrigger", 2)
      .load()
      .writeStream
      .option("checkpointLocation", s"$store/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes :+= b.count()
        b.write.mode("append").parquet(s"$store/data")
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(batchSizes.forall(_ <= 200)) // 2 pages x 100
    assert(batchSizes.sum == 350)
    val out = spark.read.parquet(s"$store/data")
    assert(out.count() == 350)
    assert(out.select("uri").distinct().count() == 350) // no dup, no loss
  }

  test("Trigger.Once semantics: allAvailable reads the whole backlog, not one budget") {
    // Spark passes ReadLimit.allAvailable() for single-batch triggers; the
    // contract is the ENTIRE backlog in that batch — treating it as one
    // pagesPerTrigger budget made a Trigger.Once query stop after the
    // first pages and report success with the rest silently unread
    val stream = new SearchMicroBatchStream(totalPosts = 50000L,
      pageSize = 100, pagesPerTrigger = 10, langFilter = None)
    val all = stream.latestOffset(PageOffset(0L),
      org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())
    assert(all == PageOffset(50000L), s"allAvailable must reach the head, got $all")
    // the budgeted trigger path is unchanged
    val budgeted = stream.latestOffset(PageOffset(0L), stream.getDefaultReadLimit)
    assert(budgeted == PageOffset(1000L))
  }

  test("streaming read with pushed lang filter yields only that language") {
    val store = java.nio.file.Files.createTempDirectory("graft-search-lang").toString
    val q = spark.readStream.format("graft-search")
      .option("totalPosts", 300).load()
      .filter(col("lang") === "de")
      .writeStream
      .option("checkpointLocation", s"$store/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.write.mode("append").parquet(s"$store/data")
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$store/data")
    assert(out.count() == 60)
    assert(out.select("lang").distinct().collect().map(_.getString(0)).toSeq == Seq("de"))
  }

  test("endpoint option makes every page a real HTTP GET; pushdown travels on the wire") {
    // a local search API: GET /search?offset=N&limit=M[&lang=xx] → JSON posts
    val requests = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val langs = Seq("en", "es", "de")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search", (exchange: com.sun.net.httpserver.HttpExchange) => {
      val q = exchange.getRequestURI.getRawQuery
      requests.add(q)
      val params = q.split('&').map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      val off = params("offset").toLong
      val lim = params("limit").toLong
      val lang = params.get("lang")
      val posts = (off until off + lim)
        .filter(i => lang.forall(_ == langs((i % 3).toInt)))
        .map { i =>
          s"""{"uri":"at://did:plc:w$i/app.bsky.feed.post/$i","cid":"c$i",""" +
            s""""did":"did:plc:w$i","text":"remote post $i",""" +
            s""""lang":"${langs((i % 3).toInt)}","createdAt":"2024-05-01T00:00:${"%02d".format(i % 60)}Z"}"""
        }.mkString("[", ",", "]")
      val bytes = posts.getBytes("UTF-8")
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/search"
    try {
      val df = spark.read.format("graft-search")
        .option("totalPosts", 120).option("pageSize", 40)
        .option("endpoint", url).load()
      val all = df.collect()
      assert(all.length == 120)
      assert(all.map(_.getAs[String]("uri")).toSet.size == 120)
      assert(requests.size == 3) // one GET per page partition (120 / 40)
      assert(all.forall(_.getAs[String]("text").startsWith("remote post")))

      // pushed predicate reaches the HTTP layer: the server only ever sees
      // lang-filtered requests and only matching rows come back
      requests.clear()
      val es = df.filter(col("lang") === "es").collect()
      assert(es.nonEmpty && es.forall(_.getAs[String]("lang") == "es"))
      assert(requests.size == 3 && requests.stream.allMatch(_.contains("lang=es")),
        requests.toString)
    } finally server.stop(0)
  }
}
