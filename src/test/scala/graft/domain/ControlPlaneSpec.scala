package graft.domain

import java.nio.file.Files

import graft.SparkSpec
import graft.model.{Condition, ConditionStore}

class ControlPlaneSpec extends SparkSpec {

  test("condition restore: JSON load, validation gate, defaults (S6)") {
    val dir = Files.createTempDirectory("graft-conds").toString
    val json = Seq(
      // valid, minimal → defaults kick in
      """{"key":"k1","recordName":"feed-one","query":"spark","inputRegex":"spark|vector"}""",
      // valid with extras
      """{"key":"k2","recordName":"feed-two","query":"q","inputRegex":"x","labelDisable":"true","limitCount":50,"privateFeed":"did:a,did:b"}""",
      // invalid recordName → dropped
      """{"key":"k3","recordName":"BAD NAME","query":"q","inputRegex":"x"}""",
      // uncompilable regex → dropped
      """{"key":"k4","recordName":"feed-four","query":"q","inputRegex":"(unclosed"}""",
    )
    Files.writeString(java.nio.file.Paths.get(s"$dir/conds.json"), json.mkString("\n"))
    val loaded = ConditionStore.load(spark, s"$dir/conds.json")
    assert(loaded.map(_.key).sorted == Seq("k1", "k2"))
    val k1 = loaded.find(_.key == "k1").get
    assert(k1.initPost == 100 && k1.limitCount == 2000 && !k1.labelDisable)
    val k2 = loaded.find(_.key == "k2").get
    assert(k2.labelDisable && k2.limitCount == 50 && k2.privateFeed == Seq("did:a", "did:b"))
  }

  test("remote Admin-Console restore: POST contract, validation gate, defaults, fallbacks (S6)") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    var seenPath: String = null
    var seenBody: String = null
    var status = 200
    var body =
      """{"result":"OK","resultRecord":[
        |{"key":"r1","recordName":"remote-one","query":"spark","inputRegex":"spark|vector"},
        |{"key":"r2","recordName":"remote-two","query":"q","inputRegex":"x",
        | "labelDisable":"true","limitCount":"50","initPost":"0","privateFeed":"did:a,did:b"},
        |{"key":"r3","recordName":"BAD NAME","query":"q","inputRegex":"x"},
        |{"key":"r4","recordName":"remote-four","query":"q","inputRegex":"(unclosed"}
        |]}""".stripMargin
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      seenPath = exchange.getRequestURI.getPath
      seenBody = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
      val out = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(status, out.length)
      exchange.getResponseBody.write(out)
      exchange.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}"
    try {
      val restored = ConditionStore.restoreRemote(url, "https://feeds.example.com")
      // wire contract: POST {"serverUrl":…} to /api/getD1Query
      assert(seenPath == "/api/getD1Query")
      assert(seenBody.contains("\"serverUrl\":\"https://feeds.example.com\""))
      // r3 (recordName) and r4 (regex) fall to the same validation gate
      // as the file path; string-typed D1 ints parse; initPost "0" → 100
      assert(restored.map(_.key).sorted == Seq("r1", "r2"))
      val r1 = restored.find(_.key == "r1").get
      assert(r1.initPost == 100 && r1.limitCount == 2000 && !r1.labelDisable)
      val r2 = restored.find(_.key == "r2").get
      assert(r2.labelDisable && r2.limitCount == 50 && r2.initPost == 100)
      assert(r2.privateFeed == Seq("did:a", "did:b"))

      // local rows win on key conflict (insert-on-conflict-ignore)
      val local = Seq(Fixtures.cond(key = "r1", limitCount = 7))
      val merged = ConditionStore.mergeRestore(local, restored)
      assert(merged.map(_.key).sorted == Seq("r1", "r2"))
      assert(merged.find(_.key == "r1").get.limitCount == 7)

      // non-OK result, malformed JSON, non-2xx: each restores nothing
      body = """{"result":"NG"}"""
      assert(ConditionStore.restoreRemote(url, "https://x").isEmpty)
      body = "not json at all"
      assert(ConditionStore.restoreRemote(url, "https://x").isEmpty)
      body = "{}"; status = 500
      assert(ConditionStore.restoreRemote(url, "https://x").isEmpty)
    } finally server.stop(0)
    // unreachable console: clean fallback to nothing (caller keeps local)
    assert(ConditionStore.restoreRemote(url, "https://x", timeoutMs = 500).isEmpty)
  }

  test("merge restore is insert-on-conflict-ignore; setQuery is full replace") {
    val existing = Seq(Fixtures.cond(key = "k1", limitCount = 7))
    val restored = Seq(Fixtures.cond(key = "k1", limitCount = 999), Fixtures.cond(key = "k2"))
    val merged = ConditionStore.mergeRestore(existing, restored)
    assert(merged.map(_.key).sorted == Seq("k1", "k2"))
    assert(merged.find(_.key == "k1").get.limitCount == 7) // existing wins
    val replaced = ConditionStore.setQuery(merged, Fixtures.cond(key = "k1", limitCount = 123))
    assert(replaced.find(_.key == "k1").get.limitCount == 123)
  }

  test("streaming restart resumes from the checkpointed offset (T4/T5)") {
    val base = Files.createTempDirectory("graft-restart").toString
    def runStream(totalPosts: Int): Unit = {
      val q = spark.readStream.format("graft-search")
        .option("totalPosts", totalPosts).load()
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(s"$base/data")
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runStream(200)
    assert(spark.read.parquet(s"$base/data").count() == 200)
    // "reconnect": new query, same checkpoint, more data upstream
    runStream(300)
    val out = spark.read.parquet(s"$base/data")
    assert(out.count() == 300) // resumed at 200, not re-read from 0
    assert(out.select("uri").distinct().count() == 300)
  }
}
