package graft.sources

import graft.SparkSpec
import graft.model.Condition
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

class FirehoseSpec extends SparkSpec {

  private def raw(lines: String*) = {
    val s = spark
    import s.implicits._
    lines.toDF("value")
  }

  private val postCreate =
    """{"seq":1,"action":"create","collection":"app.bsky.feed.post","uri":"at://a/1","cid":"c1",
      |"author":"did:plc:x","record":{"text":"spark rocks","createdAt":"2024-03-01 10:00:00","langs":["en"]}}"""
      .stripMargin.replace("\n", "")
  private val likeCreate =
    """{"seq":2,"action":"create","collection":"app.bsky.feed.like","uri":"at://a/2","cid":"c2","author":"did:plc:y"}"""
  private val postDelete =
    """{"seq":3,"action":"delete","collection":"app.bsky.feed.post","uri":"at://a/1","cid":"","author":"did:plc:x"}"""
  private val corrupt = """{"seq": not json at all"""
  private val unknownCollection =
    """{"seq":4,"action":"create","collection":"com.example.other","uri":"at://a/9","cid":"c9","author":"did:plc:z"}"""

  test("decode keeps valid ops, drops corrupt and unknown-collection messages (S2-S4)") {
    val ops = Firehose.decode(raw(postCreate, likeCreate, postDelete, corrupt, unknownCollection))
    assert(ops.count() == 3)
    assert(Firehose.creates(ops, "app.bsky.feed.post").count() == 1)
    assert(Firehose.creates(ops, "app.bsky.feed.like").count() == 1)
    assert(Firehose.deletes(ops, "app.bsky.feed.post")
      .collect().map(_.getString(0)).toSeq == Seq("at://a/1"))
  }

  test("post creates route through the cascade as PostViews") {
    val ops = Firehose.decode(raw(postCreate, likeCreate))
    val pv = Firehose.postViews(ops)
    val stored = Ingest.processBatch(spark, Ingest.emptyStore(spark), pv,
      Seq(graft.domain.Fixtures.cond(key = "fh")), None)
    val rows = stored.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("uri") == "at://a/1")
    assert(rows.head.getAs[String]("key") == "fh")
  }

  test("search source hits flow end-to-end: DSv2 scan -> cascade -> store") {
    val hits = spark.read.format("graft-search")
      .option("totalPosts", 400).load().filter(col("lang") === "en")
    val pv = Firehose.searchHitsAsPostViews(hits)
    val stored = Ingest.processBatch(spark, Ingest.emptyStore(spark), pv,
      Seq(graft.domain.Fixtures.cond(key = "s1", inputRegex = "spark|vector")), None)
    assert(stored.count() > 0)
    assert(stored.select("key").distinct().head().getString(0) == "s1")
    // idempotent re-ingest
    val again = Ingest.processBatch(spark, stored, pv,
      Seq(graft.domain.Fixtures.cond(key = "s1", inputRegex = "spark|vector")), None)
    assert(again.isEmpty)
  }

  test("dot_fp is registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT dot_fp(array(1L,2L,3L), array(4L,5L,6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }
}
