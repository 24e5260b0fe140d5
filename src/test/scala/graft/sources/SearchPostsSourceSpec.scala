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
}
