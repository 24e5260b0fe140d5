package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class InDoc(doc_id: Long, text: String)

class DsirStreamSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("publish/model round-trips the stats; a refit flips the pointer") {
    val s = spark
    import s.implicits._
    val store = tmp("dsir-store")
    val corpus = Seq((1L, "aa bb", true), (2L, "cc dd", false))
      .toDF("doc_id", "text", "tgt")
    val m1 = DsirStream.publish(spark, store, corpus, "text", col("tgt"), 64)
    assert(DsirStream.model(spark, store) == m1)
    assert(m1.raw.sum == 4L && m1.tgt.sum == 2L && m1.buckets == 64)
    // refit on a grown corpus: the pointer must serve the NEW stats
    val m2 = DsirStream.publish(spark, store,
      corpus.union(Seq((3L, "aa aa", true)).toDF("doc_id", "text", "tgt")),
      "text", col("tgt"), 64)
    assert(DsirStream.model(spark, store) == m2)
    assert(m2.raw.sum == 6L && m2.tgt.sum == 4L)
  }

  test("streamed screen equals the batch dsirSample on the same model") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val store = tmp("dsir-store2")
    // fit corpus: even ids speak the target vocabulary
    val fitCorpus = (1L to 30L).map(i =>
      (i, if (i % 2 == 0) "aa bb cc" else "xx yy zz", i % 2 == 0))
      .toDF("doc_id", "text", "tgt")
    val m = DsirStream.publish(spark, store, fitCorpus, "text", col("tgt"), 256)

    // arrivals (ids disjoint from the fit corpus exercise the draw alone)
    val arrivals = (100L to 139L).map(i =>
      InDoc(i, if (i % 2 == 0) "aa bb cc" else "xx yy zz"))
    val expected = DsirStream
      .screen(arrivals.toDF(), "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    // target-vocab arrivals score 1.0 → ALWAYS kept; off-vocab score 0.0
    // → always dropped, so the expectation is structurally nonempty
    assert(expected.nonEmpty && expected.forall(_ % 2 == 0))

    val out = tmp("dsir-out")
    val ckpt = tmp("dsir-ckpt")
    val stream = MemoryStream[InDoc]
    val q = DsirStream.run(stream.toDF(), store, "doc_id", "text", out, ckpt)
    stream.addData(arrivals.take(20): _*)
    q.processAllAvailable()
    stream.addData(arrivals.drop(20): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(got == expected)
    // and the survivors carry the scores the batch scorer assigns
    val w = spark.read.parquet(out).select("doc_id", "weight").as[(Long, Double)]
      .collect().toMap
    assert(w.values.forall(_ == 1.0))
  }

  test("model() on a never-published store fails with a pointed message; " +
      "null-text arrivals are dropped by the screen") {
    val s = spark
    import s.implicits._
    val empty = tmp("dsir-empty")
    val e = intercept[IllegalArgumentException](DsirStream.model(spark, empty))
    assert(e.getMessage.contains("publish"))
    val store = tmp("dsir-null")
    val m = DsirStream.publish(spark, store,
      Seq((1L, "aa bb", true)).toDF("doc_id", "text", "tgt"), "text", col("tgt"), 64)
    val batch = Seq((10L, "aa bb"), (11L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kept = DsirStream.screen(batch, "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L))
  }

  test("the screened file sink is exactly-once across a query restart") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val store = tmp("dsir-store-rs")
    DsirStream.publish(spark, store,
      Seq((1L, "aa bb", true)).toDF("doc_id", "text", "tgt"), "text", col("tgt"), 64)
    val out = tmp("dsir-out-rs")
    val ckpt = tmp("dsir-ckpt-rs")
    // all arrivals speak the target vocabulary → weight 1.0, all kept;
    // what's under test is the sink's commit log, not the draw
    val stream = MemoryStream[InDoc]
    val q1 = DsirStream.run(stream.toDF(), store, "doc_id", "text", out, ckpt)
    stream.addData((1L to 10L).map(i => InDoc(i, "aa bb")): _*)
    q1.processAllAvailable()
    q1.stop()
    // restart against the SAME checkpoint and output dir; the new batch
    // must land exactly once and batch 1 must not re-land
    val q2 = DsirStream.run(stream.toDF(), store, "doc_id", "text", out, ckpt)
    stream.addData((11L to 20L).map(i => InDoc(i, "aa bb")): _*)
    q2.processAllAvailable()
    q2.stop()
    val got = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == (1L to 20L))
  }

  test("a minWeight floor turns the draw into a quality gate") {
    val s = spark
    import s.implicits._
    val store = tmp("dsir-store3")
    // mixed-vocab docs land a fractional weight under a half-target fit
    val fitCorpus = Seq(
      (1L, "aa bb", true), (2L, "xx yy", false)).toDF("doc_id", "text", "tgt")
    val m = DsirStream.publish(spark, store, fitCorpus, "text", col("tgt"), 256)
    val batch = Seq((10L, "aa xx"), (11L, "aa bb"), (12L, "xx yy"))
      .toDF("doc_id", "text")
    val scored = DsirStream.score(batch, "doc_id", "text", m)
      .select("doc_id", "weight").as[(Long, Double)].collect().toMap
    assert(scored(10L) == 0.5 && scored(11L) == 1.0 && scored(12L) == 0.0)
    val gated = DsirStream.screen(batch, "doc_id", "text", m, minWeight = 0.9)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == Set(11L)) // 0.5 survives the draw only; the floor cuts it
  }
}
