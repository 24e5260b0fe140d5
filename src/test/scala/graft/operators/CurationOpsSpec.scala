package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ns54–ns57 curation operators: normalization-exact dedup, token-budget
  * selection, overlapping chunking, and per-domain URL stats — value-level
  * checks against hand computations plus partition invariance. */
class CurationOpsSpec extends SparkSpec {

  test("normalizedExact collapses case/punct/whitespace variants and counts raw forms") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "hello world"),
      (4L, "unique doc")).toDF("doc_id", "text")
    val got = Dedup.normalizedExact(df, "doc_id", "text")
      .orderBy("keeper")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // three raw variants share the normal form "hello world"
    assert(got.toSeq == Seq((1L, 3L, 3L), (4L, 1L, 1L)))
    // identical raw bytes are ONE raw variant
    val df2 = Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text")
    val g2 = Dedup.normalizedExact(df2, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(g2.toSeq == Seq((1L, 2L, 1L)))
  }

  test("tokenBudgetSelect admits quality-ordered docs while cum tokens fit the budget") {
    val s = spark
    import s.implicits._
    // q("the the the the") = .6*4/200 + .4*(4/4) = .412 (4 tokens)
    // q("the a x")         = .6*3/200 + .4*(2/3) ≈ .2757 (3 tokens)
    // q("x y")             = .6*2/200 + .4*0     = .006 (2 tokens)
    // quality order: d1 (cum 4), d3 (cum 7), d2 (cum 9); budget 7 keeps d1, d3
    val df = Seq(
      ("s", 1L, "the the the the"),
      ("s", 2L, "x y"),
      ("s", 3L, "the a x"),
      ("t", 4L, "lone doc here")).toDF("source", "doc_id", "text")
    val got = TextAnalysis.tokenBudgetSelect(df, "source", "doc_id", "text", 7L)
      .orderBy("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("s", 1L, 4L, 4L), ("s", 3L, 3L, 7L), ("t", 4L, 3L, 3L)))
    // sources are independent: a huge budget on one source never leaks rows
    val all = TextAnalysis.tokenBudgetSelect(df, "source", "doc_id", "text", 1000L)
    assert(all.count() == 4L)
  }

  test("chunkOverlap emits strided windows with the documented boundary shapes") {
    val s = spark
    import s.implicits._
    val text = (1 to 10).map(i => s"t$i").mkString(" ") // 10 tokens
    val df = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkOverlap(df, "doc_id", "text", size = 4, stride = 3)
      .orderBy("doc_id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: starts stop at n−size+stride = 9 → 1,4,7 (the chunk at 7
    // reaches token 10; a start at 10 would be a pure sub-slice of it);
    // doc 2 ("" → [""]) one 1-token chunk
    assert(got.toSeq == Seq(
      (1L, 0L, 1L, 4L), (1L, 1L, 4L, 4L), (1L, 2L, 7L, 4L),
      (2L, 0L, 1L, 1L)))
    // every chunk ends strictly later than its predecessor — no chunk is
    // contained in another
    val ends = got.toSeq.filter(_._1 == 1L).map(c => c._3 + c._4 - 1)
    assert(ends == ends.sorted && ends.distinct == ends)
    // content hash: chunk 1 of doc 1 is exactly tokens 4..7
    val h = TextAnalysis.chunkOverlap(df, "doc_id", "text", 4, 3)
      .filter(col("doc_id") === 1L && col("chunk_id") === 1L)
      .select("chunk_h").as[String].head()
    val expect = df.sparkSession.range(1)
      .select(md5(lit("t4 t5 t6 t7"))).as[String].head()
    assert(h == expect)
  }

  test("urlDomains aggregates docs and hits per extracted host") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a https://x.com/b and http://y.net/c"),
      (2L, "see https://x.com/z then https://x.com/w"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val got = TextAnalysis.urlDomains(df, "doc_id", "text")
      .orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("x.com", 2L, 3L), ("y.net", 1L, 1L)))
  }

  test("qualityHistogram buckets by tenth and folds the 1.0 edge into decile 9") {
    val s = spark
    import s.implicits._
    // q("x y") = .006 → decile 0; q("the a") = .406 → decile 4;
    // 200×"the" → q = 0.6·1 + 0.4·1 = 1.0 exactly → decile 9, not 10
    val df = Seq(
      ("s", "x y"), ("s", "the a"), ("s", ("the " * 200).trim),
      ("t", "x y")).toDF("source", "text")
    val got = TextAnalysis.qualityHistogram(df, "source", "text")
      .orderBy("source", "decile")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("s", 0L, 1L), ("s", 4L, 1L), ("s", 9L, 1L), ("t", 0L, 1L)))
  }

  test("curation operators are partition-invariant") {
    val s = spark
    import s.implicits._
    val df = (0L until 40L).map(i =>
      (s"src${i % 3}", i, s"the a tok$i " + ("w " * (i % 7).toInt).trim))
      .toDF("source", "doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) = (
      Dedup.normalizedExact(d, "doc_id", "text").orderBy("h").collect().toSeq,
      TextAnalysis.tokenBudgetSelect(d, "source", "doc_id", "text", 30L)
        .orderBy("source", "doc_id").collect().toSeq,
      TextAnalysis.chunkOverlap(d, "doc_id", "text", 3, 2)
        .orderBy("doc_id", "chunk_id").collect().toSeq)
    assert(run(df) == run(df.repartition(7)))
  }

  test("dsirWeights: all-target corpus scores 1.0, no-target 0.0, mixed stays ordered in [0,1]") {
    val s = spark
    import s.implicits._
    def mk(rows: (Long, String, Boolean)*) =
      rows.toSeq.toDF("doc_id", "text", "tgt")
    def weights(df: org.apache.spark.sql.DataFrame, key: String) =
      TextAnalysis.dsirWeights(df, "doc_id", "text", col("tgt"), 256, key)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // every doc in the target: target counts == raw counts in every bucket
    weights(mk((1L, "aa bb cc", true), (2L, "bb cc dd", true)), "dsir-spec-all-curation-ops")
      .foreach { case (_, (num, den, w)) => assert(num == den && w == 1.0) }
    // empty target: num = 0 everywhere
    weights(mk((1L, "aa bb", false), (2L, "cc dd", false)), "dsir-spec-none-curation-ops")
      .foreach { case (_, (num, _, w)) => assert(num == 0L && w == 0.0) }
    // mixed: a doc speaking ONLY the target's vocabulary outranks one
    // sharing nothing with it (md5 buckets may collide, but 3 words into
    // 256 buckets collide with prob ~2%; vocabularies here are disjoint)
    val ws = weights(mk(
      (1L, "aa bb aa", true), (2L, "aa bb", false), (3L, "xx yy zz", false)),
      "dsir-spec-mix-curation-ops").toMap
    assert(ws.values.forall { case (num, den, w) => num <= den && w >= 0.0 && w <= 1.0 })
    assert(ws(2L)._3 > ws(3L)._3)
    assert(ws(3L)._3 == 0.0)
  }

  test("dsirSample: weight-1 docs always kept, weight-0 docs never, sample is a weights subset") {
    val s = spark
    import s.implicits._
    val df = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "aa bb cc" else "xx yy zz", i % 2 == 0))
      .toDF("doc_id", "text", "tgt")
    val key = "dsir-spec-sample-curation-ops"
    val all = TextAnalysis.dsirWeights(df, "doc_id", "text", col("tgt"), 256, key)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val kept = TextAnalysis.dsirSample(df, "doc_id", "text", col("tgt"), 256, key)
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all.keySet))
    all.foreach { case (id, w) =>
      if (w == 1.0) assert(kept.contains(id), s"doc $id weight 1.0 must be kept")
      if (w == 0.0) assert(!kept.contains(id), s"doc $id weight 0.0 must be dropped")
    }
    // determinism: the same frame samples identically twice
    val kept2 = TextAnalysis.dsirSample(df, "doc_id", "text", col("tgt"), 256, key)
      .collect().map(_.getLong(0)).toSet
    assert(kept == kept2)
  }
}
