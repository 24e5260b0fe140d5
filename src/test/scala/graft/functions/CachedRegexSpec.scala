package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{RegexpCountCached, RLikeCached}

/** The cached-regex expressions must be BIT-IDENTICAL to stock
  * rlike/regexp_count — same java.util.regex engine, same find() walk,
  * same null propagation — across the pattern shapes the fan-out
  * cascade feeds them (unicode case folding, zero-width matches, empty
  * patterns, multi-match counts). The cache is an implementation detail;
  * any divergence here is a correctness bug, not a perf trade. */
class CachedRegexSpec extends SparkSpec {

  private val texts = Seq(
    "spark makes light work",
    "SPARK in caps", "ŞPARK unicode edge", "straße STRASSE",
    "aaa", "", "topic7 topic77 topic777",
    "line1\nline2 spark", "ünïcödé wörds")
  private val patterns = Seq(
    "(?iu)spark", "(?iu)topic7", "topic\\d+", "a*", "(?iu)STRASSE",
    "", "^line1", "(?iu)w[oö]rds?", "\\b\\w+\\b")

  test("rlike_cached ≡ rlike and regexp_count_cached ≡ regexp_count on a text×pattern matrix") {
    val s = spark
    import s.implicits._
    val df = texts.flatMap(t => patterns.map(p => (t, p))).toDF("t", "p")
      // non-foldable pattern COLUMN — the shape the fan-out evaluates and
      // the one stock Spark recompiles per row
      .select(col("t"), concat(col("p"), lit("")).as("p"))
    val diff = df.select(
        RLikeCached(col("t"), col("p")).as("f1"),
        regexp_like(col("t"), col("p")).as("f2"),
        RegexpCountCached(col("t"), col("p")).as("c1"),
        regexp_count(col("t"), col("p")).as("c2"))
      .filter(col("f1") =!= col("f2") || col("c1") =!= col("c2"))
    assert(diff.isEmpty, s"divergence from stock: ${diff.collect().toSeq}")
  }

  test("null text / null pattern propagate like stock") {
    val s = spark
    import s.implicits._
    val df = Seq[(Option[String], Option[String])](
      (None, Some("x")), (Some("x"), None), (None, None), (Some("x"), Some("x")))
      .toDF("t", "p")
    val rows = df.select(
        RLikeCached(col("t"), col("p")).as("f1"),
        regexp_like(col("t"), col("p")).as("f2"),
        RegexpCountCached(col("t"), col("p")).as("c1"),
        regexp_count(col("t"), col("p")).as("c2"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"rlike null divergence: $r")
      assert(r.isNullAt(2) == r.isNullAt(3), s"count null divergence: $r")
      if (!r.isNullAt(0)) assert(r.getBoolean(0) == r.getBoolean(1))
      if (!r.isNullAt(2)) assert(r.getInt(2) == r.getInt(3))
    }
  }

  test("an invalid pattern raises, like stock") {
    val s = spark
    import s.implicits._
    val bad = Seq(("x", "(" )).toDF("t", "p")
      .select(RLikeCached(col("t"), concat(col("p"), lit(""))).as("f"))
    intercept[Exception] { bad.collect() }
  }
}
