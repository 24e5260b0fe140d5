package graft.functions

import graft.SparkSpec
import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TermCounts

class TermCountsSpec extends SparkSpec {

  test("in-row term counts equal the explode + groupBy(doc, term) form on real documents") {
    val docs = Tables(spark, sf0001).documents
    val viaExpr = docs
      .select(col("doc_id"), explode(TermCounts(TextAnalysis.words(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      .filter(col("term") =!= "")
    val viaAgg = docs
      .select(col("doc_id"), explode(TextAnalysis.words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    assert(viaExpr.exceptAll(viaAgg).isEmpty && viaAgg.exceptAll(viaExpr).isEmpty,
      "TermCounts must be row-for-row the classic tf aggregate")
  }

  test("edge shapes: repeats, empty tokens, empty array, null words") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "a", "a")), // repeats keep first-occurrence order
      (2L, Seq("", "", "x")),        // empty-string tokens are counted (filtering is the caller's)
      (3L, Seq.empty[String]),       // no tokens -> no rows after explode
    ).toDF("id", "ws")
    val got = df.select(col("id"), TermCounts(col("ws")).as("tc"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getString(0), t.getLong(1)))).toMap
    assert(got(1L) == Seq(("a", 3L), ("b", 1L)))
    assert(got(2L) == Seq(("", 2L), ("x", 1L)))
    assert(got(3L) == Seq.empty)
    // null array -> null result (UnaryExpression null propagation)
    val nullRow = df.sparkSession.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS ws")
      .select(TermCounts(col("ws")).as("tc")).head()
    assert(nullRow.isNullAt(0))
  }
}
