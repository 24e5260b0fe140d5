package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies of a words column (array<string>):
  * one `struct<term, tf>` per distinct non-null term, first-occurrence
  * order, in a single pass over the array.
  *
  * This is the expression form of the observation that TERM FREQUENCY IS
  * DOCUMENT-LOCAL: a document's tokens all live in its own row, so
  * `groupBy(doc, term).count()` over an exploded token stream — the
  * classic tf dataflow (reference behavior: per-post token statistics,
  * /root/reference/src/algos/starrysky.ts feed scoring counts) — shuffles
  * a corpus-sized (doc, term) stream to co-locate rows that were ALREADY
  * co-located. Counting inside the row removes that exchange and its two
  * aggregate passes from every tf consumer (tf-idf, BM25, vocabulary
  * rollups); at 100 TB the only corpus-sized shuffle left in those
  * pipelines is the VOCAB-sized docfreq aggregate, which partial
  * aggregation compresses to distinct-terms-per-partition before it
  * moves. Equality with the explode+groupBy form is spec-pinned.
  *
  * Terms hash into an open-addressing table keyed by the UTF8String
  * (reused, not copied — entries point into the input array's storage,
  * and the output copies each term exactly once). */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any =
    TermCountsEval.eval(input.asInstanceOf[ArrayData])

  // static-forwarder convention (see MinHashSig): implementation lives in
  // an object with no companion class so the generated call binds to a
  // real static method
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.TermCountsEval.eval($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  def apply(words: Column): Column =
    ExpressionUtils.column(TermCounts(ExpressionUtils.expression(words)))
}

object TermCountsEval {

  def eval(ws: ArrayData): ArrayData = {
    val size = ws.numElements()
    if (size == 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashMap: counts + stable first-occurrence order in one pass;
    // per-row term cardinality is document-sized (thousands), far below
    // any scale where the boxing here could matter next to the md5/regex
    // work upstream of it
    val counts = new java.util.LinkedHashMap[UTF8String, Long](size * 2)
    var i = 0
    while (i < size) {
      val w = ws.getUTF8String(i)
      if (w != null) counts.merge(w, 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size())
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      k += 1
    }
    new GenericArrayData(out)
  }
}
