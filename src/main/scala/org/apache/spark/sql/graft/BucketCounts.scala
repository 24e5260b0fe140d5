package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row hashed-vocabulary token mass: one `buckets`-long array where
  * slot `b` counts the row's token occurrences whose 60-bit md5 gram key
  * ([[Md5GramKeys]]'s exact bit recipe, so the DuckDB oracle's
  * `conv(substr(md5(w),1,15),16,10) % buckets` lands identically) falls in
  * bucket `b`. Empty and null words contribute nothing — the `w <> ''`
  * filter both engines apply.
  *
  * This is the DSIR feature map ([[graft.operators.TextAnalysis
  * .dsirWeights]]) collapsed to ONE in-row pass: the previous shape
  * exploded (doc, term) rows and re-grouped them per doc — a corpus-sized
  * shuffle whose only purpose was this array. In-row, the scoring plane
  * is scan-only at any corpus size, and the stats plane reduces these
  * arrays with one partial aggregate. */
case class BucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1 && buckets <= 65536, "buckets must be in [1, 65536]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bucket_counts"

  override protected def nullSafeEval(input: Any): Any =
    BucketCountsEval.eval(input.asInstanceOf[ArrayData], buckets)

  // static-forwarder convention (see MinHashSig/Md5GramKeys): the
  // implementation object has no companion class, so the generated call
  // binds to a real static method
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.BucketCountsEval.eval($a, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BucketCounts {
  def apply(words: Column, buckets: Int): Column =
    ExpressionUtils.column(
      BucketCounts(ExpressionUtils.expression(words), buckets))
}

object BucketCountsEval {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def eval(ws: ArrayData, buckets: Int): ArrayData = {
    val out = new Array[Long](buckets)
    val md = digests.get()
    val size = ws.numElements()
    var i = 0
    while (i < size) {
      val w = ws.getUTF8String(i)
      if (w != null && w.numBytes() > 0) {
        md.reset()
        md.update(w.getBytes)
        val d = md.digest()
        // first 15 hex digits as a base-16 value (see Md5GramKeys): 60-bit
        // non-negative key, so plain % is already pmod
        val key = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        out((key % buckets).toInt) += 1L
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact integer dot product of two long arrays — the scoring primitive
  * that pairs a row's [[BucketCounts]] vector with a literal stats vector
  * without leaving whole-stage codegen (the higher-order
  * `aggregate(zip_with(...))` formulation is CodegenFallback, the
  * documented 3.5× batch trap). Mismatched lengths walk the shorter
  * prefix; a null side is null (standard binary null semantics). */
case class DotLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_longs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotLongsEval.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.DotLongsEval.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object DotLongs {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotLongs(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

object DotLongsEval {
  def eval(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }
}
