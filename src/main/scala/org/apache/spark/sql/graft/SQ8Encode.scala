package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** SQ8 scalar quantization: per-dimension affine map of a fixed-point vector
  * onto 0..255 given corpus-wide per-dimension bounds (the FAISS SQ8 layout;
  * see graft.operators.Similarity.sq8TopK). Element i is
  * `(fe(i) − mn(i)) * 255 quot (mx(i) − mn(i))`, or 0 on a degenerate
  * dimension (mx = mn). fe − mn ≥ 0 by construction of the bounds, so Java's
  * truncating division is exactly the floor/`div` the oracle SQL states.
  *
  * The `transform(sequence(...))` lambda formulation this replaces runs the
  * lambda interpreter per element per row with three element_at probes; this
  * expression is one primitive loop over the three long arrays inside
  * whole-stage codegen — the DotFp/MinHashSig pattern.
  */
case class SQ8Encode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(fe: Any, mn: Any, mx: Any): Any =
    SQ8EncodeEval.eval(fe.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData])

  // Implementation lives in SQ8EncodeEval — an object with NO companion
  // class, so scalac emits the static forwarder the generated Java needs
  // (a companion of this class would clash with the inherited
  // eval(InternalRow), get no forwarder, and janino would silently fall
  // back to the interpreter).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (fe, mn, mx) =>
      s"org.apache.spark.sql.graft.SQ8EncodeEval.eval($fe, $mn, $mx)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Fused fixed-point + SQ8 quantization straight off the raw float vector:
  * element i is `SQ8Encode(floor(x_i · 10⁶), mn, mx)` in one codegen loop,
  * so the quantize pass has NO interpreted `transform` lambda left at all —
  * each consumer scan re-derives the byte codes from the parquet floats for
  * less than the cost of materializing them. */
case class SQ8EncodeRaw(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType),
      ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sq8_encode_raw"

  override protected def nullSafeEval(vec: Any, mn: Any, mx: Any): Any =
    SQ8EncodeEval.evalRaw(vec.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (vec, mn, mx) =>
      s"org.apache.spark.sql.graft.SQ8EncodeEval.evalRaw($vec, $mn, $mx)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SQ8EncodeRaw {
  /** Column entry point: fused fixed-point + quantize of a float vector. */
  def apply(vec: Column, mn: Column, mx: Column): Column =
    ExpressionUtils.column(SQ8EncodeRaw(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(mn), ExpressionUtils.expression(mx)))
}

object SQ8Encode {
  /** Column entry point: quantize fixed-point `fe` with bounds `mn`/`mx`. */
  def apply(fe: Column, mn: Column, mx: Column): Column =
    ExpressionUtils.column(SQ8Encode(ExpressionUtils.expression(fe),
      ExpressionUtils.expression(mn), ExpressionUtils.expression(mx)))
}

object SQ8EncodeEval {
  // Clamp to the SQ8 code range: a vector inside the bounds maps to
  // [0,255] already (no-op), but a QUERY vector outside the corpus bounds
  // must saturate at the range edge — that is what an affine scalar
  // quantizer does to out-of-range inputs, and unclamped codes would break
  // every downstream assumption (byte layout, dot-product magnitude).
  private def clamp(v: Long): Long = if (v < 0L) 0L else if (v > 255L) 255L else v

  def eval(fe: ArrayData, mn: ArrayData, mx: ArrayData): ArrayData = {
    val n = fe.numElements()
    // Bounds shorter than the vector (an empty corpus, or ragged input
    // vectors truncated by the bounds aggregate) quantize the covered
    // prefix; uncovered dimensions behave like degenerate ones (code 0)
    // rather than throwing out of a codegen'd scan.
    val m = math.min(n, math.min(mn.numElements(), mx.numElements()))
    val out = new Array[Long](n)
    var i = 0
    while (i < m) {
      val lo = mn.getLong(i)
      val hi = mx.getLong(i)
      if (hi != lo) out(i) = clamp((fe.getLong(i) - lo) * 255L / (hi - lo))
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Fused: fe_i = floor(x_i · 10⁶) (the fixedPoint convention — exact for
    * |fe| < 2⁵³) computed inline, then the same affine map as [[eval]]. */
  def evalRaw(vec: ArrayData, mn: ArrayData, mx: ArrayData): ArrayData = {
    val n = vec.numElements()
    val m = math.min(n, math.min(mn.numElements(), mx.numElements()))
    val out = new Array[Long](n)
    var i = 0
    while (i < m) {
      val fe = java.lang.Math.floor(vec.getFloat(i).toDouble * 1000000d).toLong
      val lo = mn.getLong(i)
      val hi = mx.getLong(i)
      if (hi != lo) out(i) = clamp((fe - lo) * 255L / (hi - lo))
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}
