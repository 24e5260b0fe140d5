package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The source-overlap fan-out of one gram's source bitmask, as packed int
  * codes: for every set bit `a` one SIZES code `a<<6` (decoded b = −1),
  * and for every ascending set-bit pair `a < b` one PAIRS code
  * `a<<6 | (b+1)`. Decode is `a = code >> 6`, `b = (code & 63) − 1` —
  * both codegen-able arithmetic on the grouping side.
  *
  * Exists because the Column-API formulation (`sequence` → two
  * `transform`s → `filter` → `slice` → `named_struct` → `concat` →
  * `flatten`) runs INTERPRETED — higher-order functions don't
  * participate in whole-stage codegen — and was measured at ~50 s of the
  * ns51 2 M-doc wall (≈ 0.4 µs × 112 M masks × ~10 lambda frames each).
  * One native pass over the set bits emits the identical multiset of
  * (a, b) keys with no per-row lambda machinery and no struct
  * allocations (the int array goes out as a primitive
  * [[GenericArrayData]]).
  *
  * Only valid for ≤ 63 sources (6-bit fields) — the same bound as the
  * bitmask representation itself; [[graft.operators.TextAnalysis
  * .sourceOverlap]] falls back to sorted sets beyond that. */
case class MaskPairCodes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "mask_pair_codes"

  override protected def nullSafeEval(input: Any): Any =
    MaskPairCodesEval.eval(input.asInstanceOf[Long])

  // static-forwarder convention (see Md5GramKeys): implementation lives in
  // an object with no companion class so the generated call binds to a
  // real static method
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, m =>
      s"org.apache.spark.sql.graft.MaskPairCodesEval.eval($m)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaskPairCodes {
  def apply(mask: Column): Column =
    ExpressionUtils.column(MaskPairCodes(ExpressionUtils.expression(mask)))
}

object MaskPairCodesEval {

  def eval(mask: Long): ArrayData = {
    val k = java.lang.Long.bitCount(mask)
    val bits = new Array[Int](k)
    var m = mask
    var i = 0
    while (m != 0) {
      bits(i) = java.lang.Long.numberOfTrailingZeros(m)
      m &= m - 1 // clear lowest set bit → positions come out ascending
      i += 1
    }
    val out = new Array[Int](k + k * (k - 1) / 2)
    var p = 0
    i = 0
    while (i < k) { // sizes rows first, then pairs — explode feeds an
      out(p) = bits(i) << 6 // aggregate, so order is immaterial anyway
      p += 1
      i += 1
    }
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        out(p) = (bits(i) << 6) | (bits(j) + 1)
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
