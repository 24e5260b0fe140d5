package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** |A ∩ B| for two SORTED, DISTINCT array<string> columns, as one merge
  * walk — the hot inner loop of pairwise Jaccard similarity.
  *
  * `size(array_intersect(a, b))` builds a hash set of one side per evaluated
  * pair (boxing every element); with the sets sorted once per document
  * upstream, the per-pair cost drops to a single O(|A|+|B|) pass of binary
  * UTF8String compares with zero allocation. Count-equivalent to the DuckDB
  * oracle's `len(list_intersect(a, b))` (order never affects the size).
  *
  * Inputs must be sorted ascending by Spark's UTF8String binary ordering
  * (what `array_sort` produces) and duplicate-free (what `array_distinct`
  * produces); nulls, if present, must sort last (array_sort's default).
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_size_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntersectSizeSortedEval.eval(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  // Implementation in IntersectSizeSortedEval — an object with no companion
  // class, so scalac emits the static forwarder this generated call needs
  // (a companion of this class would clash with the inherited
  // eval(InternalRow) and get none → janino failure → interpreted mode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.IntersectSizeSortedEval.eval($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectSizeSorted {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(IntersectSizeSorted(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

object IntersectSizeSortedEval {

  def eval(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < na && j < nb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      if (x == null || y == null) return cnt // nulls sort last; nothing left to match
      val c = x.compareTo(y)
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }
}
