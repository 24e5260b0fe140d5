package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native integer dot product over two array<bigint> columns — the hot
  * inner loop of fixed-point cosine similarity (graft.operators.Similarity).
  * Lives under org.apache.spark.sql.* for access to the private[sql]
  * Expression/Column bridge; the engine-facing API stays in graft.*.
  *
  * A `zip_with`+`aggregate` formulation runs the lambda interpreter per
  * element per row; this expression generates one tight primitive loop
  * inside whole-stage codegen (~10× on pairwise-similarity scans). Sum is
  * exact Long arithmetic, so results are identical to the lambda path and
  * to the DuckDB oracle's list_sum/list_transform form.
  */
case class DotFp(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_fp"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getLong(i) * y.getLong(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotFp {
  /** Column-level entry point: exact integer dot product. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DotFp(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
