package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** The centroid matrix a [[NearestCells]] expression ranks against, shipped
  * to executors ONCE as a codegen reference object instead of being
  * unrolled into per-centroid literal expressions. |c|² is precomputed per
  * centroid, so each row costs exactly k·dim multiply-adds. */
final class CentroidModel(val cents: Array[Array[Long]]) extends Serializable {
  val cnsq: Array[Long] = cents.map(_.map(v => v * v).sum)
}

/** The `nProbe` nearest centroids of a fixed-point vector (array<long>), as
  * cell indices ascending by (squared-L2 distance, cell id) — exactly the
  * `sort_array(array(struct(d, c), …))` ordering of the unrolled Column
  * formulation, including its first-min tie-break (equal distances rank
  * the LOWER cell first).
  *
  * Why an expression and not `array_min` / `sort_array` over per-centroid
  * `distSq` columns: k centroid literals × dim elements unroll into a plan
  * whose generated code grows with k·dim — at k = 16, dim = 64 each
  * consumer stage is already megabytes of janino source (compile time
  * dominated 2 M-row runs measured here; fallback to interpreted mode past
  * the 64 KB method limit), and a production coarse quantizer with k ≈
  * √n ≈ 4096 cells could never plan at all. Here the matrix rides ONE
  * reference object and codegen emits a single static call.
  *
  * Ranking key is cnsq − 2·(x·c), not the full |x−c|²: the |x|² term is
  * constant per row, so the order (ties included) is identical and the
  * per-row norm column the unrolled form needed disappears.
  */
case class NearestCells(child: Expression, model: CentroidModel, nProbe: Int)
    extends UnaryExpression {
  require(nProbe >= 1, "nProbe must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(input: Any): Any =
    NearestCellsEval.eval(input.asInstanceOf[ArrayData], model, nProbe)

  // static-forwarder convention (see MinHashSig): implementation lives in
  // an object with no companion class so the generated call binds to a
  // real static method; the model is attached as a codegen reference
  // object, NOT serialized into the source text
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidModel", model,
      classOf[CentroidModel].getName)
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.NearestCellsEval.eval($a, $m, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCells {
  def apply(fe: Column, centroids: Array[Array[Long]], nProbe: Int): Column =
    ExpressionUtils.column(NearestCells(
      ExpressionUtils.expression(fe), new CentroidModel(centroids), nProbe))

  /** The common nProbe = 1 shape: the single nearest cell id as an int. */
  def nearest(fe: Column, centroids: Array[Array[Long]]): Column =
    org.apache.spark.sql.functions.element_at(apply(fe, centroids, 1), 1)
}

object NearestCellsEval {

  def eval(fe: ArrayData, model: CentroidModel, nProbe: Int): ArrayData = {
    val cents = model.cents
    val cnsq = model.cnsq
    val k = cents.length
    val p = if (nProbe < k) nProbe else k
    // insertion sort into fixed (score, cell) arrays, ascending; scanning
    // cells in ascending order with strict comparisons reproduces the
    // (d, c) struct-sort tie-break exactly
    val bestS = new Array[Long](p)
    val bestC = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var dot = 0L
      var i = 0
      val n = cent.length
      while (i < n) { dot += fe.getLong(i) * cent(i); i += 1 }
      val s = cnsq(c) - 2L * dot
      if (filled < p || s < bestS(filled - 1)) {
        var j = if (filled < p) filled else p - 1
        while (j > 0 && bestS(j - 1) > s) {
          bestS(j) = bestS(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestS(j) = s
        bestC(j) = c
        if (filled < p) filled += 1
      }
      c += 1
    }
    new GenericArrayData(
      if (filled == p) bestC else java.util.Arrays.copyOf(bestC, filled))
  }
}
