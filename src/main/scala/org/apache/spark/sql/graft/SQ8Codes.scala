package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, LongType}

/** PACKED SQ8 codes: the same per-dimension affine 0..255 quantization as
  * [[SQ8EncodeRaw]], but emitted as a `binary` of exactly `dim` bytes
  * instead of an `array<long>` of `dim` longs.
  *
  * Why a second representation exists: an UnsafeRow array<long> of 64 dims
  * costs ~530 bytes per vector; the packed binary costs 64 (+ row
  * overhead). For anything that MATERIALIZES the quantized corpus — the
  * Lloyd training loop's per-iteration working set, a checkpointed IVF
  * index, a 100 TB quantized corpus on disk — that 6–8× is the difference
  * between an in-memory working set and a storage-bound one (SCALE.md's
  * ns20/ns30 20 M-vector rows). Codes are unsigned bytes (0..255 stored as
  * the low 8 bits); every consumer masks with & 0xFF.
  *
  * The pair-scan path (ns36's sq8TopK) also rides packed codes: even
  * without materialization, the |Q|×|C| dot products are memory-bandwidth
  * bound, and 64 B/side vs ~530 measured 118 s → 47.5 s at 20 M vectors
  * (SCALE.md). The array<long> form ([[SQ8Encode]]/[[SQ8EncodeRaw]])
  * remains as the spec-pinning reference implementation the packed loops
  * are proven equal against.
  */
case class SQ8PackRaw(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType),
      ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = BinaryType

  override def prettyName: String = "sq8_pack_raw"

  override protected def nullSafeEval(vec: Any, mn: Any, mx: Any): Any =
    SQ8CodesEval.pack(vec.asInstanceOf[ArrayData], mn.asInstanceOf[ArrayData],
      mx.asInstanceOf[ArrayData])

  // static-forwarder convention (see SQ8EncodeEval): implementation lives
  // in an object with NO companion class so janino binds a real static call
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (vec, mn, mx) =>
      s"org.apache.spark.sql.graft.SQ8CodesEval.pack($vec, $mn, $mx)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SQ8PackRaw {
  def apply(vec: Column, mn: Column, mx: Column): Column =
    ExpressionUtils.column(SQ8PackRaw(ExpressionUtils.expression(vec),
      ExpressionUtils.expression(mn), ExpressionUtils.expression(mx)))
}

/** Unpack a packed code binary to `array<long>` of its unsigned byte
  * values — the bridge back to every array<long> consumer (the per-cluster
  * mean aggregation's `element_at` sums, [[graft.operators.LocalLloyd]]'s
  * collected probe). A projection step, evaluated once per row inside
  * whole-stage codegen; never materialized. */
case class CodesToLongs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "codes_to_longs"

  override protected def nullSafeEval(input: Any): Any =
    SQ8CodesEval.toLongs(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.sql.graft.SQ8CodesEval.toLongs($b)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CodesToLongs {
  def apply(codes: Column): Column =
    ExpressionUtils.column(CodesToLongs(ExpressionUtils.expression(codes)))
}

/** Exact integer dot product of two packed code binaries (unsigned bytes).
  * Identical values to DotFp over the unpacked arrays; reads 8× fewer
  * bytes per pair. */
case class DotCodes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_codes"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SQ8CodesEval.dot(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SQ8CodesEval.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotCodes {
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(DotCodes(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))
}

/** [[NearestCells]] over a packed code binary: the `nProbe` nearest
  * centroids of the unsigned-byte vector, ascending by (squared-L2
  * distance, cell id) with the same first-min tie-break. The centroid
  * matrix (k × dim longs — centroid means of codes stay integer longs,
  * driver-bounded state exactly like [[CentroidModel]]) ships once as a
  * codegen reference object. */
case class NearestCellsCodes(child: Expression, model: CentroidModel, nProbe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nProbe >= 1, "nProbe must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType,
    containsNull = false)
  override def prettyName: String = "nearest_cells_codes"

  override protected def nullSafeEval(input: Any): Any =
    SQ8CodesEval.nearestCells(input.asInstanceOf[Array[Byte]], model, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("centroidModel", model,
      classOf[CentroidModel].getName)
    defineCodeGen(ctx, ev, b =>
      s"org.apache.spark.sql.graft.SQ8CodesEval.nearestCells($b, $m, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCellsCodes {
  def apply(codes: Column, centroids: Array[Array[Long]], nProbe: Int): Column =
    ExpressionUtils.column(NearestCellsCodes(
      ExpressionUtils.expression(codes), new CentroidModel(centroids), nProbe))

  /** The common nProbe = 1 shape: the single nearest cell id as an int. */
  def nearest(codes: Column, centroids: Array[Array[Long]]): Column =
    org.apache.spark.sql.functions.element_at(apply(codes, centroids, 1), 1)
}

object SQ8CodesEval {
  private def clamp(v: Long): Long = if (v < 0L) 0L else if (v > 255L) 255L else v

  /** Fused fixedPoint + affine map + byte pack; the [[SQ8EncodeEval.evalRaw]]
    * math bit-for-bit, so `toLongs(pack(v)) == evalRaw(v)` always (spec'd). */
  def pack(vec: ArrayData, mn: ArrayData, mx: ArrayData): Array[Byte] = {
    val n = vec.numElements()
    val m = math.min(n, math.min(mn.numElements(), mx.numElements()))
    val out = new Array[Byte](n)
    var i = 0
    while (i < m) {
      val fe = java.lang.Math.floor(vec.getFloat(i).toDouble * 1000000d).toLong
      val lo = mn.getLong(i)
      val hi = mx.getLong(i)
      if (hi != lo) out(i) = clamp((fe - lo) * 255L / (hi - lo)).toByte
      i += 1
    }
    out
  }

  def toLongs(codes: Array[Byte]): ArrayData = {
    val out = new Array[Long](codes.length)
    var i = 0
    while (i < codes.length) { out(i) = codes(i) & 0xffL; i += 1 }
    ArrayData.toArrayData(out)
  }

  def dot(a: Array[Byte], b: Array[Byte]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { acc += (a(i) & 0xffL) * (b(i) & 0xffL); i += 1 }
    acc
  }

  /** Same insertion-sort ranking as [[NearestCellsEval.eval]], reading
    * unsigned bytes; ranking key cnsq − 2·dot (the |x|² term is constant
    * per row, order-identical). */
  def nearestCells(codes: Array[Byte], model: CentroidModel, nProbe: Int): ArrayData = {
    val cents = model.cents
    val cnsq = model.cnsq
    val k = cents.length
    val p = if (nProbe < k) nProbe else k
    val bestS = new Array[Long](p)
    val bestC = new Array[Int](p)
    var filled = 0
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var dot = 0L
      var i = 0
      val n = math.min(cent.length, codes.length)
      while (i < n) { dot += (codes(i) & 0xffL) * cent(i); i += 1 }
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
