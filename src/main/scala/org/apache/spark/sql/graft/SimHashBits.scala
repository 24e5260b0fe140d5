package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Wide SimHash over a word-set column (array<string>): bit j of the
  * result is set iff a strict majority of words have md5-bit j set
  * (bit j = bit (7 - j%8) of md5 byte j/8, i.e. hex-nibble bit order —
  * the same family graft.operators.Dedup.simhash16 exposes to the DuckDB
  * oracle).
  *
  * One md5 per word, one pass — the Column-API formulation runs `bits`
  * separate interpreted list_filter passes (16× at width 16, worse wider).
  * `bits` ≤ 64; widths ≤ 62 stay SQL-oracle-safe (1 << 63 overflows
  * BIGINT arithmetic in SQL engines).
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    SimHashBitsEval.eval(input.asInstanceOf[ArrayData], bits)

  // The implementation lives in SimHashBitsEval, an object with NO companion
  // class: scalac only emits java-callable static forwarders for such
  // objects (a companion of this class would clash with the inherited
  // eval(InternalRow) and silently get none, making this call janino-
  // uncompilable and dropping the whole stage to interpreted mode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.SimHashBitsEval.eval($a, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashBits {
  def apply(words: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashBits(ExpressionUtils.expression(words), bits))
}

object SimHashBitsEval {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 64 md5 bits of the UTF-8 bytes, big-endian (bit j of the hash =
    * bit (63 - j) of the returned long). */
  def md5First64(w: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val b = md.digest(w.getBytes)
    var m = 0L
    var i = 0
    while (i < 8) { m = (m << 8) | (b(i) & 0xffL); i += 1 }
    m
  }

  def eval(words: ArrayData, bits: Int): Long = {
    val n = words.numElements()
    val cnt = new Array[Int](bits)
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val m = md5First64(w)
        var j = 0
        while (j < bits) {
          cnt(j) += ((m >>> (63 - j)) & 1L).toInt
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (2 * cnt(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }
}
