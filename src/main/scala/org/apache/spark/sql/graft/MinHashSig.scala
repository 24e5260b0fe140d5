package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a word-set column (array<string>): slot i is the
  * lexicographic minimum of md5(word || ":" || i) over the words, as a
  * lowercase hex string — byte-for-byte the computation the DuckDB oracle
  * states as `list_aggregate(list_transform(w, x -> md5(x || ':i')), 'min')`
  * (hex ordering ≡ unsigned byte ordering, so comparing digests before hex
  * encoding is the same min).
  *
  * The Column-API formulation (k `transform` passes + `array_min`) runs the
  * lambda interpreter per word per slot and allocates a hex UTF8String per
  * hash; this expression makes one pass over the words, hashes into a
  * thread-local MessageDigest, and hex-encodes only the k winners.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 64, "k must be in [1, 64]")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigEval.eval(input.asInstanceOf[ArrayData], k)

  // Implementation in MinHashSigEval — an object with no companion class,
  // so scalac emits the static forwarder this generated call needs (a
  // companion of this class would clash with the inherited
  // eval(InternalRow) and get none → janino failure → interpreted mode).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.MinHashSigEval.eval($a, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  def apply(words: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(words), k))
}

object MinHashSigEval {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val salts: Array[Array[Byte]] =
    Array.tabulate(64)(i => s":$i".getBytes("UTF-8"))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Byte](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexChars((b(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(b(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def eval(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val mins = new Array[Array[Byte]](k)
    val md = digests.get()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        val wb = w.getBytes
        var s = 0
        while (s < k) {
          md.reset()
          md.update(wb)
          md.update(salts(s))
          val d = md.digest()
          if (mins(s) == null || java.util.Arrays.compareUnsigned(d, mins(s)) < 0) mins(s) = d
          s += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](k)
    var s = 0
    while (s < k) {
      out(s) = if (mins(s) == null) null else hex(mins(s))
      s += 1
    }
    new GenericArrayData(out)
  }
}
