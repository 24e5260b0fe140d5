package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All word n-gram keys of a words column (array<string>) as 60-bit longs:
  * key = value of the first 15 hex digits of md5(words i..i+n−1 joined by
  * a single space) — bit-for-bit [[graft.operators.TextAnalysis.gramKey]]
  * (`conv(substr(md5(gram), 1, 15), 16, 10)`), which the DuckDB oracle
  * restates digit-by-digit, so hashing here keeps oracle comparisons
  * collision-identical.
  *
  * The Column-API formulation (`transform(ngramsOf(ws, n), g ⇒
  * gramKey(g))`) allocates a gram UTF8String, a 32-char hex string, and a
  * decimal parse per gram; this expression assembles each gram's UTF-8
  * bytes into one reused buffer, digests with a thread-local MessageDigest,
  * and reads the key straight off the first 8 digest bytes (15 hex digits
  * = 60 bits = first-8-bytes-big-endian >>> 4). With `distinct = true`
  * repeats WITHIN the row are dropped (for consumers like ns51's bit_or
  * aggregate that dedup globally anyway, this shrinks the explode+shuffle
  * for free; output order is first-occurrence either way). */
case class Md5GramKeys(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1 && n <= 16, "n must be in [1, 16]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_gram_keys"

  override protected def nullSafeEval(input: Any): Any =
    Md5GramKeysEval.eval(input.asInstanceOf[ArrayData], n, distinct)

  // static-forwarder convention (see MinHashSig): implementation lives in
  // an object with no companion class so the generated call binds to a
  // real static method — a companion of this case class would clash with
  // the inherited eval(InternalRow) and break janino compilation
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.Md5GramKeysEval.eval($a, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5GramKeys {
  def apply(words: Column, n: Int, distinct: Boolean = false): Column =
    ExpressionUtils.column(
      Md5GramKeys(ExpressionUtils.expression(words), n, distinct))
}

object Md5GramKeysEval {

  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def eval(ws: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val size = ws.numElements()
    if (size < n) return new GenericArrayData(Array.emptyLongArray)
    val md = digests.get()
    // per-word UTF-8 byte slices, resolved once (each gram reuses n of
    // them); a null word contributes no bytes — concat_ws semantics, which
    // skips null args but still joins its non-null neighbours
    val bytes = new Array[Array[Byte]](size)
    var i = 0
    while (i < size) {
      val w = ws.getUTF8String(i)
      bytes(i) = if (w == null) null else w.getBytes
      i += 1
    }
    val space = ' '.toByte
    val out = new Array[Long](size - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    var k = 0
    i = 0
    while (i <= size - n) {
      md.reset()
      var j = 0
      var first = true
      while (j < n) {
        val b = bytes(i + j)
        if (b != null) {
          if (!first) md.update(space)
          md.update(b)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // first 15 hex digits as a base-16 value = first 60 bits of the
      // digest = big-endian long of bytes 0..7, logically shifted off the
      // low nibble
      val key = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      if (seen == null || seen.add(key)) {
        out(k) = key
        k += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == out.length) out else out.take(k))
  }
}
