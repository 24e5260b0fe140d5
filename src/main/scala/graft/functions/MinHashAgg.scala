package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing a k-hash MinHash sketch over a GROUP of
  * documents — the distributive sketch form of graft.operators.Dedup's
  * per-document signature: sketch(group) = elementwise min over member
  * signatures = signature of the union of the word sets. Partial
  * aggregation (map-side combine) is free: merge is elementwise min.
  *
  * Hash family is identical to Dedup.minhashSig (md5(word + ":" + i) hex),
  * so sketches are comparable across the two paths and against the DuckDB
  * oracle's min(md5(...)) formulation.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[String], Seq[String]] {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def minMerge(a: Array[String], b: Array[String]): Array[String] =
    a.zip(b).map { case (x, y) =>
      if (x == null) y else if (y == null) x else if (x <= y) x else y
    }

  override def zero: Array[String] = Array.fill(k)(null)

  override def reduce(buf: Array[String], text: String): Array[String] = {
    if (text == null) return buf
    val words = text.toLowerCase.split(" ").distinct
    val sig = Array.tabulate(k) { i =>
      var m: String = null
      words.foreach { w =>
        val h = md5hex(s"$w:$i")
        if (m == null || h < m) m = h
      }
      m
    }
    minMerge(buf, sig)
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = minMerge(a, b)

  override def finish(buf: Array[String]): Seq[String] = buf.toSeq

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()

  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object MinHashAgg {
  /** Column-level entry: minhash_sketch(text) over a group. */
  def sketch(text: Column, k: Int = 8): Column = udaf(new MinHashAgg(k)).apply(text)
}
