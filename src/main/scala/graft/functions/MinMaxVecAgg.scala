package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator computing elementwise min AND max of an array<float>
  * column in one pass — the per-dimension bounds a scalar quantizer (SQ8)
  * needs. One aggregate expression instead of 2×dim `min(element_at(...))`
  * columns: the wide-agg form costs Catalyst real per-query analysis/codegen
  * time on a 64-dim vector and dominates small-corpus latency. Merge is
  * elementwise min/max, so partial aggregation (map-side combine) is free
  * and the shuffled state is one 2×dim row per partition regardless of
  * corpus size — the same scale shape as the wide form.
  */
class MinMaxVecAgg extends Aggregator[Seq[Float], (Array[Float], Array[Float]), (Seq[Float], Seq[Float])] {

  override def zero: (Array[Float], Array[Float]) = (null, null)

  override def reduce(buf: (Array[Float], Array[Float]), vec: Seq[Float]): (Array[Float], Array[Float]) = {
    if (vec == null) return buf
    if (buf._1 == null) {
      val a = vec.toArray
      return (a.clone(), a.clone())
    }
    val (mn, mx) = buf
    var i = 0
    val n = math.min(mn.length, vec.length)
    while (i < n) {
      val v = vec(i)
      if (v < mn(i)) mn(i) = v
      if (v > mx(i)) mx(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: (Array[Float], Array[Float]), b: (Array[Float], Array[Float])): (Array[Float], Array[Float]) = {
    if (a._1 == null) return b
    if (b._1 == null) return a
    var i = 0
    val n = math.min(a._1.length, b._1.length)
    while (i < n) {
      if (b._1(i) < a._1(i)) a._1(i) = b._1(i)
      if (b._2(i) > a._2(i)) a._2(i) = b._2(i)
      i += 1
    }
    a
  }

  override def finish(buf: (Array[Float], Array[Float])): (Seq[Float], Seq[Float]) =
    (if (buf._1 == null) Nil else buf._1.toSeq, if (buf._2 == null) Nil else buf._2.toSeq)

  override def bufferEncoder: Encoder[(Array[Float], Array[Float])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Float], Array[Float])]()

  override def outputEncoder: Encoder[(Seq[Float], Seq[Float])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Float], Seq[Float])]()
}

object MinMaxVecAgg {
  /** Column entry: struct(_1 = elementwise min, _2 = elementwise max). */
  def bounds(vec: Column): Column = udaf(new MinMaxVecAgg).apply(vec)
}
