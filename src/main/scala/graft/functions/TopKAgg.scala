package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K typed Aggregator: keeps the K largest (sortKey, tiebreak,
  * payload) tuples per group in an insertion-bounded buffer. The window
  * formulation (`row_number over (partition by key order by ...)`) sorts
  * EVERY row of every key; this aggregator carries at most K rows per
  * group through the map-side combine — the retention/top-K form that
  * survives keys with millions of rows (SURVEY W1/K1 at 100 TB).
  *
  * Ordering: (sortKey DESC, tiebreak DESC) — newest-first with the
  * deterministic tiebreak, same as graft.operators.{Retention, Paging}.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long, String), Seq[(Long, Long, String)], Seq[(Long, Long, String)]] {

  private def ord: Ordering[(Long, Long, String)] =
    Ordering.by(t => (-t._1, -t._2))

  private def bound(s: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    s.sorted(ord).take(k)

  override def zero: Seq[(Long, Long, String)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long, String)], row: (Long, Long, String)): Seq[(Long, Long, String)] =
    if (buf.size < k) bound(buf :+ row)
    else {
      // buf is sorted best-first; drop the row unless it beats the worst
      val worst = buf.last
      if (ord.gteq(row, worst)) buf else bound(buf :+ row)
    }

  override def merge(a: Seq[(Long, Long, String)], b: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] =
    bound(a ++ b)

  override def finish(buf: Seq[(Long, Long, String)]): Seq[(Long, Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long, String)]] =
    ExpressionEncoder[Seq[(Long, Long, String)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, String)]] =
    ExpressionEncoder[Seq[(Long, Long, String)]]()
}

object TopKAgg {
  /** top_k(sortKey, tiebreak, payload): array of the K largest tuples,
    * newest-first. */
  def topK(sortKey: Column, tiebreak: Column, payload: Column, k: Int): Column =
    udaf(new TopKAgg(k)).apply(sortKey, tiebreak, payload)
}
