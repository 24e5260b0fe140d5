package graft.operators

import org.apache.spark.sql.DataFrame

/** Session flag gating the native bounded-heap top-k physical operator
  * ([[org.apache.spark.sql.graft.TopKPerKey]]) inside Retention/Paging.
  *
  * Default ON: the heap plan strictly dominates the window-sort plan for
  * the retention/paging shapes (no per-group sort buffer, map-side partial
  * pass cuts the shuffle to survivors). The escape hatch exists so a
  * plan-level regression can be bisected from config alone:
  * `spark.conf.set("spark.graft.topk.native", "false")` restores the
  * row_number/TakeOrderedAndProject formulations.
  */
object NativeTopK {
  val Flag = "spark.graft.topk.native"

  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get(Flag, "true").toBoolean
}
