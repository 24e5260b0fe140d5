package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left event, the latest right event at-or-before it
  * (per key) — the attribution primitive of event pipelines ("which view
  * preceded this purchase").
  *
  * Implemented with the union trick rather than a range join: tag both
  * sides, one per-key sort, then `last(..., ignoreNulls)` over the ordered
  * stream. One hash shuffle on the key, no range-predicate pair explosion
  * — the formulation that survives 100 TB (a theta/range join would
  * enumerate pairs; this is linear in rows per key).
  *
  * Tie semantics: INCLUSIVE — a right row at exactly the left row's
  * timestamp is visible (right sorts before left on ties).
  */
object AsOfJoin {

  /** Inputs are slim frames (key, tsUs, id); output one row per left row:
    * (id, key, ts_us, matched_id, matched_ts_us) with nulls when no right
    * row precedes. */
  def lastAtOrBefore(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String): DataFrame = {
    val l = left.select(col(keyCol).as("key"), col(tsCol).as("ts_us"),
      col(idCol).as("id"), lit(1).as("__side"))
    val r = right.select(col(keyCol).as("key"), col(tsCol).as("ts_us"),
      col(idCol).as("id"), lit(0).as("__side"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts_us"), col("__side"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match_id",
        last(when(col("__side") === 0, col("id")), ignoreNulls = true).over(w))
      .withColumn("__match_ts",
        last(when(col("__side") === 0, col("ts_us")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("id"), col("key"), col("ts_us"),
        col("__match_id").as("matched_id"), col("__match_ts").as("matched_ts_us"))
  }
}
