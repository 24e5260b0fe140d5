package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based per-key retention and ordered deletes — the reference's
  * refresh/cap behaviors (/root/reference/src/subscription.ts:143-169 and
  * :379-393) as window ranks instead of ORDER BY ... LIMIT deletes.
  *
  * Scale notes: one hash shuffle on the partition key, then a per-key sort
  * inside each partition; no global sort and no driver involvement. AQE
  * splits skewed keys. This is the foreachBatch retention step at 100 TB.
  */
object Retention {

  private val Rn = "__graft_rn"

  private def ranked(df: DataFrame, key: Seq[Column], tsUs: Column, tiebreak: Column): DataFrame =
    df.withColumn(Rn, row_number().over(
      Window.partitionBy(key: _*).orderBy(tsUs.desc, tiebreak.desc)))

  /** Keep only the newest `n` rows per key (retention cap, S11/W1).
    *
    * Routed through the native bounded-heap operator
    * ([[org.apache.spark.sql.graft.TopKPerKey]]) when the flag is on
    * (default) and the key/order columns are plain attributes: one
    * map-side partial heap cuts each partition to ≤ keys×n rows before the
    * shuffle, and the final heap replaces the per-key sort — O(rows log n)
    * and no sort buffer, against the window plan's full per-key sort.
    * Computed columns (or the flag off) fall back to the window rank. */
  def keepNewest(df: DataFrame, key: Seq[Column], tsUs: Column, tiebreak: Column, n: Int): DataFrame = {
    val native =
      if (NativeTopK.enabled(df))
        org.apache.spark.sql.graft.TopKPerKey.fromColumns(
          df, key, Seq(tsUs -> true, tiebreak -> true), n)
      else None
    native.getOrElse(ranked(df, key, tsUs, tiebreak).filter(col(Rn) <= n).drop(Rn))
  }

  /** Drop the newest `n` rows per key (refresh delete, S10/W2). */
  def dropNewest(df: DataFrame, key: Seq[Column], tsUs: Column, tiebreak: Column, n: Int): DataFrame =
    ranked(df, key, tsUs, tiebreak).filter(col(Rn) > n).drop(Rn)
}
