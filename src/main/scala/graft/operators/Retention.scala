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

  /** Keep only the newest `n` rows per key (retention cap, S11/W1). */
  def keepNewest(df: DataFrame, key: Seq[Column], tsUs: Column, tiebreak: Column, n: Int): DataFrame =
    ranked(df, key, tsUs, tiebreak).filter(col(Rn) <= n).drop(Rn)

  /** Drop the newest `n` rows per key (refresh delete, S10/W2). */
  def dropNewest(df: DataFrame, key: Seq[Column], tsUs: Column, tiebreak: Column, n: Int): DataFrame =
    ranked(df, key, tsUs, tiebreak).filter(col(Rn) > n).drop(Rn)
}
