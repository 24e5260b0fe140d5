package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Newest-first top-K serving with keyset-cursor pagination — the reference's
  * feed-page pipeline (/root/reference/src/algos/starrysky.ts:42-84)
  * re-expressed as Catalyst-friendly DataFrame ops.
  *
  * The cursor is `'<epochMicros>::<tiebreak>'`. Divergences from the
  * reference (recorded per SURVEY.md §7.4): we use the *intended* tuple
  * keyset semantics `(ts, tiebreak) < (curTs, curTiebreak)` rather than the
  * reference's mis-scoped SQL, and micros rather than millis so the cursor
  * round-trips TimestampType losslessly.
  *
  * Scale notes: topK compiles to TakeOrderedAndProject (per-partition heap +
  * driver merge — no global sort, no shuffle of the full table); the keyset
  * predicate is pushed to the parquet scan as a min/max-prunable filter.
  */
object Paging {

  val CursorSep = "::"

  /** ORDER BY tsUs DESC, tiebreak DESC LIMIT k.
    *
    * With the native flag on (default) and attribute sort columns this is
    * the keyless [[org.apache.spark.sql.graft.TopKPerKey]] plan:
    * per-partition bounded heaps, single-partition merge — the same
    * two-level shape as TakeOrderedAndProject, through the custom
    * operator ladder. Falls back to orderBy+limit (which compiles to
    * TakeOrderedAndProject) for computed columns or when disabled. Both
    * plans never sort or shuffle the full table. */
  def topK(df: DataFrame, tsUs: Column, tiebreak: Column, k: Int): DataFrame = {
    val native =
      if (NativeTopK.enabled(df))
        org.apache.spark.sql.graft.TopKPerKey.fromColumns(
          df, Nil, Seq(tsUs -> true, tiebreak -> true), k)
      else None
    native.getOrElse(df.orderBy(tsUs.desc, tiebreak.desc).limit(k))
  }

  /** Tuple keyset predicate: strictly after the cursor position in
    * (tsUs DESC, tiebreak DESC) order. `curTiebreak` is a typed literal
    * (Long for numeric tiebreaks, String for cid-style tiebreaks). */
  def keysetPredicate(tsUs: Column, tiebreak: Column, curTs: Long, curTiebreak: Any): Column =
    tsUs < curTs || (tsUs === curTs && tiebreak < lit(curTiebreak))

  /** Cursor string from the page's last (smallest-ranked) row; None for an
    * empty page — matches starrysky.ts:75-78. Driver-side single-row action
    * by design: serving pages are tiny. */
  def encodeCursor(page: DataFrame, tsUs: Column, tiebreak: Column): Option[String] = {
    val last = page.agg(min(struct(tsUs.as("t"), tiebreak.as("c"))).as("m"))
      .selectExpr("m.t", "m.c").collect()
    last.headOption.filter(r => !r.isNullAt(0))
      .map(r => s"${r.getLong(0)}$CursorSep${r.get(1)}")
  }

  /** Parse `'<micros>::<tiebreak>'`; malformed cursors raise, mirroring the
    * reference's InvalidRequestError (starrysky.ts:60-62). */
  def decodeCursor(cursor: String): (Long, String) = cursor.split(CursorSep, 2) match {
    case Array(ts, tb) if ts.nonEmpty && ts.forall(_.isDigit) && tb.nonEmpty =>
      (ts.toLong, tb)
    case _ => throw new IllegalArgumentException(s"malformed cursor: $cursor")
  }

  /** One serving page: keyset-filter (when a cursor is given) then top-K.
    * `parseTiebreak` types the cursor's tiebreak half (numeric ids pass
    * `_.toLong`; string cids use the default identity). */
  def page(df: DataFrame, tsUs: Column, tiebreak: Column, k: Int,
      cursor: Option[String], parseTiebreak: String => Any = identity): DataFrame = {
    val filtered = cursor.map(decodeCursor) match {
      case Some((t, c)) => df.filter(keysetPredicate(tsUs, tiebreak, t, parseTiebreak(c)))
      case None         => df
    }
    topK(filtered, tsUs, tiebreak, k)
  }

  /** First-page pinned-post prepend (starrysky.ts:42-48) with an explicit
    * ordinal column — Spark unions carry no order guarantee, so order is a
    * column, not an accident. `page` must already be capped at k rows.
    */
  def withOrdinal(page: DataFrame, tsUs: Column, tiebreak: Column, startAt: Long): DataFrame =
    page.withColumn(
      "ord",
      // deliberately UNPARTITIONED window: assigning a global ordinal
      // serializes by definition, and the input is ≤ k rows by contract
      // (page is the output of topK's orderBy+limit), so the single
      // partition WindowExec warns about is a k-row frame, not a scale
      // bug. WindowAuditSpec pins that these page sites stay the ONLY
      // unpartitioned windows in the catalog. (A foldable partition key
      // would not silence it — the optimizer strips constant keys.)
      (row_number().over(Window.orderBy(tsUs.desc, tiebreak.desc)) - 1)
        .cast("long") + startAt)
}
