package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for self-join build sides.
  *
  * The pair-join operators materialize signatures with `localCheckpoint`,
  * which wipes Catalyst size statistics — AQE then can't pick a broadcast
  * join on its own, and an unconditional `broadcast()` hint would OOM the
  * executors once the corpus outgrows driver memory. Since the frame is
  * already materialized, a `count()` is one cheap job over cached blocks, so
  * we gate the hint on the actual row count and otherwise fall back to
  * Spark's ordinary shuffle join on the bucket key (which is what we want at
  * 100 TB anyway — the equi-join on the blocking key is the scale path).
  */
object JoinHints {

  /** Conservative default: signature/shingle rows are ≤ a few KB, so 200k
    * rows ≈ low hundreds of MB — inside a 1–2 GB broadcast budget. */
  val DefaultBroadcastRowLimit = 200000L

  /** PRECONDITION: `df` must already be materialized (localCheckpoint /
    * persist) — the row-count gate is an EAGER action inside what callers
    * see as a lazy DataFrame-building API, and on an unmaterialized input
    * it recomputes the entire upstream as an extra job at build time (and
    * then again when the join runs). Every in-repo caller checkpoints
    * first; new call sites must too. */
  def maybeBroadcast(df: DataFrame, rowLimit: Long = DefaultBroadcastRowLimit): DataFrame =
    if (df.count() <= rowLimit) broadcast(df) else df

  /** [[maybeBroadcast]] with a caller-supplied row count — for frames that
    * are deliberately NOT materialized (a recompute-over-checkpoint trade,
    * e.g. a corpus-wide prep projection whose checkpoint would be
    * storage-bound at 20 M+) where the count is available from a cheaper
    * source, like the raw input's metadata-backed count. An upper BOUND is
    * fine: it can only under-broadcast, never over. */
  def maybeBroadcastRows(df: DataFrame, rows: Long,
      rowLimit: Long = DefaultBroadcastRowLimit): DataFrame =
    if (rows <= rowLimit) broadcast(df) else df
}
