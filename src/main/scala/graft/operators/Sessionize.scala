package graft.operators

import java.sql.Timestamp

import graft.model.Post
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the custom stateful operator the engine's
  * streaming plane offers beyond the reference surface (SURVEY §2.9 T10:
  * windows are absent in the reference; Spark gives them for free).
  *
  * Two equivalent implementations:
  *  - `batch`: lag + running-sum windows (one shuffle on the key; the form
  *    the DuckDB oracle states);
  *  - `streaming`: `flatMapGroupsWithState` with processing-time timeout —
  *    state = open session per key, emitting closed sessions as they age
  *    out; the 100 TB path for unbounded streams.
  */
object Sessionize {

  /** Batch sessionization: a new session starts when the gap since the
    * previous event exceeds `gapUs`. Output: one row per session with
    * bounds and size. */
  def batch(events: DataFrame, keyCol: String, tsUsCol: String, idCol: String,
      gapUs: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    events
      .withColumn("__prev", lag(col(tsUsCol), 1).over(byKey))
      .withColumn("__new",
        when(col("__prev").isNull || col(tsUsCol) - col("__prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsUsCol)).as("start_us"),
        max(col(tsUsCol)).as("end_us"))
  }

  /** Streaming state: the open session for one key. */
  final case class OpenSession(startUs: Long, lastUs: Long, n: Long)
  final case class SessionOut(key: Long, n_events: Long, start_us: Long, end_us: Long)
  final case class Ev(key: Long, tsUs: Long)

  /** flatMapGroupsWithState sessionizer: events must arrive per-key in
    * batches (order within a batch is sorted here); closed sessions are
    * emitted, the open one is carried in state. With `idleTimeout` set,
    * open sessions age out on a processing-time timer (production mode);
    * without it, state only closes on a later out-of-gap event (lets tests
    * drain synchronously — a timeout keeps the query triggering). */
  def streaming(events: Dataset[Ev], gapUs: Long,
      idleTimeout: Option[String] = None): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (key: Long, evs: Iterator[Ev], state: GroupState[OpenSession]) => {
          if (idleTimeout.isDefined && state.hasTimedOut) {
            val out = state.getOption.map(s => SessionOut(key, s.n, s.startUs, s.lastUs))
            state.remove()
            out.iterator
          } else {
            var open = state.getOption
            // second open-session slot for cross-batch LATE events (older
            // than the open session's reach): consecutive late events
            // within gap of each other chain into ONE pending session —
            // they arrive sorted, so one slot suffices — where emitting
            // each as its own singleton diverged from batch() beyond the
            // single-event case (ADVICE r15). The chain closes when the
            // batch ends (state carries one open session), so the residual
            // divergence from batch() is now only ACROSS batches: a late
            // event in a future batch within gap of this chain starts a
            // new chain; [[streamingSessionWindow]] (watermarked) is the
            // form with full event-time semantics.
            var late = Option.empty[OpenSession]
            val closed = Seq.newBuilder[SessionOut]
            evs.toSeq.sortBy(_.tsUs).foreach { e =>
              open match {
                // in-gap of the open session on EITHER side: merge and
                // extend BOTH endpoints — a cross-batch late event inside
                // the gap used to merge while keeping the stale startUs
                case Some(s) if e.tsUs >= s.startUs - gapUs && e.tsUs - s.lastUs <= gapUs =>
                  open = Some(s.copy(startUs = math.min(s.startUs, e.tsUs),
                    lastUs = math.max(s.lastUs, e.tsUs), n = s.n + 1))
                  // a downward-extended start can bring the pending late
                  // chain into reach — fold it in rather than closing it
                  // as a separate session batch() would have merged
                  (open, late) match {
                    case (Some(o), Some(l)) if o.startUs - l.lastUs <= gapUs =>
                      open = Some(o.copy(startUs = math.min(o.startUs, l.startUs),
                        n = o.n + l.n))
                      late = None
                    case _ => ()
                  }
                // too late to belong to the open session (batch() would
                // place it in an EARLIER one): chain it onto the pending
                // late session if in gap, else flush that chain and start
                // a new one
                case Some(s) if e.tsUs < s.startUs - gapUs =>
                  late match {
                    case Some(l) if e.tsUs - l.lastUs <= gapUs =>
                      late = Some(l.copy(lastUs = e.tsUs, n = l.n + 1))
                    case Some(l) =>
                      closed += SessionOut(key, l.n, l.startUs, l.lastUs)
                      late = Some(OpenSession(e.tsUs, e.tsUs, 1))
                    case None =>
                      late = Some(OpenSession(e.tsUs, e.tsUs, 1))
                  }
                case Some(s) =>
                  closed += SessionOut(key, s.n, s.startUs, s.lastUs)
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1))
                case None =>
                  open = Some(OpenSession(e.tsUs, e.tsUs, 1))
              }
            }
            late.foreach(l => closed += SessionOut(key, l.n, l.startUs, l.lastUs))
            open.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            closed.result().iterator
          }
        })
  }

  /** Force-close all open sessions (end-of-stream flush for tests/batch
    * parity): call after the stream is drained by re-running batch over the
    * residual state — exposed for the spec. */
  def flush(open: Map[Long, OpenSession]): Seq[SessionOut] =
    open.map { case (k, s) => SessionOut(k, s.n, s.startUs, s.lastUs) }.toSeq

  /** Built-in `session_window` variant: the idiomatic Structured-Streaming
    * gap-window aggregation. State bounds and eviction come from the
    * watermark (closed sessions emit once the watermark passes their end),
    * so unlike [[streaming]] no hand-rolled GroupState is carried — prefer
    * this form unless per-event custom state is genuinely needed.
    * `end` is last-event time + gap (Spark's session_window convention). */
  def streamingSessionWindow(events: DataFrame, keyCol: String, tsCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"))
}
