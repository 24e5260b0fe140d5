package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight deduplication for the streaming plane: drop a record whose
  * key (exact id, or content fingerprint for near-identical text) was
  * already seen within the watermark horizon.
  *
  * This is the streaming face of the batch dedup suite: the batch path
  * dedups the corpus after the fact ([[graft.operators.Dedup]]); this path
  * keeps redelivered/mirrored records from ever landing, with state
  * BOUNDED by the watermark delay — `dropDuplicatesWithinWatermark` evicts
  * a key's state once the watermark passes its event time + delay, so
  * state size tracks the event-time window, not stream history.
  *
  * The deliberate trade-off (documented, spec-asserted): a duplicate
  * arriving after its original's state is evicted re-emits. Cross-horizon
  * dedup belongs to the store's anti-join upsert
  * ([[graft.operators.Upsert]]), which is idempotent anyway — the two
  * layers compose into effectively-once storage with bounded stream state
  * (reference behavior: unbounded `storedPost.includes` re-scan per cycle,
  * /root/reference/src/subscription.ts:273-278 — correct only because a
  * feed's history is capped at a few thousand rows).
  *
  * At scale: state lives in the state store keyed by the dedup columns —
  * partitioned by key hash across executors, no driver state; watermark
  * delay is the knob trading memory for dedup horizon.
  */
object DedupStream {

  /** Exact-key stream dedup with watermark-bounded state. */
  def exact(stream: DataFrame, eventTimeCol: String, delay: String,
      keyCols: String*): DataFrame =
    stream
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Near-identical text dedup: key = md5 of the sorted distinct word set
    * ([[TextAnalysis.fingerprint]]), so word order and repetition don't
    * defeat the match. */
  def byFingerprint(stream: DataFrame, textCol: String, eventTimeCol: String,
      delay: String): DataFrame =
    stream
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
