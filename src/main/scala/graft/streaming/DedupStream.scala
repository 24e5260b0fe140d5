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
    * defeat the match.
    *
    * CONTENTLESS rows (null text, or a token set that dedups to nothing —
    * empty/whitespace/punctuation-only) pass through UNDEDUPED: they all
    * share the degenerate md5("") fingerprint, and keying them would
    * collapse every such unrelated record to one survivor per watermark
    * horizon. There is no text content to be a near-duplicate OF, so
    * dedup is not this operator's call for them; route them through the
    * id-keyed [[exact]] or a quality gate instead. */
  def byFingerprint(stream: DataFrame, textCol: String, eventTimeCol: String,
      delay: String): DataFrame = {
    val withFp = stream
      .withColumn("__fp",
        // trim-nonempty, not tokenSet-nonempty: split("") is [""], one
        // EMPTY token, so whitespace-only and empty texts share a
        // non-empty token set and would still collapse onto md5("")
        when(trim(coalesce(col(textCol), lit(""))) =!= "",
          TextAnalysis.fingerprint(col(textCol))))
      .withWatermark(eventTimeCol, delay)
    val contentful = withFp.filter(col("__fp").isNotNull)
      .dropDuplicatesWithinWatermark("__fp")
    // unionByName keeps the contentless rows' watermark lineage intact;
    // both branches read the one source, so this plans as a single scan
    contentful.unionByName(withFp.filter(col("__fp").isNull)).drop("__fp")
  }

  /** Chunk-level first-occurrence dedup — the stateful step of the ns58
    * curation tail as a STREAM: documents fan out into overlapping token
    * chunks as they arrive ([[TextAnalysis.chunkOverlap]], stateless) and
    * each chunk hash's FIRST occurrence within the watermark horizon
    * survives; later repeats (boilerplate, mirrored pages, re-crawls) are
    * dropped at the chunk granularity, before they ever cost storage.
    *
    * Divergence from the batch semantic, by design: ns58 keeps the first
    * occurrence in (doc_id, chunk_id) order over the whole corpus; a
    * stream keeps the first ARRIVAL, and a repeat arriving after its
    * original's state was evicted re-emits — the same bounded-state
    * trade-off as [[exact]]/[[byFingerprint]], with the store-side
    * anti-join as the cross-horizon backstop. State is keyed by chunk_h
    * in the state store (hash-partitioned across executors, no driver
    * state); the watermark delay bounds it to the event-time window times
    * the chunk fan-out, NOT stream history. */
  def chunksFirstSeen(stream: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, delay: String, size: Int, stride: Int): DataFrame =
    TextAnalysis.chunkOverlap(stream, idCol, textCol, size, stride,
        carry = Seq(eventTimeCol))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("chunk_h")
}
