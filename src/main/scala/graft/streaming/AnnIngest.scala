package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{NearestCellsCodes, SQ8PackRaw}

/** Streaming maintenance of the quantized IVF index
  * ([[graft.operators.KMeansIvf.searchSq8]]): newly arriving embeddings
  * are quantized and assigned to their nearest EXISTING cell — the
  * incremental-ingest half of the IVF lifecycle.
  *
  * Why no refit on the stream: centroids and SQ8 bounds are trained
  * offline on a corpus snapshot and SHIPPED as literals/reference objects
  * (k × dim longs, 2 × dim longs — the bounded driver state the batch
  * fit guarantees). Assignment is a pure per-row function of those, so
  * the stream stage is STATELESS — no state store, no shuffle, arbitrary
  * parallelism, exactly-once under any sink that dedups on id. A vector
  * from outside the trained bounds saturates at the SQ8 code-range edge
  * (the quantizer's clamp), so drift degrades recall gradually instead of
  * failing; re-fitting on a fresh snapshot and swapping centroid versions
  * is the batch plane's job (the versioned-store pointer-flip pattern in
  * [[graft.DurablePipeline]]).
  *
  * At 100 TB: this is the standard "train offline, assign online" split —
  * the stream never holds corpus-sized state, and a cell-bucketed sink
  * (partitionBy cell) keeps the downstream search's cell equi-join
  * co-located with zero stream-side shuffles.
  */
object AnnIngest {

  /** Quantize + assign a stream of (id, vector) rows: adds `__q` (packed
    * SQ8 codes, binary) and `cell` (nearest-centroid id). `mn`/`mx` are
    * the offline bounds, `centroids` the offline fit — all bounded driver
    * state. Stateless: safe in append mode with no watermark. */
  def assignCells(stream: DataFrame, vecCol: String,
      mn: Array[Long], mx: Array[Long],
      centroids: Array[Array[Long]]): DataFrame =
    stream
      .filter(col(vecCol).isNotNull)
      .withColumn("__q", SQ8PackRaw(col(vecCol), typedlit(mn.toSeq), typedlit(mx.toSeq)))
      .withColumn("cell", NearestCellsCodes.nearest(col("__q"), centroids))
}
