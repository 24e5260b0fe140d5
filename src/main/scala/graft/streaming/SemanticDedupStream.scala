package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONLINE semantic dedup — ns65's SemDeDup verdict applied at ingest
  * time instead of over a resting corpus: each arriving embedding is
  * screened against the PUBLISHED IVF index ([[IvfStore]]) and dropped
  * if its nearest indexed neighbor is a near-duplicate; survivors are
  * ingested into the same index, so the screen tightens as the stream
  * runs. This is the streaming half of the curation story (reference
  * behavior: per-cycle dedup-on-insert,
  * /root/reference/src/logic/getConditionedRecords.ts upsert screen),
  * composed entirely from the existing planes:
  *
  *   - [[AnnIngest.assignCells]]-equivalent quantize+assign rides inside
  *     [[IvfStore.search]] (stateless — offline model, no state store);
  *   - the near-dup verdict is the store's EXISTENCE screen
  *     ([[IvfStore.nearDupIds]]): every in-cell candidate tested on the
  *     QUANTIZED cosine (dot(q,c)/√(|q|²·|c|²) over SQ8 codes — exact
  *     integers until the one final division). A top-k search is the
  *     wrong primitive here: it ranks by raw dot, and an exact copy can
  *     sit below rank k behind larger-norm sub-threshold vectors;
  *   - survivors land through [[IvfStore.ingest]], whose per-(writer,
  *     batch) partition protocol makes redelivered batches idempotent —
  *     so the composition is exactly-once end-to-end without any
  *     stream-side state.
  *
  * WITHIN-batch duplicates: exact code-level copies collapse to the
  * lowest id before ingest (deterministic); sub-threshold within-batch
  * NEAR-dups are deliberately left to the next refit/batch pass (ns65) —
  * collapsing them online would need a pairwise pass over the batch,
  * and the batch is the one corpus slice that has not been indexed yet.
  * A vector can also only be compared against cells the index already
  * covers (nProbe nearest), the same recall trade every IVF search makes.
  *
  * At 100 TB: the screen's cost per batch is |batch| × (|cell|/nCells)
  * code dots against a cell-pruned parquet scan — the arriving stream
  * never shuffles the corpus, and the store's partitionBy(cell) layout
  * serves each probe from one partition's files.
  */
object SemanticDedupStream {

  /** Screen one micro-batch against the store: returns the SURVIVORS —
    * rows whose top-1 indexed neighbor's quantized cosine is below
    * `threshold`, with exact-code within-batch copies collapsed to the
    * lowest id. Pure function of (store version, batch); the caller
    * decides what to do with the survivors ([[ingestDeduped]] writes
    * them back to the store). */
  def screen(spark: SparkSession, storeDir: String, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nProbe: Int = 1): DataFrame = {
    val m = IvfStore.model(spark, storeDir)
    val hits = IvfStore.nearDupIds(spark, storeDir, batch, idCol, vecCol,
      threshold, nProbe)
    import org.apache.spark.sql.expressions.Window
    batch
      .filter(col(vecCol).isNotNull)
      .join(hits.withColumnRenamed("q_id", idCol).hint("broadcast"), Seq(idCol), "left_anti")
      // exact within-batch copies: same model ⇒ same packed code ⇒ same
      // md5; keep the lowest id (deterministic, matches the batch
      // family's keeper rule)
      .withColumn("__ck", md5(org.apache.spark.sql.graft.SQ8PackRaw(col(vecCol),
        typedlit(m.mn.toSeq), typedlit(m.mx.toSeq))))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__ck")).orderBy(col(idCol).asc)))
      .filter(col("__rn") === 1).drop("__ck", "__rn")
  }

  /** Screen + ingest: the foreachBatch body. Returns the survivor count
    * (what the stream's progress metrics report). Idempotent per
    * (writerId, batchId), but by SELF-SCREENING, not by rewriting: on a
    * redelivered epoch the screen runs against the CURRENT store, which
    * already contains this batch's committed survivors — each survivor is
    * its own indexed near-dup, so it screens itself out, n == 0, and the
    * `n > 0` guard skips the ingest entirely. Prior state is preserved by
    * that skip. The residual: if the previous attempt crashed MID-commit
    * (some cell partitions renamed, some still `.tmp`), survivors that
    * are near-dups of a committed cell's rows self-screen out while their
    * own tmp-cell copies are gone — those rows are dropped, so the
    * end-to-end contract is at-least-once-with-dedup (never a duplicate
    * in the store; a partial-commit crash can under-ingest), not
    * exactly-once. [[IvfStore.ingest]]'s per-epoch partition protocol
    * still makes the WRITE side replay-safe whenever n > 0. */
  def ingestDeduped(spark: SparkSession, storeDir: String, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double, batchId: Long,
      writerId: String = "semdedup", nProbe: Int = 1): Long = {
    // the whole batch runs against ONE pinned model version, and ingest
    // FENCES on it: a publish/refit flipping the pointer mid-batch used
    // to silently land stale-cell/stale-bounds rows in the new version
    // (wrong cells → probes miss them; stale-bounds __q bytes are
    // permanently incomparable — refit carries bounds forward). The
    // fence rejection re-runs the batch here against the new model
    // (screen included: the new version's rows matter for the verdicts
    // too); the per-(writer, epoch) ingest protocol makes the retry
    // replay-safe. Bounded: versions flip at refit cadence (minutes),
    // so two consecutive flips mid-batch already means operator error.
    val maxAttempts = 3
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val (mv, m) = IvfStore.versionedModel(spark, storeDir)
      val survivors = screen(spark, storeDir, batch, idCol, vecCol, threshold, nProbe)
      val assigned = AnnIngest.assignCells(survivors, vecCol, m.mn, m.mx, m.centroids)
        .select(col(idCol), col("__q"), col("cell"))
        .localCheckpoint() // count + ingest: one materialization, two consumers
      val n = assigned.count()
      try {
        if (n > 0)
          IvfStore.ingest(storeDir, assigned, idCol, batchId, writerId, Some(mv))
        return n
      } catch {
        case e: IllegalStateException if attempt < maxAttempts =>
          System.err.println(s"[semdedup] model version flipped mid-batch " +
            s"(attempt $attempt/$maxAttempts): ${e.getMessage}; re-running the batch")
      }
    }
    throw new IllegalStateException(
      s"ingestDeduped into '$storeDir': the model version flipped on every of " +
        s"$maxAttempts attempts — refits are outpacing ingest batches")
  }

  /** Wire a streaming frame of (id, vector) rows into the store through
    * the screen. One foreachBatch sink; the scratch sweep keeps a long
    * soak from accumulating per-batch localCheckpoint blocks.
    *
    * `writerId` scopes the store's epoch-partition idempotence
    * ([[IvfStore.ingest]]): TWO concurrent streams writing one store MUST
    * pass distinct writerIds, or their same-numbered epochs overwrite
    * each other — pass the streaming query's id (stable across
    * checkpoint-preserving restarts) when more than one writer exists. */
  def run(stream: DataFrame, storeDir: String, idCol: String, vecCol: String,
      threshold: Double, checkpointDir: String, nProbe: Int = 1,
      writerId: String = "semdedup"): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestDeduped(batch.sparkSession, storeDir, batch, idCol, vecCol,
          threshold, batchId, writerId, nProbe)
        graft.SharedCache.unpersistScratch(batch.sparkSession)
        ()
      }
      .start()
}
