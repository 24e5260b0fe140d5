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
    * (what the stream's progress metrics report). EXACTLY-ONCE per
    * (writerId, batchId) since r17, by STAGING THE SCREEN VERDICT: the
    * survivor set (with its assigned codes) is written under
    * `<store>/_screen/<writer>-<epoch>/` and fenced with a `_VERDICT`
    * marker (recording the model version) BEFORE the store ingest runs.
    * A redelivered epoch whose marker matches the current model version
    * replays the STAGED survivors through [[IvfStore.ingest]] (itself
    * idempotent per epoch — partial commits are replaced cell by cell)
    * instead of re-screening. Re-screening was the r16 loss window: a
    * crash MID-commit left some cells committed, and the redelivery's
    * screen then dropped the uncommitted survivors as near-dups of their
    * committed batch-mates (at-least-once-with-dedup, under-ingesting).
    * With the verdict staged, every kill state replays to the identical
    * survivor set — never a duplicate AND never a loss
    * (StreamingCrashSoakSpec asserts zero loss across all kill states).
    *
    * Staging lifecycle: one dir per writer at steady state — staging
    * epoch N deletes the writer's older epochs' dirs (foreachBatch
    * epochs are sequential, so an older epoch can no longer redeliver
    * once N is being processed; only dirs matching `<writerId>-<digits>`
    * exactly are touched, so a sibling writer whose id shares a dash
    * prefix is never collateral). The marker fences on THREE things:
    *
    *   - the BATCH FINGERPRINT (row count + xor of id hashes, one tiny
    *     agg per drain): a batchId redelivered with DIFFERENT data — a
    *     wiped stream checkpoint with a surviving store, a writerId
    *     collision — re-screens the new data instead of silently
    *     replaying a stale survivor set;
    *   - the model version, with REFIT/PUBLISH told apart by the
    *     store's lineage chain ([[IvfStore.refitDescends]]): when a
    *     refit landed since staging the survivor VERDICT still stands
    *     (same corpus re-clustered; ids stable) and only the cell
    *     assignments recompute — the staged ids semi-join back to the
    *     batch's vectors, re-assign under the new model, drop the ids
    *     the refit already CONSOLIDATED (identity anti-join against
    *     [[IvfStore.presentIds]] — never the near-dup screen, which
    *     would re-open the r16 loss window), then restage. That keeps
    *     zero-loss AND zero-duplicates even for a refit landing between
    *     a mid-commit crash and the redelivery (re-screening there was
    *     the loss window; re-landing consolidated rows was the r17
    *     duplicate window). A PUBLISH (new corpus, no lineage) instead
    *     forces a full re-screen: the new snapshot's rows matter for
    *     the verdicts, so a stale verdict must not replay;
    *   - existence: no marker (crash before it) → full re-screen, store
    *     untouched by this epoch, same verdict recomputes.
    *
    * After the marker, anywhere in ingest's per-cell commit → the staged
    * replay completes it. StreamingCrashSoakSpec asserts zero loss
    * across all kill states. */
  def ingestDeduped(spark: SparkSession, storeDir: String, batch: DataFrame,
      idCol: String, vecCol: String, threshold: Double, batchId: Long,
      writerId: String = "semdedup", nProbe: Int = 1): Long = {
    // the whole batch runs against ONE pinned model version, and ingest
    // FENCES on it: a publish/refit flipping the pointer mid-batch used
    // to silently land stale-cell/stale-bounds rows in the new version
    // (wrong cells → probes miss them; stale-bounds __q bytes are
    // permanently incomparable — refit carries bounds forward). The
    // fence rejection retries here against the new model: a REFIT flip
    // keeps the staged verdict and re-assigns cells; a PUBLISH flip
    // re-screens outright (the lineage dispatch below). The per-(writer,
    // epoch) ingest protocol makes the retry replay-safe. Bounded:
    // versions flip at refit cadence (minutes), so two consecutive
    // flips mid-batch already means operator error.
    val screenRoot = StoreFs.path(storeDir, "_screen")
    val stageDir = StoreFs.path(storeDir, "_screen", s"$writerId-$batchId")
    val marker = StoreFs.path(stageDir.toString, "_VERDICT")
    def dataDirFor(mv: String) = StoreFs.path(stageDir.toString, s"data-$mv")
    // batch fingerprint: identifies the DATA this epoch carries, so a
    // redelivered batchId with different rows can never replay a stale
    // staged verdict (checkpoint wiped, writerId reused). Count + xor of
    // (id, vector) hashes + a sum-moment: the xor alone cancels pairs of
    // identical rows ({a,a,b} vs {c,c,b} xor to the same value), the sum
    // breaks that; pmod keeps the summands small so ANSI sum can't
    // overflow. Vectors are hashed too — same ids with updated
    // embeddings must re-screen, not replay stale codes.
    val fpRow = batch
      .select(xxhash64(col(idCol), col(vecCol)).as("__h"))
      .agg(count(lit(1)).as("c"),
        coalesce(expr("bit_xor(__h)"), lit(0L)).as("x"),
        coalesce(sum(pmod(col("__h"), lit(1000003L))), lit(0L)).as("s"))
      .collect()(0)
    val fingerprint = s"${fpRow.getLong(0)}:${fpRow.getLong(1)}:${fpRow.getLong(2)}"
    def writeStage(frame: DataFrame, mv: String): Unit = {
      // older epochs can no longer redeliver — reclaim their staging
      // (EXACT `<writerId>-<digits>` names only: "ingest-eu-7" must not
      // match writer "ingest")
      val own = java.util.regex.Pattern.compile(
        java.util.regex.Pattern.quote(writerId) + "-\\d+")
      if (StoreFs.isDirectory(screenRoot))
        StoreFs.listNames(screenRoot)
          .filter(n => own.matcher(n).matches() && n != s"$writerId-$batchId")
          .foreach(n => StoreFs.deleteRecursively(
            StoreFs.path(screenRoot.toString, n)))
      // never destroy the PREVIOUS verdict before the new one is durable:
      // new data dir (version-keyed, so a restage never overwrites the
      // old generation in place) → ATOMIC marker flip (tmp + rename) →
      // best-effort sweep of superseded data dirs. A kill anywhere
      // leaves a marker that points at a complete data dir.
      frame.write.mode("overwrite").parquet(dataDirFor(mv).toString)
      StoreFs.publishString(marker, s"$mv $fingerprint", "_VERDICT.tmp")
      StoreFs.listNames(stageDir)
        .filter(n => n.startsWith("data-") && n != s"data-$mv")
        .foreach(n => StoreFs.deleteRecursively(
          StoreFs.path(stageDir.toString, n)))
    }
    val maxAttempts = 3
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val (mv, m) = IvfStore.versionedModel(spark, storeDir)
      val markerFields: Option[Array[String]] =
        try {
          if (StoreFs.exists(marker)) Some(StoreFs.readString(marker).split(' '))
          else None
        } catch { case _: java.io.IOException => None }
      val staged = markerFields.filter(f => f.length == 2 && f(1) == fingerprint)
      val assigned = staged match {
        case Some(f) if f(0) == mv => // clean replay: codes still valid
          spark.read.parquet(dataDirFor(mv).toString)
        case Some(f) if IvfStore.refitDescends(storeDir, f(0), mv) =>
          // a REFIT chain landed since staging (same corpus,
          // re-clustered): the survivor VERDICT stands — re-screening
          // would drop survivors whose batch-mates committed before the
          // crash — but cells must be re-assigned under the new model
          // from the batch's vectors. One row per id (redelivered exact
          // copies collapse like the fresh path's __ck window).
          val ids = spark.read.parquet(dataDirFor(f(0)).toString).select(col(idCol))
          val survivors = batch.join(ids, Seq(idCol), "semi")
            .dropDuplicates(idCol)
          val re0 = AnnIngest.assignCells(survivors, vecCol, m.mn, m.mx, m.centroids)
            .select(col(idCol), col("__q"), col("cell"))
          // survivors whose cells COMMITTED before the crash were
          // consolidated by the refit (__b=fit in the new version) —
          // re-landing them in this epoch's partition would duplicate
          // their vec_ids until the next refit (the r17 residual). Drop
          // them by IDENTITY against the post-refit store; the near-dup
          // screen is the wrong tool here (it would also drop the
          // UNCOMMITTED survivors as near-dups of their committed
          // batch-mates — the r16 loss window this branch exists to
          // avoid). Uncommitted survivors are absent from the store, so
          // they pass the anti-join and re-ingest: zero loss AND zero
          // duplicates across the straddle.
          val present = IvfStore.presentIds(spark, storeDir)
          val re = re0.join(present,
            re0(idCol).cast("long") === present("vec_id"), "left_anti")
            .localCheckpoint()
          writeStage(re, mv)
          re
        case _ => // no / foreign staging, or a PUBLISH replaced the
          // corpus (not a refit descendant): screen this batch against
          // the store as it now stands — a new snapshot's rows matter
          // for the verdicts, so a stale verdict must NOT replay
          val survivors = screen(spark, storeDir, batch, idCol, vecCol,
            threshold, nProbe)
          val fresh = AnnIngest.assignCells(survivors, vecCol, m.mn, m.mx, m.centroids)
            .select(col(idCol), col("__q"), col("cell"))
            .localCheckpoint() // count + stage + ingest: one materialization
          if (fresh.count() > 0) writeStage(fresh, mv)
          fresh
      }
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
