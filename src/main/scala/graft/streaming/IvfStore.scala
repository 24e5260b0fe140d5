package graft.streaming

import graft.operators.KMeansIvf
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{NearestCellsCodes, SQ8PackRaw}
import org.apache.spark.sql.types._

/** The durable half of the streaming IVF lifecycle
  * ([[AnnIngest]] is the in-flight half): a [[VersionedStore]]-versioned
  * on-disk layout holding the quantized index —
  *
  * {{{ <storeDir>/_vNNN/model/   one-row parquet: mn, mx, centroids
  *     <storeDir>/_vNNN/codes/   (vec_id, __q binary, cell) partitioned by cell }}}
  *
  * Lifecycle: [[publish]] trains bounds + code-space centroids on a
  * corpus snapshot and lands index v1; a stream assigns arriving vectors
  * against the CURRENT model ([[AnnIngest.assignCells]]) and [[ingest]]
  * appends them to the current version's codes; [[refit]] retrains the
  * cells on everything stored (batch + streamed — Lloyd trains ON codes,
  * so no raw vectors are kept) and lands the result as the next version
  * with an atomic pointer flip — searches that resolved the old version
  * keep their files for [[VersionedStore.GraceVersions]] more swaps.
  * Bounds are fixed at publish time: streamed vectors outside them
  * saturate at the SQ8 code edge (recall degrades gradually under drift;
  * a fresh [[publish]] re-derives them).
  *
  * At 100 TB: partitionBy(cell) makes the search's cell equi-join
  * partition-pruned file reads (only the probed cells' files are
  * listed), the model sidecar is the k×dim + 2×dim driver-bounded state,
  * and the parquet version dirs swap for Delta/Iceberg snapshots with
  * the identical publish/ingest/refit/flip choreography. */
object IvfStore {

  /** The driver-bounded model sidecar: SQ8 bounds (fixed-point micros)
    * and code-space centroids. */
  final case class Model(mn: Array[Long], mx: Array[Long],
      centroids: Array[Array[Long]])

  // vec_id is pinned to LONG in the at-rest layout: schema-on-read needs
  // one concrete type, and every embedding fixture/source in scope keys
  // vectors by int64. Hash wider ids to longs upstream (xxhash64).
  // `__b` is the writer partition: "fit" for fitted versions (publish/
  // refit consolidate everything they write), "<writerId>-<epoch>" for
  // streamed appends — the idempotence handle (see [[ingest]]). This is
  // layout v2; v1 (no __b level) was never shipped outside this repo's
  // dev iterations and is not readable by this code.
  private val codesSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("__q", BinaryType),
    StructField("cell", IntegerType),
    StructField("__b", StringType)))

  private def codesDir(versionDir: String) =
    new HPath(versionDir, "codes").toString
  private def modelDir(versionDir: String) =
    new HPath(versionDir, "model").toString

  /** Train on a corpus snapshot and land it as the store's next version:
    * SQ8 bounds over the snapshot, packed codes, a code-trained k-means
    * ([[KMeansIvf.fitCodes]] — the same deterministic Lloyd as the batch
    * catalog entries), one pointer flip. Returns the published model. */
  def publish(spark: SparkSession, storeDir: String, embeddings: DataFrame,
      idCol: String, vecCol: String, nCells: Int, iters: Int = 3): Model = {
    val nn = embeddings.filter(col(vecCol).isNotNull)
    // bounds come from Similarity's ONE recipe definition — a vector
    // quantized here and one quantized by the batch path must get
    // identical codes, so there is nothing here that could drift from it
    val b = graft.operators.Similarity.sq8BoundsFrame(nn, vecCol).head()
    val model0 = Model(b.getSeq[Long](0).toArray, b.getSeq[Long](1).toArray, Array.empty)
    val codes = nn.select(col(idCol).cast("long").as("vec_id"),
      SQ8PackRaw(col(vecCol), typedlit(model0.mn.toSeq),
        typedlit(model0.mx.toSeq)).as("__q"))
    VersionedStore.withStoreLock(storeDir) {
      swapFit(spark, storeDir, codes, model0, nCells, iters, parent = None)
    }
  }

  /** Retrain the cells on EVERYTHING currently stored — the original
    * snapshot plus every streamed append — and land it as the next
    * version. Bounds carry over (codes are already quantized with them);
    * only the cell structure refreshes. Searches against the superseded
    * version keep streaming it through the grace window. */
  def refit(spark: SparkSession, storeDir: String, nCells: Int,
      iters: Int = 3): Model =
    VersionedStore.withStoreLock(storeDir) {
      val v = VersionedStore.versionDir(storeDir)
      // Dedup backstop: a batch replayed ACROSS a refit lands as a fresh
      // epoch partition beside its already-consolidated rows (the one
      // redelivery window the per-epoch overwrite cannot cover, since
      // consolidation rewrote those rows under __b=fit). Duplicates are
      // exact copies by contract (same bounds → same code), so collapsing
      // to one row per id is correct and each refit restores the
      // one-row-per-vector invariant. The winner is DETERMINISTIC — max
      // over (__b, __q), not dropDuplicates' partition-order pick — so a
      // contract violation (a cross-writer id collision, or an updated
      // vector re-ingested under its old id) collapses to the same row on
      // every refit instead of flapping between runs. (__b order is a
      // tiebreak, not recency: writer tokens don't totally order epochs
      // across incarnations.)
      swapFit(spark, storeDir,
        rawCodesAt(spark, v)
          .groupBy(col("vec_id"))
          .agg(max(struct(col("__b"), col("__q"))).as("__w"))
          .select(col("vec_id"), col("__w.__q").as("__q")),
        modelAt(spark, v), nCells, iters, parent = Some(new HPath(v).getName))
    }

  /** True iff version `to` is reachable from version `from` through the
    * refit lineage chain (each refit records its parent in a `_parent`
    * file; publish starts a new chain). Conservative: a missing or
    * GC'd link, an IO error, or a >32-hop walk all return false — the
    * caller then treats the flip as a new corpus. */
  def refitDescends(storeDir: String, from: String, to: String): Boolean = {
    var cur = to
    var hops = 0
    while (hops < 32) {
      if (cur == from) return true
      val p = StoreFs.path(storeDir, cur, "_parent")
      val parent =
        try { if (StoreFs.exists(p)) Some(StoreFs.readString(p)) else None }
        catch { case _: java.io.IOException => None }
      parent match {
        case Some(pp) if pp.nonEmpty => cur = pp; hops += 1
        case _ => return false
      }
    }
    false
  }

  /** Fit cells on `codes`, then write (model, assigned codes) as the next
    * version and flip the pointer. Caller holds the store lock. The swap
    * writes the new version BEFORE touching the old one, and the reads
    * feeding the fit resolve the old version's files — which survive the
    * flip by the grace window — so refit-from-self is safe. */
  private def swapFit(spark: SparkSession, storeDir: String, codes: DataFrame,
      m: Model, nCells: Int, iters: Int, parent: Option[String]): Model = {
    val (assignments, centroids) =
      KMeansIvf.fitCodes(codes, "vec_id", "__q", nCells, iters)
    val assigned = codes.join(assignments, "vec_id")
      .select(col("vec_id"), col("__q"), col("cluster").as("cell"))
    val next = Model(m.mn, m.mx, centroids)
    VersionedStore.swap(storeDir, tmp => {
      import spark.implicits._
      Seq((next.mn.toSeq, next.mx.toSeq, next.centroids.map(_.toSeq).toSeq))
        .toDF("mn", "mx", "centroids")
        .coalesce(1).write.parquet(modelDir(tmp.toString))
      assigned.withColumn("__b", lit("fit"))
        .write.partitionBy("cell", "__b").parquet(codesDir(tmp.toString))
      // refit LINEAGE: the new version descends from the one it
      // consolidated — publish() passes None (a fresh corpus). Consumers
      // that pinned a verdict against an ancestor use this to tell
      // "same corpus, re-clustered" (ids carried forward) from "a new
      // snapshot entirely" ([[refitDescends]]).
      parent.foreach(pn =>
        StoreFs.writeString(StoreFs.path(tmp.toString, "_parent"), pn))
    })
    next
  }

  private def modelAt(spark: SparkSession, versionDir: String): Model = {
    val r = spark.read.parquet(modelDir(versionDir)).head()
    // nested rows come back as mutable.ArraySeq — type the inner element
    // as collection.Seq or the .map trips a ClassCastException
    Model(r.getSeq[Long](r.fieldIndex("mn")).toArray,
      r.getSeq[Long](r.fieldIndex("mx")).toArray,
      r.getSeq[scala.collection.Seq[Long]](r.fieldIndex("centroids"))
        .map(_.toArray).toArray)
  }

  /** All non-in-flight code rows incl. the writer-partition column; the
    * `.tmp` partition filter excludes batches an [[ingest]] is mid-write
    * on (or a crashed attempt left behind) — readers never see a torn
    * batch, partition pruning makes the exclusion free. */
  private def rawCodesAt(spark: SparkSession, versionDir: String): DataFrame =
    spark.read.schema(codesSchema).parquet(codesDir(versionDir))
      .filter(!col("__b").endsWith(".tmp"))

  private def codesAt(spark: SparkSession, versionDir: String): DataFrame =
    rawCodesAt(spark, versionDir).select("vec_id", "__q", "cell")

  /** The CURRENT version's model sidecar. */
  def model(spark: SparkSession, storeDir: String): Model =
    modelAt(spark, VersionedStore.versionDir(storeDir))

  /** The CURRENT version name plus its model — for callers that quantize/
    * assign OUTSIDE the ingest lock and pass the version back to
    * [[ingest]] so a publish/refit landing in between cannot silently
    * slip stale-model rows into the new version. */
  def versionedModel(spark: SparkSession, storeDir: String): (String, Model) = {
    val root = new HPath(storeDir)
    val v = VersionedStore.currentVersion(root).getOrElse(throw new IllegalStateException(
      s"no published version at '$storeDir' — publish() before streaming ingest"))
    (v, modelAt(spark, new HPath(root, v).toString))
  }

  /** The CURRENT version's code table (vec_id, __q, cell). */
  def codes(spark: SparkSession, storeDir: String): DataFrame =
    codesAt(spark, VersionedStore.versionDir(storeDir))

  /** DISTINCT vec_ids in the CURRENT version (committed partitions
    * only) — one column-pruned scan, no code bytes read. This is the
    * straddle-replay IDENTITY check ([[SemanticDedupStream
    * .ingestDeduped]]): rows a refit already consolidated must be
    * recognized by id, never by the near-dup screen (which would also
    * drop uncommitted survivors near their committed batch-mates — the
    * r16 loss window). Cell pruning is deliberately NOT applied: the
    * refit assigns cells from SQ8-decoded vectors while the replay
    * re-assigns from full-precision ones, and a near-tied vector can
    * land one cell over — an id-presence check must not miss it. */
  def presentIds(spark: SparkSession, storeDir: String): DataFrame =
    rawCodesAt(spark, VersionedStore.versionDir(storeDir))
      .select("vec_id").distinct()

  /** Land a streamed micro-batch of assigned codes — the output shape of
    * [[AnnIngest.assignCells]] plus the id column — in the CURRENT
    * version. Serialized with publish/refit by the store lock, so an
    * append can never land in a directory the GC is about to drop.
    *
    * `(writerId, batchId)` is the IDEMPOTENCE handle (the Delta/Iceberg
    * txn-id convention): the batch writes into its own `__b` partition
    * with dynamic partition overwrite, so a batch redelivered after a
    * mid-write failure REPLACES what the first attempt wrote instead of
    * duplicating it (cell assignment is deterministic given the model, so
    * the replayed batch lands on the identical partition set). Pass the
    * streaming QUERY ID as `writerId`: it is stable across
    * checkpoint-preserving restarts (where epochs continue and replays
    * must overwrite), and a wiped/fresh checkpoint — whose epochs restart
    * at 0 — gets a fresh query id and therefore a fresh idempotence
    * scope instead of silently overwriting an earlier incarnation's
    * batches. A replay that straddles a [[refit]] is the one window this
    * protocol alone cannot cover (its first attempt was consolidated
    * under `__b=fit`); refit's vec_id dedup restores the invariant at
    * the next swap for RAW callers, and [[SemanticDedupStream
    * .ingestDeduped]] closes it up front with an identity anti-join
    * against [[presentIds]].
    *
    * Write protocol: the batch lands under `__b=<writer>-<epoch>.tmp`
    * partitions — INVISIBLE to readers (the `.tmp` partition filter in
    * [[rawCodesAt]]) — then each cell's tmp dir renames over the final
    * partition dir. A replayed batch therefore never deletes committed
    * files while it re-writes them (the former dynamic-partition
    * overwrite yanked the first attempt's files mid-rewrite — an
    * in-place-rewrite hazard for any concurrent search that had already
    * resolved the version; with ignoreMissingFiles it would silently
    * drop rows). The residual window is the per-cell delete+rename pair
    * — two metadata ops, not a data rewrite; a search listing files in
    * exactly that instant can still lose the race and should retry, the
    * same transient contract as the version GC's grace window. Crashed
    * attempts leave only `.tmp` partitions, which readers filter, the
    * same batch's redelivery deletes, and [[refit]] drops at
    * consolidation. */
  def ingest(storeDir: String, assigned: DataFrame, idCol: String,
      batchId: Long, writerId: String = "stream",
      modelVersion: Option[String] = None): Unit = {
    require(batchId >= 0, s"batchId must be a non-negative stream epoch, got $batchId")
    // the charset must survive Spark's partition-path escaping VERBATIM:
    // the commit rename looks for the literal `__b=<writerId>-<batchId>`
    // directory, and a writerId with ':'/'='/'%'/etc. is written ESCAPED
    // (`query%3A1`), so the rename would find nothing and the batch would
    // sit forever in a .tmp partition readers filter out — silent loss
    require(writerId.matches("[A-Za-z0-9._-]+"),
      s"writerId must match [A-Za-z0-9._-]+ (partition-path-literal token), got '$writerId'")
    VersionedStore.withStoreLock(storeDir) {
      // fence stale-model assignments: the caller quantized/assigned
      // outside this lock against `modelVersion`'s bounds + centroids; if
      // a publish/refit flipped the pointer since, those codes are wrong
      // under the new model (wrong cells after a refit — probes miss the
      // rows; incomparable __q bytes after a publish with new bounds, and
      // refit carries bounds forward, never requantizes). Refuse loudly —
      // the streaming caller's retry re-assigns against the new model.
      modelVersion.foreach { v =>
        val cur = VersionedStore.currentVersion(new HPath(storeDir))
        if (!cur.contains(v))
          throw new IllegalStateException(
            s"ingest into '$storeDir': assignments were computed against model " +
              s"version '$v' but the store is now at '${cur.getOrElse("<unversioned>")}' " +
              "(a publish/refit landed in between) — re-assign against the " +
              "current model and retry")
      }
      val cdir = codesDir(VersionedStore.versionDir(storeDir))
      val bFinal = s"$writerId-$batchId"
      val bTmp = s"$bFinal.tmp"
      // a crashed earlier attempt's tmp partitions would double with this
      // write's append — clear them first (readers never saw them)
      forEachBatchDir(cdir, bTmp)(VersionedStore.deleteRecursively)
      assigned
        .select(col(idCol).cast("long").as("vec_id"), col("__q"), col("cell"),
          lit(bTmp).as("__b"))
        .write.mode("append")
        .partitionBy("cell", "__b")
        .parquet(cdir)
      // commit: per cell, replace the previous attempt's partition (if
      // any) with the tmp one
      forEachBatchDir(cdir, bTmp) { tmp =>
        val finalDir = new HPath(tmp.getParent, s"__b=$bFinal")
        StoreFs.deleteRecursively(finalDir)
        StoreFs.rename(tmp, finalDir)
      }
    }
  }

  /** Apply `f` to the `__b=<b>` dir under every `cell=` partition. */
  private def forEachBatchDir(codesDir: String, b: String)(
      f: HPath => Unit): Unit = {
    val root = new HPath(codesDir)
    if (StoreFs.isDirectory(root))
      StoreFs.listNames(root).foreach { cellName =>
        if (cellName.startsWith("cell=")) {
          val d = new HPath(new HPath(root, cellName), s"__b=$b")
          if (StoreFs.isDirectory(d)) f(d)
        }
      }
  }

  /** Top-k in-cell quantized search against the CURRENT version: external
    * query vectors quantize with the stored bounds, probe their `nProbe`
    * nearest cells, rank by the exact integer code dot product — the
    * [[KMeansIvf.searchSq8MultiProbe]] ranking over the published index
    * instead of a per-query refit. The probed cell set is DRIVER-BOUNDED
    * (≤ queries × nProbe ≤ nCells ids), so it is collected once and
    * pushed as a literal `cell IN (...)` predicate on the code table —
    * partitionBy(cell) then prunes to exactly the probed cells' files
    * UNCONDITIONALLY (plan-pinned in PlanShapeSpec), instead of hoping
    * the cell equi-join plans as a dynamic partition filter; the
    * broadcast query side never shuffles the code table.
    *
    * The version pointer is resolved ONCE and both the model and the code
    * table read from that resolved directory — a refit flipping the
    * pointer mid-search can therefore never pair one version's centroids
    * with another version's cell assignments (the superseded files
    * survive the flip through the grace window). Queries are EXTERNAL:
    * no self-exclusion — a query id that happens to collide with a stored
    * vec_id must still retrieve that vector. */
  def search(spark: SparkSession, storeDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 1,
      withNorms: Boolean = false): DataFrame = {
    val (qsBase, pruned) = probeJoin(spark, storeDir, queries, idCol, vecCol, nProbe)
    KMeansIvf.rankCodes(broadcast(qsBase), pruned,
      // dedupTies: in the acknowledged replay-across-refit window one
      // vec_id can briefly hold two identical code rows (epoch partition
      // + its __b=fit consolidation); without the dedup a top-k could
      // spend two of its slots on one vector
      k, excludeSelf = false, dedupTies = true, withNorms = withNorms)
  }

  /** The probe prelude [[search]] and [[nearDupIds]] share: quantize +
    * cell-assign the (broadcast-small) query side once, then prune the
    * code table to the probed cells with a literal `cell IN (...)`
    * predicate (unconditional partition pruning — see [[search]]'s
    * scaladoc). */
  private def probeJoin(spark: SparkSession, storeDir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      nProbe: Int): (DataFrame, DataFrame) = {
    val v = VersionedStore.versionDir(storeDir)
    val m = modelAt(spark, v)
    // materialized ONCE (queries are broadcast-small by contract): the
    // quantize+assign projection feeds both the probe-set collect below
    // and the join's broadcast build — without the checkpoint each would
    // re-scan the caller's query frame, which may be a filter over a
    // corpus-sized table
    val qsBase = queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        SQ8PackRaw(col(vecCol), typedlit(m.mn.toSeq), typedlit(m.mx.toSeq)).as("__q"))
      .withColumn("cluster", explode(NearestCellsCodes(col("__q"), m.centroids, nProbe)))
      .localCheckpoint()
    // one control-plane job over the checkpointed query side; the
    // resulting literal predicate is what makes the partition pruning
    // unconditional
    val probed = qsBase.select(col("cluster")).distinct()
      .collect().map(_.getInt(0)).sorted
    (qsBase,
      codesAt(spark, v)
        .filter(col("cell").isin(probed.map(Int.box).toSeq: _*))
        .select(col("vec_id").as("__id"), col("__q"), col("cell").as("cluster")))
  }

  /** EXISTENCE screen, not a ranking: the distinct query ids that have AT
    * LEAST ONE indexed vector in their probed cells whose quantized
    * cosine (integer code dot over the exact code-norm product) reaches
    * `threshold`. A top-k ([[search]]) is the WRONG primitive for this —
    * it ranks by the raw dot, which favors large-norm candidates, so an
    * exact copy can sit below rank k while sub-threshold vectors fill the
    * list (measured: the copy at rank 2 behind a 0.90-cosine hit). Here
    * every in-cell candidate is cosine-tested and the semi-join keeps
    * ids, so no near-dup can hide behind a bigger vector. Note the SQ8
    * code space is all-positive (affine 0..255), which puts the
    * background cosine of unrelated vectors near ~0.9 on this corpus —
    * screen thresholds are calibrated IN CODE SPACE (0.95+ ≈ near-exact
    * copies), not raw-vector cosine. */
  def nearDupIds(spark: SparkSession, storeDir: String, queries: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      nProbe: Int = 1): DataFrame = {
    val (qsBase, pruned) = probeJoin(spark, storeDir, queries, idCol, vecCol, nProbe)
    // self-norms are per ROW, computed once per side — inside the filter
    // they re-evaluated per candidate PAIR (3× the dot work of the
    // screen's dominant |batch|×|cell| term). Both must be STRICTLY
    // positive: an all-zero code (a vector saturating the published
    // bounds) has no direction, and the unguarded form degenerated to
    // 0 >= 0 — one zero-code stored row marked every query probing its
    // cell a near-duplicate, silently discarding every later arrival.
    val n2 = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.graft.DotCodes(c, c).cast("double")
    val qn = qsBase.withColumn("__n2", n2(col("__q")))
    val cn = pruned.withColumn("__n2", n2(col("__q")))
    broadcast(qn).as("q").join(cn.as("c"), col("q.cluster") === col("c.cluster"))
      .filter(col("q.__n2") > 0 && col("c.__n2") > 0 &&
        org.apache.spark.sql.graft.DotCodes(col("q.__q"), col("c.__q")).cast("double") >=
          lit(threshold) * sqrt(col("q.__n2") * col("c.__n2")))
      .select(col("q.__id").as("q_id")).distinct()
  }
}
