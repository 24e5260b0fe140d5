package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixed-point k-means — the coarse quantizer that upgrades
  * [[Similarity.ivfTopK]] from a given-cluster column to a REAL IVF index:
  * fit centroids, assign every vector to its nearest cell, search only the
  * query's cell.
  *
  * Determinism: vectors are integer micro-units (Similarity.fixedPoint),
  * distances are exact Longs, centroid updates use integer division, init
  * is the k lowest-id vectors — no RNG, same result on every run/cluster.
  *
  * Scale notes: each Lloyd iteration is one scan + one (cluster, dim)
  * aggregation; centroids (k × dim longs) live on the driver and ship
  * once per plan as a [[org.apache.spark.sql.graft.NearestCells]] codegen
  * reference object — nothing about the candidate table is ever
  * collected.
  */
object KMeansIvf {

  // Centroid ranking runs through the native NearestCells expression: the
  // earlier form unrolled every centroid into a distSq literal column
  // (k × dim literals, duplicated per consumer), which made the generated
  // code grow with k·dim — janino compile time dominated 2 M-row runs at
  // k = 16 already, and a production coarse quantizer (k ≈ √n) could
  // never plan. NearestCells ships the matrix once as a reference object.

  /** Fit k centroids, return (assignments, centroids). Assignments:
    * (idCol, cluster int).
    *
    * Adaptive like a broadcast join: below
    * `spark.graft.kmeans.localThreshold` corpus rows (default 65536) the
    * fixed-point vectors are collected ONCE and Lloyd runs on the driver —
    * the iterations cost array arithmetic instead of an
    * assign-join + centroid-aggregation Spark job each. Above it, the
    * distributed loop below is the only option (no driver holds a 100 TB
    * corpus), and the one probe job it spent deciding is noise against the
    * iterations it runs. Identical centroids and assignments by
    * construction — exact integer math, lowest-id init, first-min
    * tie-break on both paths (spec-asserted). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 3,
      corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) =
    fitImpl(df, idCol, k, iters, corpusKey,
      probe = Similarity.fixedPoint(col(vecCol)),
      work = Similarity.fixedPoint(col(vecCol)),
      readCentroid = _.getSeq[Long](0).toArray,
      nearest = (c, cents) => org.apache.spark.sql.graft.NearestCells.nearest(c, cents),
      unpack = identity)

  /** The ONE Lloyd recipe behind [[fit]] and [[fitCodes]] — local probe,
    * lowest-id init, exact Long distances via the injected nearest-cell
    * expression, per-cluster integer-div means, empty cells keep their
    * centroid. The two public entry points differ ONLY in representation,
    * injected as: `work` (what gets checkpointed — array<long> vs packed
    * binary), `probe` (the array<long> view LocalLloyd consumes),
    * `readCentroid` (how an init row decodes), `nearest` (the codegen
    * nearest-cell expression for that representation), and `unpack` (the
    * array<long> view of the work column feeding the mean aggregation).
    * A tie-break or rounding fix lands here exactly once — the packed and
    * exact paths cannot silently diverge (their equivalence is also
    * spec-pinned). */
  private def fitImpl(df: DataFrame, idCol: String, k: Int, iters: Int,
      corpusKey: Option[String],
      probe: org.apache.spark.sql.Column,
      work: org.apache.spark.sql.Column,
      readCentroid: org.apache.spark.sql.Row => Array[Long],
      nearest: (org.apache.spark.sql.Column, Array[Array[Long]]) => org.apache.spark.sql.Column,
      unpack: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (DataFrame, Array[Array[Long]]) = {
    // The assignment frame on BOTH paths is a pure projection of the
    // input against the final centroids — the fit's own last assignment
    // pass uses the identical deterministic nearest-cell rule (exact Long
    // distances, strict-< first-min; spec-asserted), so projecting equals
    // materializing the per-row assignment. The former local-path shape
    // (collect → createDataFrame → the memoizer's checkpoint pin) spent a
    // parallelize + checkpoint job per fit on rows the projection derives
    // in-scan for free, and the former distributed-path shape kept the
    // work checkpoint alive in the returned lineage.
    def assignProjection(centroids: Array[Array[Long]]): DataFrame =
      df.select(col(idCol).as(idCol), nearest(work, centroids).as("cluster"))

    val localThreshold = df.sparkSession.conf
      .get("spark.graft.kmeans.localThreshold", "65536").toInt
    LocalLloyd.probeSorted(df, idCol, probe, localThreshold, corpusKey).foreach { vecs =>
      val (_, centroids) = LocalLloyd.fit(vecs.map(_._2), k, iters)
      return (assignProjection(centroids), centroids)
    }

    // the checkpointed working set: (id, representation) — nothing else
    val fp = df.select(col(idCol), work.as("__w")).localCheckpoint()

    var centroids: Array[Array[Long]] = fp.orderBy(col(idCol)).limit(k)
      .select("__w").collect().map(readCentroid)

    def assign(frame: DataFrame): DataFrame =
      frame.withColumn("cluster", nearest(col("__w"), centroids))

    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      // __fe is derived per scan inside whole-stage codegen (for the packed
      // representation, one unpack per row; for the exact one it's the
      // stored column itself). Per-cluster integer means as dim sum-columns
      // in ONE aggregation: the shuffle moves k partially-aggregated rows,
      // not the k × dim × |vectors| stream a posexplode would feed it.
      val assigned = assign(fp).withColumn("__fe", unpack(col("__w")))
      val sums = (0 until dim).map(i =>
        sum(element_at(col("__fe"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
      val means = assigned.groupBy(col("cluster")).agg(sums.head, sums.tail: _*).collect()
      val next = Array.tabulate(centroids.length)(i => centroids(i).clone())
      means.foreach { r =>
        val cl = r.getInt(0)
        val n = r.getLong(dim + 1)
        var i = 0
        while (i < dim) { next(cl)(i) = r.getLong(i + 1) / n; i += 1 } // Long '/' ≡ SQL div (trunc toward 0)
      }
      centroids = next
    }

    // the projection re-aliases idCol (fresh exprId), so the standard
    // `input.join(assignments, idCol)` never collides with the caller's
    // attributes — the contract the former checkpoint-derived frame had
    // to restore by hand
    (assignProjection(centroids), centroids)
  }

  /** [[fit]] with the result shared across consumers via
    * [[graft.SharedCache]]: single-probe and multi-probe search over the
    * same corpus/params train the IDENTICAL model (deterministic fit — no
    * RNG), so only the first caller pays the Lloyd iterations; the
    * assignment table is pinned and the centroids memoized on the driver.
    * `cacheKey` must identify corpus + params (include the data dir).
    * The 100 TB analog: a fitted index is written once and every search
    * job loads it, it is not retrained per query. */
  def fitCached(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, cacheKey: Option[String],
      corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) =
    memoized(df, cacheKey)(fit(df, idCol, vecCol, k, iters, corpusKey))

  /** [[fit]] over a PACKED SQ8 code column (binary, unsigned bytes): the
    * same deterministic Lloyd recipe — lowest-id init, exact Long
    * distances, first-min tie-break, integer-div means, empty cells keep
    * their centroid — but the per-iteration working set is the 64-byte
    * code binary, not a ~530-byte array<long> row. That 6–8× is what takes
    * the 20 M-vector fit from storage-bound (each iteration re-reading a
    * spilled 11 GB checkpoint — SCALE.md's ns20/ns30 wall cliff) back to
    * memory-resident. Centroids are k × dim Longs (means of codes) — the
    * identical driver-state bound as [[fit]]. Same [[fitImpl]] skeleton;
    * only the representation pieces (checkpoint the binary, unpack per
    * scan, code-aware nearest-cell expression) differ. */
  def fitCodes(codes: DataFrame, idCol: String, codeCol: String, k: Int,
      iters: Int = 3, corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) = {
    import org.apache.spark.sql.graft.{CodesToLongs, NearestCellsCodes}
    fitImpl(codes, idCol, k, iters, corpusKey,
      probe = CodesToLongs(col(codeCol)),
      work = col(codeCol),
      readCentroid = _.getAs[Array[Byte]](0).map(b => (b & 0xff).toLong),
      nearest = (c, cents) => NearestCellsCodes.nearest(c, cents),
      unpack = c => CodesToLongs(c))
  }

  /** [[fitCodes]] with SharedCache memoization — the [[fitCached]]
    * discipline for the code-trained model. */
  def fitCodesCached(codes: DataFrame, idCol: String, codeCol: String, k: Int,
      iters: Int, cacheKey: Option[String],
      corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) =
    memoized(codes, cacheKey)(fitCodes(codes, idCol, codeCol, k, iters, corpusKey))

  /** The SharedCache memoization shared by [[fitCached]] and
    * [[fitCodesCached]]: only the first caller per key pays `doFit` —
    * the memoized state is the (lazy assignment projection, centroids)
    * pair, all driver-side (the Lloyd work lives in the centroids; the
    * assignment frame is a pure projection against them, so there is
    * nothing to pin — the former per-fit checkpoint of the assignment
    * table was a parallelize + materialization job per pass that bought
    * no recompute savings over the in-scan projection). The 100 TB
    * analog: a fitted index is written once and every search job loads
    * it, it is not retrained per query. */
  private def memoized(df: DataFrame, cacheKey: Option[String])(
      doFit: => (DataFrame, Array[Array[Long]])): (DataFrame, Array[Array[Long]]) =
    cacheKey match {
      case None => doFit
      case Some(key) => graft.SharedCache.getOrComputeValue(s"$key:fit")(doFit)
    }

  /** The corpus frame with its cell attached, pinned via
    * [[graft.SharedCache]] under `<cacheKey>:cells:<tag>`. Six catalog
    * entries (ns20/ns30/ns61/ns62, ns65's cell scoping, plus recall
    * consumers) read the same (id → cell) corpus and re-derived it per
    * entry — one pin makes every consumer after the first a checkpoint
    * scan. The cell is a PURE PROJECTION against the fitted centroids
    * (`clusterCol` — the same deterministic nearest-cell expression the
    * fit's own final assignment uses, so projecting equals joining the
    * assignment table; ProductQuantizer.ivfPqTopK states the argument).
    * The former id equi-join with the assignment frame was a broadcast
    * build + join at bench scale and a corpus-sized equi-join at 100 TB —
    * an exchange the projection simply does not have (guide §2.4). The
    * 100 TB analog: a PUBLISHED index stores vectors WITH their cell
    * ([[graft.streaming.IvfStore]]'s on-disk layout is exactly this
    * frame), so search jobs read it — they do not re-derive it. `tag`
    * separates representations under one fit key (exact vectors vs
    * packed codes). */
  private[graft] def cellsCached(frame: DataFrame,
      clusterCol: org.apache.spark.sql.Column, cacheKey: Option[String],
      tag: String): DataFrame =
    cacheKey match {
      case None => frame.withColumn("cluster", clusterCol)
      case Some(key) => graft.SharedCache.getOrCompute(s"$key:cells:$tag",
        frame.sparkSession)(frame.withColumn("cluster", clusterCol))
    }

  /** IVF entirely over PACKED SQ8 codes — the 100 TB scale path for
    * [[search]]: quantize the corpus once (binary codes, 64 B/vector), fit
    * the coarse cells ON the codes, rank in-cell by the exact integer dot
    * product of the codes. Every byte the fit iterations and the candidate
    * scan touch is quantized — 6–8× less storage/bandwidth than the exact
    * path, which is the difference between memory-resident and
    * storage-bound at 20 M+ vectors (SCALE.md). Semantics are
    * engine-independent by construction (integer quantization, integer
    * Lloyd, integer dots), so the DuckDB oracle replays them exactly —
    * this is a DIFFERENT (approximate-by-quantization) ranking than
    * [[search]], not a drop-in: recall tracks SQ8 quantization quality. */
  def searchSq8(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, iters: Int = 3,
      boundsCacheKey: Option[String] = None,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    val codes = Similarity.sq8PackedCodes(candidates, idCol, vecCol, boundsCacheKey)
    val (_, centroids) =
      fitCodesCached(codes, idCol, "__q", nCells, iters, cacheKey, corpusKey)
    val cands = cellsCached(codes,
      org.apache.spark.sql.graft.NearestCellsCodes.nearest(col("__q"), centroids),
      cacheKey, "codes")
    // queries drawn from the corpus by id: their codes and cells come from
    // the same quantize/assign pass — no separate query-side encode
    val qs = broadcast(cands.join(queries.select(col(idCol)), Seq(idCol))
      .withColumnRenamed(idCol, "__id"))
    rankCodes(qs, cands.withColumnRenamed(idCol, "__id"), k)
  }

  /** The in-cell quantized ranking tail shared by [[searchSq8]],
    * [[searchSq8MultiProbe]], and [[graft.streaming.IvfStore.search]]:
    * cell equi-join, DotCodes similarity, per-query (qsim DESC, cand_id)
    * top-k. Both sides carry (__id, __q, cluster); the query side is
    * already broadcast-hinted. `excludeSelf` drops candidates whose id
    * equals the query id — right for the catalog entries (queries drawn
    * FROM the corpus, self-hit is a degenerate rank-1), wrong for a store
    * searched with EXTERNAL queries, where the two id namespaces are
    * unrelated and an id collision would silently hide a valid candidate
    * ([[graft.streaming.IvfStore.search]] passes false). `dedupTies`
    * drops repeated (q_id, cand_id) hits before ranking — the store's
    * replay-across-refit window can briefly hold one vector twice as
    * EXACT copies, and both would otherwise claim top-k slots. Exact
    * copies share one qsim, so the duplicates are ADJACENT under the
    * ranking order and one lag() comparison in the SAME window (same
    * partitioning, same sort — no extra exchange) removes them; a
    * same-id pair with different codes (a contract violation) is not
    * adjacent and not this backstop's job. */
  private[graft] def rankCodes(qs: DataFrame, cs: DataFrame, k: Int,
      excludeSelf: Boolean = true, dedupTies: Boolean = false,
      withNorms: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sameCell = col("q.cluster") === col("c.cluster")
    val w = Window.partitionBy(col("q_id")).orderBy(col("qsim").desc, col("cand_id"))
    // withNorms: append both sides' code self-dots — what a consumer
    // needs to turn the raw integer dot into a quantized cosine (the
    // online near-dup screen's threshold metric) without a second pass
    // over the code table
    val normCols = if (withNorms)
      Seq(org.apache.spark.sql.graft.DotCodes(col("q.__q"), col("q.__q")).as("q_nsq"),
        org.apache.spark.sql.graft.DotCodes(col("c.__q"), col("c.__q")).as("cand_nsq"))
    else Seq.empty
    val scored = qs.as("q").join(cs.as("c"),
        if (excludeSelf) sameCell && col("q.__id") =!= col("c.__id") else sameCell)
      .select(Seq(col("q.__id").as("q_id"), col("c.__id").as("cand_id"),
        org.apache.spark.sql.graft.DotCodes(col("q.__q"), col("c.__q")).as("qsim"))
        ++ normCols: _*)
    val unique = if (dedupTies)
      scored.withColumn("__prev", lag(col("cand_id"), 1).over(w))
        .filter(col("__prev").isNull || col("__prev") =!= col("cand_id"))
        .drop("__prev")
    else scored
    unique.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Multi-probe [[searchSq8]]: each query probes its `nProbe` nearest
    * cells (ties to the lower cell id) — the recall knob of
    * [[searchMultiProbe]] on the packed-code scale path. Candidates keep
    * unique cell assignments, so probing several cells never duplicates a
    * (query, candidate) pair; the fan-out multiplies only the broadcast
    * query side. */
  def searchSq8MultiProbe(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int, iters: Int = 3,
      boundsCacheKey: Option[String] = None,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.graft.NearestCellsCodes
    val codes = Similarity.sq8PackedCodes(candidates, idCol, vecCol, boundsCacheKey)
    val (_, centroids) =
      fitCodesCached(codes, idCol, "__q", nCells, iters, cacheKey, corpusKey)
    val cands = cellsCached(codes,
      org.apache.spark.sql.graft.NearestCellsCodes.nearest(col("__q"), centroids),
      cacheKey, "codes")
    // queries probe their nProbe nearest cells, ranked by the same
    // (distance, cell) order as the assignment pass. Query codes read
    // from the pinned cells frame like every other consumer (the
    // single-assignment cluster is dropped — multi-probe derives its
    // own cells); the unpinned form re-paid the corpus scan + SQ8
    // encode per execution.
    val qs = broadcast(cands.drop("cluster")
      .join(queries.select(col(idCol)), Seq(idCol))
      .withColumn("cluster", explode(NearestCellsCodes(col("__q"), centroids, nProbe)))
      .withColumnRenamed(idCol, "__id"))
    rankCodes(qs, cands.withColumnRenamed(idCol, "__id"), k)
  }

  /** Full IVF search: fit on the candidate set, assign queries to their
    * nearest centroid, search only that cell.
    *
    * QUERIES ARE CORPUS-DRAWN BY ID — the contract the whole family
    * shares (searchSq8's scaladoc states it for the code path): query
    * vectors and cells are read from the pinned cells frame by an inner
    * id join, so an id absent from `candidates` contributes no result
    * rows. (This was already true before the r15 pin — the assignment
    * join this replaced was inner too; external-vector search is
    * [[Similarity.bruteForceTopK]]/[[Similarity.ivfTopK]]'s job, or
    * [[graft.streaming.IvfStore.search]] for a published index.) */
  def search(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, iters: Int = 3,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      assertCovered: Boolean = false): DataFrame = {
    val (_, centroids) =
      fitCached(candidates, idCol, vecCol, nCells, iters, cacheKey, corpusKey)
    val cands = cellsCached(candidates,
      org.apache.spark.sql.graft.NearestCells.nearest(
        Similarity.fixedPoint(col(vecCol)), centroids),
      cacheKey, "exact")
    if (assertCovered) requireCovered(queries, cands, idCol, "search")
    // queries drawn from the corpus by id (the inner assignment join this
    // replaces already implied it — a non-corpus id silently dropped):
    // vectors and cells both come from the pinned cells frame, so the
    // query side costs one small semi-join over the checkpoint scan
    // instead of a second corpus scan + assignment probe — the searchSq8
    // shape
    val qs = cands.join(broadcast(queries.select(col(idCol))), Seq(idCol))
    Similarity.ivfTopK(qs, cands, idCol, vecCol, "cluster", k)
  }

  /** Multi-probe IVF search: each query probes its `nProbe` nearest cells
    * (ties broken by cell id) instead of one — the standard recall knob.
    * Every candidate lives in exactly ONE cell, so probing several cells
    * never duplicates a (query, candidate) pair; the probe fan-out just
    * multiplies the broadcast query side by nProbe, and the cell equi-join
    * stays an ordinary hash join over the candidate table.
    *
    * QUERIES ARE CORPUS-DRAWN BY ID since r15 (see [[search]]'s contract
    * note): query vectors read from the pinned cells frame by an inner id
    * join — this NARROWED the previous behavior, which used the `queries`
    * frame's own vectors and accepted external ids. Every caller (catalog,
    * specs, smoke) draws queries from the corpus; external-vector search
    * belongs to the [[Similarity]] entry points. */
  def searchMultiProbe(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int, iters: Int = 3,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      assertCovered: Boolean = false): DataFrame = {
    val (_, centroids) =
      fitCached(candidates, idCol, vecCol, nCells, iters, cacheKey, corpusKey)
    val cands = cellsCached(candidates,
      org.apache.spark.sql.graft.NearestCells.nearest(
        Similarity.fixedPoint(col(vecCol)), centroids),
      cacheKey, "exact")
    if (assertCovered) requireCovered(queries, cands, idCol, "searchMultiProbe")
    // the nProbe nearest cells per query, ascending by (distance, cell) —
    // NearestCells reproduces the former sort_array(struct(d, c)) order,
    // tie-break included. Query vectors read from the pinned cells frame
    // (corpus-drawn by contract, like search); the single-assignment
    // cluster column is dropped — multi-probe derives its own cells.
    val probed = cands.select(col(idCol), col(vecCol))
      .join(broadcast(queries.select(col(idCol))), Seq(idCol))
      .select(col(idCol), col(vecCol), Similarity.fixedPoint(col(vecCol)).as("__fe"))
      .withColumn("cluster", explode(
        org.apache.spark.sql.graft.NearestCells(col("__fe"), centroids, nProbe)))
      .select(col(idCol), col(vecCol), col("cluster"))
    Similarity.ivfTopK(probed, cands, idCol, vecCol, "cluster", k)
  }

  /** EXTERNAL-VECTOR IVF search — the entry point for query ids NOT drawn
    * from the candidate corpus. [[search]]/[[searchMultiProbe]] read query
    * vectors from the pinned cells frame by an inner id join (one
    * checkpoint-scan semi-join instead of a second corpus scan), which
    * means an id absent from the corpus contributes ZERO result rows; a
    * caller with its own query vectors must come through here instead.
    * The queries frame supplies its own vectors, each assigned in-scan to
    * its `nProbe` nearest fitted cells (the multi-probe shape; nProbe=1 is
    * plain IVF), and self-hits are NOT excluded — the two id namespaces
    * are unrelated, so an id collision must not hide a valid candidate
    * (the [[rankCodes]] `excludeSelf=false` argument; IvfStore.search is
    * the published-index version of this entry point). */
  def searchVectors(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int = 1, iters: Int = 3,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    val (_, centroids) =
      fitCached(candidates, idCol, vecCol, nCells, iters, cacheKey, corpusKey)
    val cands = cellsCached(candidates,
      org.apache.spark.sql.graft.NearestCells.nearest(
        Similarity.fixedPoint(col(vecCol)), centroids),
      cacheKey, "exact")
    val probed = queries.select(col(idCol), col(vecCol))
      .select(col(idCol), col(vecCol), Similarity.fixedPoint(col(vecCol)).as("__fe"))
      .withColumn("cluster", explode(
        org.apache.spark.sql.graft.NearestCells(col("__fe"), centroids, nProbe)))
      .select(col(idCol), col(vecCol), col("cluster"))
    Similarity.ivfTopK(probed, cands, idCol, vecCol, "cluster", k,
      excludeSelf = false)
  }

  /** Opt-in loud failure for the corpus-drawn-by-id contract: a query id
    * absent from the corpus otherwise silently contributes zero result
    * rows (ADVICE r15). One left-anti against the pinned cells frame's id
    * column, limit-bounded — opt-in (`assertCovered`) because it is an
    * extra pass over the corpus ids per search call; harnesses and
    * first-time callers turn it on, standing production queries that own
    * their id discipline leave it off. */
  private def requireCovered(queries: DataFrame, cands: DataFrame,
      idCol: String, caller: String): Unit = {
    val missing = queries.select(col(idCol))
      .join(cands.select(col(idCol)), Seq(idCol), "left_anti")
      .limit(5).collect()
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"$caller: query ids absent from the candidate corpus (first " +
          s"${missing.length}): ${missing.map(_.get(0)).mkString(", ")} — " +
          "queries are corpus-drawn by id here; use searchVectors for " +
          "external query vectors")
  }

  /** RECALL-TARGETED nProbe auto-calibration for the SQ8 IVF family:
    * runs the ns63-shaped recall@k evaluation at every nProbe in
    * 1..maxProbe over a QUERY SAMPLE against brute-force truth, and
    * reports the smallest nProbe whose sampled mean recall meets
    * `target` — the knob ns62/ns68 took as manual input. Output: one row
    * per probed setting `(n_probe, mean_recall, chosen)`, ascending;
    * exactly one row is chosen (maxProbe when no setting reaches the
    * target, so the caller still gets the best available).
    *
    * Cost model: ONE brute-force truth pass over (sample × corpus) —
    * the price every recall harness pays, bounded by the sample size —
    * plus ONE cell-pruned evaluation pipeline covering ALL maxProbe
    * settings at once: each (query, candidate) pair is tagged with the
    * probe rank that first admits it (a candidate's unique cell matches
    * at most one of the query's ranked cells), exploded into every
    * setting ≥ that rank, and ranked per (setting, query) in one window
    * — the looped form paid maxProbe full search+join jobs for the same
    * numbers (A/B at sf0.1: 1.60 s → one-pass form, same hash-green
    * oracle row, which replays exactly this probe-rank shape).
    * Driver-side state: maxProbe hit counters. mean recall is a single
    * double division of exact integer counts, so the DuckDB oracle
    * reproduces it bit-for-bit. */
  def calibrateNProbeSq8(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int, iters: Int,
      maxProbe: Int, target: Double,
      boundsCacheKey: Option[String] = None,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      truthKey: Option[String] = None,
      calKey: Option[String] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val (evaluated, chosen) = calibrateSq8Values(queries, candidates, idCol,
      vecCol, k, nCells, iters, maxProbe, target, boundsCacheKey, cacheKey,
      corpusKey, truthKey, calKey)
    evaluated.map { case (p, r) => (p, r, p == chosen) }
      .toDF("n_probe", "mean_recall", "chosen")
  }

  /** The driver-side calibration core behind [[calibrateNProbeSq8]] and
    * [[autoTunedSearchSq8]]: (per-setting mean recalls, chosen setting).
    *
    * `truthKey` pins the sample's brute-force truth in
    * [[graft.SharedCache]] so every harness grading against the SAME
    * (sample, k) truth — the ns44/ns63 recall rows and this calibration —
    * computes it once per run instead of once per consumer. `calKey`
    * memoizes the WHOLE evaluation (≤ maxProbe (recall, setting) pairs of
    * driver state): the composed calibrate→search entry and the
    * calibration-report entry consume the identical deterministic
    * evaluation, which is exactly the production shape — calibrate once,
    * store the pick, every search reads it (the stored-pick discipline
    * VERDICT r19 asked ns76 to prove). Both keys must identify corpus +
    * sample + params like every SharedCache key. */
  private def calibrateSq8Values(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int, iters: Int,
      maxProbe: Int, target: Double,
      boundsCacheKey: Option[String],
      cacheKey: Option[String],
      corpusKey: Option[String],
      truthKey: Option[String],
      calKey: Option[String]): (Seq[(Long, Double)], Long) = {
    require(maxProbe >= 1 && maxProbe <= nCells,
      s"maxProbe must be in 1..nCells, got $maxProbe (nCells=$nCells)")
    val spark = queries.sparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graft.{DotCodes, NearestCellsCodes}
    def evaluate(): (Seq[(Long, Double)], Long) = {
      val (brute, pinned) = truthKey match {
        case Some(tk) => (graft.SharedCache.getOrCompute(tk, spark)(
          Similarity.bruteTruth(queries, candidates, idCol, vecCol, k)), true)
        case None => (Similarity.bruteTruth(queries, candidates, idCol, vecCol, k)
          .localCheckpoint(), false) // truth is read by hit count AND nq below
      }
      try {
        val codes = Similarity.sq8PackedCodes(candidates, idCol, vecCol, boundsCacheKey)
        val (_, centroids) =
          fitCodesCached(codes, idCol, "__q", nCells, iters, cacheKey, corpusKey)
        val cands = cellsCached(codes,
          NearestCellsCodes.nearest(col("__q"), centroids), cacheKey, "codes")
        // queries with their maxProbe-ranked cells; posexplode position =
        // probe rank − 1 (the same (distance, cell) order the assignment
        // and searchSq8MultiProbe use)
        val qs = broadcast(cands.drop("cluster")
          .join(queries.select(col(idCol)), Seq(idCol))
          .select(col(idCol).as("__id"), col("__q"),
            posexplode(NearestCellsCodes(col("__q"), centroids, maxProbe))))
          .withColumnRenamed("pos", "__prank0")
          .withColumnRenamed("col", "cluster")
        val cs = cands.withColumnRenamed(idCol, "__cid")
        // each pair joins through the candidate's UNIQUE cell, so it carries
        // exactly one first-admitting probe rank — explode it into every
        // setting from that rank up, then one ranking window per (setting,
        // query) yields all maxProbe top-k lists in a single pipeline
        val perP = qs.as("q").join(cs.as("c"),
            col("q.cluster") === col("c.cluster") && col("q.__id") =!= col("c.__cid"))
          .select(col("q.__id").as("q_id"), col("c.__cid").as("cand_id"),
            DotCodes(col("q.__q"), col("c.__q")).as("qsim"),
            (col("q.__prank0") + 1).as("__minp"))
          .withColumn("p", explode(sequence(col("__minp"), lit(maxProbe))))
        val w = Window.partitionBy(col("p"), col("q_id"))
          .orderBy(col("qsim").desc, col("cand_id"))
        val topk = perP.withColumn("__rnk", row_number().over(w))
          .filter(col("__rnk") <= k)
          .select(col("p"), col("q_id"), col("cand_id"))
        val (hitRows, nq) = collectHitsAndNq(brute, topk)
        require(nq > 0, "calibrateNProbeSq8: the query sample produced no " +
          "brute-force truth rows (empty sample, or every query id is absent " +
          "from the corpus) — a recall target over zero queries is undefined")
        val evaluated = (1 to maxProbe).map { p =>
          (p.toLong, hitRows.getOrElse(p.toLong, 0L).toDouble / (k * nq))
        }
        val chosen = evaluated.find(_._2 >= target).map(_._1)
          .getOrElse(maxProbe.toLong)
        (evaluated, chosen)
      // the returned values are driver-side counts — no lineage on `brute`
      // — so a PRIVATE checkpoint can be dropped here instead of leaking
      // block-manager storage per calibration in a long-lived session; a
      // pinned truth is owned (and shared) by SharedCache
      } finally if (!pinned) brute.unpersist(blocking = false)
    }
    calKey match {
      case Some(ck) => graft.SharedCache.getOrComputeValue(s"$ck:eval")(evaluate())
      case None => evaluate()
    }
  }

  /** One action for the calibration's two scalar reads: per-setting hit
    * counts UNION the truth's distinct-query count (tagged p = 0 — probe
    * settings start at 1), collected together — the split form paid a
    * separate driver round-trip (job) for the nq count. */
  private[graft] def collectHitsAndNq(truth: DataFrame, topk: DataFrame)
      : (Map[Long, Long], Long) = {
    val hits = truth.join(topk, Seq("q_id", "cand_id"))
      .groupBy(col("p")).agg(count(lit(1)).as("s"))
      .select(col("p").cast("long").as("p"), col("s"))
    val nqRow = truth.agg(count_distinct(col("q_id")).as("s"))
      .select(lit(0L).as("p"), col("s"))
    val rows = hits.unionByName(nqRow).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (rows - 0L, rows.getOrElse(0L, 0L))
  }

  /** Composed calibrate→search for the SQ8 IVF family: run the
    * recall-targeted calibration ([[calibrateNProbeSq8]]) over the query
    * sample and immediately search with the CHOSEN setting — the
    * auto-tuned knob is load-bearing here, not advisory (ns62 takes
    * nProbe as a manual literal; ns76 is this composition). Returns the
    * [[searchSq8MultiProbe]] frame with the chosen setting appended as
    * a constant `n_probe` column, so a consumer can audit which knob
    * produced each page.
    *
    * Cost: the SQ8 bounds pass, the code k-means fit, and the cell
    * table all ride the SAME SharedCache keys as the calibration, so
    * the composition trains ONCE; the only cost on top of a manual-knob
    * search is the calibration harness itself (sample-bounded brute
    * truth + the one-pass probe-rank pipeline). Driver-side state: the
    * calibration frame is already driver-built (≤ maxProbe rows), so
    * reading the chosen setting adds no job. */
  def autoTunedSearchSq8(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int, iters: Int,
      maxProbe: Int, target: Double,
      boundsCacheKey: Option[String] = None,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      truthKey: Option[String] = None,
      calKey: Option[String] = None): DataFrame = {
    // the chosen setting comes straight off the driver-side calibration
    // values (memoized under calKey — the stored pick the search consumes);
    // no intermediate frame, no extra action
    val (_, chosen) = calibrateSq8Values(queries, candidates, idCol, vecCol,
      k, nCells, iters, maxProbe, target, boundsCacheKey, cacheKey,
      corpusKey, truthKey, calKey)
    searchSq8MultiProbe(queries, candidates, idCol, vecCol, k, nCells,
        chosen.toInt, iters, boundsCacheKey, cacheKey, corpusKey)
      .withColumn("n_probe", lit(chosen))
  }
}
