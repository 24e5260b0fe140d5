package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the compressed-domain
  * complement to [[Similarity.sq8TopK]]: instead of quantizing each
  * DIMENSION to a byte, the vector is split into `m` subvectors and each
  * subvector is vector-quantized against its own `ks`-entry codebook, so a
  * 64-dim float vector compresses to m=4 one-byte codes (64× less scan
  * bandwidth than floats; 16× less than SQ8).
  *
  * Codebooks use the same deterministic fixed-point Lloyd recipe as
  * [[KMeansIvf]] (integer micro-units, lowest-id init, lowest-code argmin
  * ties, integer-division means — no RNG), and all `m` subspaces train
  * JOINTLY: each row of the exploded (id, subspace, subvector) membership
  * table picks its nearest code via the reference-object
  * [[org.apache.spark.sql.graft.NearestCells]] expression (a projection —
  * no literal unrolling, no join), and one map-side-combined aggregation
  * on (subspace, code) yields all m×ks new centroids in a single
  * config-sized shuffle per iteration. Literal-unrolled distance columns
  * were measured making every Lloyd step a fresh multi-hundred-ms
  * whole-stage compile; an earlier broadcast-join + min(struct) form
  * re-aggregated |corpus|·m joined rows per pass — both are gone.
  *
  * Search is asymmetric distance computation (ADC): each query precomputes
  * an EXACT integer table of squared L2 distances from its subvectors to
  * every codebook entry (m × ks longs — the same broadcast join, assembled
  * into a code-indexed array), and a candidate's distance is m table
  * lookups summed. Engine-identical ranking by construction: every
  * distance is an exact Long, and the DuckDB oracle replays the training
  * bit-for-bit.
  *
  * Scale notes: codebooks are m×ks×(dim/m) longs on the driver (like the
  * IVF centroids) and ride to executors as NearestCells reference
  * objects; candidate encoding is a pure projection (m nearest-code
  * columns straight off the vector), so the corpus is never exploded,
  * joined, or shuffled full-width — only the m×ks partially-aggregated
  * centroid rows move during training; the query side (id + m×ks-long
  * table) broadcasts; ranking shuffles only (q_id, dist) pairs through
  * the per-query window. At 100 TB the candidate table stores ONLY the m
  * byte-codes — the corpus scan that PQ exists to shrink.
  */
object ProductQuantizer {

  /** Exploded membership table: one (id, ss, fe, nsq) row per vector per
    * subspace — total volume equals the original vectors, just re-keyed by
    * subspace. Pure expression — TRAINING persists it (the init collect
    * materializes the cache as part of its own job, every Lloyd pass after
    * that reads cached blocks) and releases it when the last Lloyd collect
    * returns; the only other consumer is the |Q|-row query-table slice, so
    * `pqTopK` leaves nothing cached behind. */
  private def memberRows(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int): DataFrame = {
    val sub = dim / m
    val subVectors = (0 until m).map(j =>
      Similarity.fixedPoint(slice(col(vecCol), j * sub + 1, sub)))
    df.select(col(idCol).as("__pqid"),
        posexplode(array(subVectors: _*)).as(Seq("ss", "fe")))
      .withColumn("nsq", Similarity.dotFp(col("fe"), col("fe")))
  }

  /** Fit codebooks on a persisted member table and release the cache as
    * soon as the last (eager) training collect has consumed it — callers
    * never inherit a persistent RDD from training. */
  private def trainBooks(candidates: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ks: Int, iters: Int,
      corpusKey: Option[String] = None): Array[Array[Array[Long]]] = {
    // Adaptive like KMeansIvf.fit: below the shared threshold the vectors
    // collect once and all m subspaces train on the driver (fixedPoint
    // commutes with subvector slicing, so the Longs are identical);
    // above it, the joint distributed Lloyd below — bit-equal codebooks
    // either way (spec-asserted). With `corpusKey` the collected corpus is
    // shared with the IVF k-means fit over the same vectors.
    val threshold = candidates.sparkSession.conf
      .get("spark.graft.kmeans.localThreshold", "65536").toInt
    LocalLloyd.probeSorted(candidates, idCol, Similarity.fixedPoint(col(vecCol)),
        threshold, corpusKey).foreach { sorted =>
      val sub = dim / m
      return Array.tabulate(m) { j =>
        LocalLloyd.fit(sorted.map(_._2.slice(j * sub, j * sub + sub)), ks, iters)._2
      }
    }
    val members = memberRows(candidates, idCol, vecCol, dim, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try fitOnMembers(members, dim / m, m, ks, iters)
    finally members.unpersist(blocking = false)
  }

  /** Codebooks as a broadcastable (ss, cl, cfe, cnsq) frame. */
  private def centroidFrame(df: DataFrame, books: Array[Array[Array[Long]]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    books.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (c, cl) =>
        (j, cl, c.toSeq, c.map(v => v * v).sum)
      }
    }.toSeq.toDF("ss", "cl", "cfe", "cnsq")
  }

  /** Exact squared L2 distance of a member row to a joined centroid row:
    * |x|² − 2x·c + |c|², all Longs. */
  private val distExpr: Column =
    col("nsq") - lit(2L) * Similarity.dotFp(col("fe"), col("cfe")) + col("cnsq")

  /** Per-row nearest code for an (ss, fe) member row: a lazily-branched
    * when-chain of [[org.apache.spark.sql.graft.NearestCells]] over the m
    * codebooks — a PROJECTION (k·(dim/m) multiply-adds per row through one
    * reference-object matrix each), where the former shape broadcast-joined
    * every member row against all ks codes and re-grouped the m·ks-times
    * larger frame back down with a min(struct) ObjectHashAggregate on
    * |corpus|·m keys. Identical codes: NearestCells' strict-< first-min is
    * the same lowest-code tie rule. */
  private def nearestCode(books: Array[Array[Array[Long]]]): Column =
    books.indices.tail.foldLeft(
      when(col("ss") === 0, org.apache.spark.sql.graft.NearestCells.nearest(
        col("fe"), books(0)))) { (acc, j) =>
      acc.when(col("ss") === j, org.apache.spark.sql.graft.NearestCells.nearest(
        col("fe"), books(j)))
    }

  /** Joint Lloyd over all subspaces: one assignment projection + one
    * (ss, cl) mean aggregation per iteration. */
  private def fitOnMembers(members: DataFrame, sub: Int, m: Int, ks: Int,
      iters: Int): Array[Array[Array[Long]]] = {
    // init: the ks lowest-id subvectors of every subspace. Every vector
    // carries all m subspaces, so the globally-lowest m×ks (id, ss) rows
    // ARE the per-subspace seeds — a TakeOrdered (top-k per partition +
    // driver merge), no window shuffle
    val init = members.select(col("__pqid"), col("ss"), col("fe"))
      .orderBy(col("__pqid"), col("ss")).limit(m * ks).collect()
    require(init.length == m * ks, s"need at least $ks vectors to seed $ks codes")
    val seedIds = init.map(_.get(0)).distinct // ascending: rows arrive id-sorted
    // The fast path is valid only when the m×ks rows are a bijection onto
    // ks distinct ids × m subspaces. A duplicated id straddling the limit
    // boundary can pass both length checks alone while leaving some (id,
    // ss) cells doubly-written and others empty — empty centroids would
    // then flow silently into the distance join.
    val exactCross =
      init.map(r => (r.get(0), r.getInt(1))).distinct.length == m * ks
    var books =
      if (seedIds.length == ks && exactCross) {
        val seedIdx = seedIds.zipWithIndex.toMap
        val b = Array.fill(m, ks)(Array.empty[Long])
        init.foreach(r =>
          b(r.getInt(1))(seedIdx(r.get(0))) = r.getSeq[Long](2).toArray)
        b
      } else {
        // duplicate id values: the globally-lowest m*ks rows span fewer
        // than ks distinct ids, so seed with the per-subspace window rank
        // instead (the pre-TakeOrdered init — one extra shuffle, only on
        // this degenerate input)
        val winit = members.withColumn("__rn",
            row_number().over(Window.partitionBy(col("ss")).orderBy(col("__pqid"))))
          .filter(col("__rn") <= ks)
          .select(col("ss"), (col("__rn") - 1).cast("int").as("cl"), col("fe")).collect()
        require(winit.length == m * ks, s"need at least $ks vectors to seed $ks codes")
        val b = Array.fill(m, ks)(Array.empty[Long])
        winit.foreach(r => b(r.getInt(0))(r.getInt(1)) = r.getSeq[Long](2).toArray)
        b
      }

    val sums = (0 until sub).map(i =>
      sum(element_at(col("fe"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
    for (_ <- 1 to iters) {
      val means = members.withColumn("cl", nearestCode(books))
        .groupBy(col("ss"), col("cl")).agg(sums.head, sums.tail: _*).collect()
      // empty codes keep their previous centroid, like KMeansIvf.fit
      val next = Array.tabulate(m, ks)((j, c) => books(j)(c).clone())
      means.foreach { r =>
        val j = r.getInt(0)
        val cl = r.getInt(1)
        val n = r.getLong(sub + 2)
        var i = 0
        while (i < sub) { next(j)(cl)(i) = r.getLong(i + 2) / n; i += 1 } // Long '/' ≡ SQL div
      }
      books = next
    }
    books
  }

  /** Per-subspace codebooks fitted on the candidate corpus: element j is a
    * ks × (dim/m) array of fixed-point centroids. */
  def fitCodebooks(candidates: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, ks: Int, iters: Int): Seq[Array[Array[Long]]] = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    trainBooks(candidates, idCol, vecCol, dim, m, ks, iters).toSeq
  }

  /** ADC top-k: fit codebooks on the candidates, encode candidates to m
    * codes, rank by summed distance-table lookups (ascending — PQ
    * approximates L2 distance, not cosine). Queries are drawn from the
    * candidate corpus by id, like the other ANN catalog entries.
    *
    * `cacheKey` (include the data dir + params) memoizes the fitted
    * codebooks in [[graft.SharedCache]] so repeat consumers over the same
    * corpus skip the Lloyd iterations — training is deterministic, the
    * shared fit is bit-identical to a private one. With or without it,
    * `pqTopK` leaves no persistent RDDs behind: the training cache is
    * released when the last Lloyd collect returns, and the encode/query
    * scans are lazy single passes over the corpus. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, m: Int = 4, ks: Int = 16,
      iters: Int = 2, cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val books = cacheKey match {
      case Some(key) => graft.SharedCache.getOrComputeValue(s"$key:codebooks")(
        trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey))
      case None => trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey)
    }
    val sub = dim / m

    // candidate codes: nearest code per subspace as m PROJECTION columns
    // straight off the vector column — no member explode, no broadcast
    // join, no per-corpus-key aggregation; encoding is a pure scan, which
    // is the whole point of PQ at 100 TB (the former min(when(ss=j,
    // struct(d, cl))) pivot re-aggregated |corpus|·m joined rows)
    val codeCols = (0 until m).map(j =>
      org.apache.spark.sql.graft.NearestCells.nearest(
        Similarity.fixedPoint(slice(col(vecCol), j * sub + 1, sub)), books(j))
        .as(s"__c$j"))
    val coded = candidates.select(col(idCol).as("__pqid") +: codeCols: _*)

    // query ADC tables: all m×ks EXACT distances per query (these are the
    // output pq_dist values, so they keep the full |x|²−2x·c+|c|² form via
    // the codebook-frame join), assembled into code-indexed arrays per
    // subspace in one aggregation. Members are derived from the |Q|-row
    // semi-joined corpus slice, not the full corpus.
    val qcand = candidates.join(broadcast(queries.select(col(idCol))), idCol)
    val cents = centroidFrame(candidates, books)
    val tabAggs = (0 until m).map(j =>
      transform(array_sort(collect_list(
          when(col("ss") === j, struct(col("cl"), col("d"))))),
        x => x.getField("d")).as(s"__dt$j"))
    val qtabs = memberRows(qcand, idCol, vecCol, dim, m)
      .join(broadcast(cents), "ss")
      .select(col("__pqid"), col("ss"), col("cl"), distExpr.as("d"))
      .groupBy(col("__pqid")).agg(tabAggs.head, tabAggs.tail: _*)

    val dist = (0 until m).map(j =>
      element_at(col(s"q.__dt$j"), col(s"c.__c$j") + 1)).reduce(_ + _)
    broadcast(qtabs).as("q")
      .join(coded.as("c"), col("q.__pqid") =!= col("c.__pqid"))
      .select(col("q.__pqid").as("q_id"), col("c.__pqid").as("cand_id"),
        dist.as("pq_dist"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("pq_dist").asc, col("cand_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ — the canonical composed index (FAISS's "IVFx,PQy" family,
    * codebooks on raw vectors rather than residuals): coarse k-means
    * cells PRUNE the candidate set, PQ ADC RANKS within the query's cell.
    * [[pqTopK]] scores |Q|·|corpus| pairs; here each query scores only
    * its own cell's candidates (~|corpus|/nCells), which is what makes
    * ADC viable when the corpus no longer fits a single scan budget —
    * the cells play exactly the role [[KMeansIvf.search]] gives them,
    * and the in-cell metric is the m-lookup ADC sum instead of the exact
    * dot.
    *
    * Both trainings are the shared deterministic integer Lloyd, so the
    * composition stays engine-exact end-to-end and the DuckDB oracle
    * replays the whole thing: cell chain (ns20's CTEs) + PQ chain
    * (ns42's CTEs) + the same-cell join. Cells are assigned by a PURE
    * PROJECTION against the fitted centroids (the same
    * [[org.apache.spark.sql.graft.NearestCells]] expression the fit's
    * own final assignment pass uses — deterministic, so projecting
    * equals joining the assignment table without the corpus-sized
    * equi-join). With nCells = 1 the cell predicate is vacuous and the
    * ranking equals [[pqTopK]] (spec-pinned).
    *
    * Scale shape: candidate side carries (id, cell, m byte-codes) — a
    * pure scan projection; query side broadcasts (id, cell, m×ks
    * tables); the join keys on the cell, so a 100 TB corpus partitioned/
    * bucketed by cell serves each probe from one partition's worth of
    * codes. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, nCells: Int, m: Int = 4, ks: Int = 16,
      iters: Int = 2, cellIters: Int = 2, cacheKey: Option[String] = None,
      cellCacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      // recall knob (the ns30/ns62 pattern on the composed index): each
      // query probes its nProbe nearest cells, ascending (distance, cell).
      // Candidates keep unique cell assignments, so the fan-out multiplies
      // only the broadcast query side — never duplicates a (q, cand) pair.
      nProbe: Int = 1,
      // scale knob: train/assign the COARSE CELLS on packed SQ8 codes
      // (KMeansIvf.fitCodes) instead of raw vectors — at 20 M+ the exact
      // cell Lloyd is storage-bound (SCALE.md's ns20 cliff; its fix,
      // ns61, IS this representation) while the 64 B/vec code fit stays
      // memory-resident. Cell boundaries differ slightly from the exact
      // fit (code-space vs raw-space Lloyd); the in-cell ADC ranking is
      // unchanged. The catalog entry keeps the exact fit (false) so the
      // oracle replays ns20's own chain.
      cellsOnCodes: Boolean = false,
      boundsCacheKey: Option[String] = None): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val books = cacheKey match {
      case Some(key) => graft.SharedCache.getOrComputeValue(s"$key:codebooks")(
        trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey))
      case None => trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey)
    }
    // candidate cell: single nearest (the index assignment); query cells:
    // the nProbe nearest, exploded — same centroids, same tie-break order
    val (attach, cellCol, qCellsCol) =
      if (cellsOnCodes) {
        val packed = Similarity.sq8PackedCodes(candidates, idCol, vecCol, boundsCacheKey)
        val (_, cc) = cellCacheKey match {
          case key @ Some(_) =>
            KMeansIvf.fitCodesCached(packed, idCol, "__q", nCells, cellIters, key, corpusKey)
          case None => KMeansIvf.fitCodes(packed, idCol, "__q", nCells, cellIters, corpusKey)
        }
        val codeOf = org.apache.spark.sql.graft.SQ8PackRaw(col(vecCol), col("__mn"), col("__mx"))
        (Similarity.sq8WithBounds(candidates, vecCol, boundsCacheKey),
          org.apache.spark.sql.graft.NearestCellsCodes.nearest(codeOf, cc),
          explode(org.apache.spark.sql.graft.NearestCellsCodes(codeOf, cc, nProbe)))
      } else {
        val (_, cc) = KMeansIvf.fitCached(
          candidates, idCol, vecCol, nCells, cellIters, cellCacheKey, corpusKey)
        val fe = Similarity.fixedPoint(col(vecCol))
        (identity[DataFrame] _,
          org.apache.spark.sql.graft.NearestCells.nearest(fe, cc),
          explode(org.apache.spark.sql.graft.NearestCells(fe, cc, nProbe)))
      }
    val sub = dim / m
    val codeCols = (0 until m).map(j =>
      org.apache.spark.sql.graft.NearestCells.nearest(
        Similarity.fixedPoint(slice(col(vecCol), j * sub + 1, sub)), books(j))
        .as(s"__c$j"))
    val coded = attach(candidates).select(
      col(idCol).as("__pqid") +: cellCol.as("__cell") +: codeCols: _*)

    val qcand = candidates.join(broadcast(queries.select(col(idCol))), idCol)
    val cents = centroidFrame(candidates, books)
    val tabAggs = (0 until m).map(j =>
      transform(array_sort(collect_list(
          when(col("ss") === j, struct(col("cl"), col("d"))))),
        x => x.getField("d")).as(s"__dt$j"))
    val qcells = attach(qcand).select(col(idCol).as("__pqid"), qCellsCol.as("__cell"))
    val qtabs = memberRows(qcand, idCol, vecCol, dim, m)
      .join(broadcast(cents), "ss")
      .select(col("__pqid"), col("ss"), col("cl"), distExpr.as("d"))
      .groupBy(col("__pqid")).agg(tabAggs.head, tabAggs.tail: _*)
      .join(broadcast(qcells), "__pqid")

    val dist = (0 until m).map(j =>
      element_at(col(s"q.__dt$j"), col(s"c.__c$j") + 1)).reduce(_ + _)
    broadcast(qtabs).as("q")
      .join(coded.as("c"),
        col("q.__cell") === col("c.__cell") && col("q.__pqid") =!= col("c.__pqid"))
      .select(col("q.__pqid").as("q_id"), col("c.__pqid").as("cand_id"),
        dist.as("pq_dist"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("pq_dist").asc, col("cand_id"))).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Recall-targeted nProbe auto-calibration for the COMPOSED IVF-PQ
    * index — [[KMeansIvf.calibrateNProbeSq8]]'s ADC counterpart, closing
    * the last manual knob (ns68 hard-coded nProbe = 2): evaluate EVERY
    * setting in 1..maxProbe against exact integer L2 truth (the ns67
    * metric — recall isolates what the index loses, not a metric
    * mismatch) and choose the smallest whose mean recall@k reaches
    * `target` (maxProbe when none does). Output: one row per setting
    * `(n_probe, mean_recall, chosen)`, ascending. Note ADC recall is NOT
    * guaranteed monotone in nProbe (a newly probed cell's
    * ADC-closer-but-wrong candidate can displace a true hit from the
    * top-k), so "smallest setting meeting target" is the pick rule, not
    * a binary-search bound — KMeansIvfSpec pins an observed dip.
    *
    * Same one-pass shape as the SQ8 calibration: the query side explodes
    * its maxProbe-ranked cells ONCE (posexplode position = probe rank −
    * 1), each (query, candidate) pair joins through the candidate's
    * UNIQUE cell so it carries exactly one first-admitting rank, the
    * pair fans out to every setting ≥ that rank, and one ADC ranking
    * window per (setting, query) yields all maxProbe top-k lists in a
    * single pipeline — never maxProbe separate search jobs. Driver-side
    * state: maxProbe hit counters; mean recall is one double division of
    * exact integer counts, so the DuckDB oracle replays the adaptive
    * pick bit-for-bit. Codebook/cell fits ride SharedCache exactly like
    * ns66/ns68 — calibration reuses the deployed index's models. */
  def calibrateNProbePq(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nCells: Int,
      m: Int = 4, ks: Int = 16, iters: Int = 2, cellIters: Int = 2,
      maxProbe: Int, target: Double, cacheKey: Option[String] = None,
      cellCacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      truthKey: Option[String] = None,
      calKey: Option[String] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val (evaluated, chosen) = calibratePqValues(queries, candidates, idCol,
      vecCol, k, dim, nCells, m, ks, iters, cellIters, maxProbe, target,
      cacheKey, cellCacheKey, corpusKey, truthKey, calKey)
    evaluated.map { case (p, r) => (p, r, p == chosen) }
      .toDF("n_probe", "mean_recall", "chosen")
  }

  /** The driver-side calibration core behind [[calibrateNProbePq]] and
    * [[autoTunedIvfPqTopK]] — (per-setting mean recalls, chosen setting),
    * with the same sharing discipline as
    * [[KMeansIvf.calibrateNProbeSq8]]'s core: `truthKey` pins the
    * sample's exact-L2 truth in [[graft.SharedCache]] (ns67's recall
    * harness grades against the identical frame), `calKey` memoizes the
    * whole ≤ maxProbe-row evaluation so the calibration-report entry and
    * the composed calibrate→search entry evaluate ONCE per run — the
    * stored-pick production shape. */
  private def calibratePqValues(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nCells: Int,
      m: Int, ks: Int, iters: Int, cellIters: Int,
      maxProbe: Int, target: Double, cacheKey: Option[String],
      cellCacheKey: Option[String],
      corpusKey: Option[String],
      truthKey: Option[String],
      calKey: Option[String]): (Seq[(Long, Double)], Long) = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    require(maxProbe >= 1 && maxProbe <= nCells,
      s"maxProbe must be in 1..nCells, got $maxProbe (nCells=$nCells)")
    val spark = queries.sparkSession
    calKey match {
      case Some(ck) => graft.SharedCache.getOrComputeValue(s"$ck:eval")(
        evaluatePq(queries, candidates, idCol, vecCol, k, dim, nCells, m, ks,
          iters, cellIters, maxProbe, target, cacheKey, cellCacheKey,
          corpusKey, truthKey))
      case None => evaluatePq(queries, candidates, idCol, vecCol, k, dim,
        nCells, m, ks, iters, cellIters, maxProbe, target, cacheKey,
        cellCacheKey, corpusKey, truthKey)
    }
  }

  private def evaluatePq(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nCells: Int,
      m: Int, ks: Int, iters: Int, cellIters: Int,
      maxProbe: Int, target: Double, cacheKey: Option[String],
      cellCacheKey: Option[String],
      corpusKey: Option[String],
      truthKey: Option[String]): (Seq[(Long, Double)], Long) = {
    val spark = queries.sparkSession
    // exact integer L2 truth over (query sample × corpus) — the bounded
    // calibration-harness pass every recall evaluation pays; with
    // truthKey it is pinned and shared with ns67's recall harness
    val (truth, pinned) = truthKey match {
      case Some(tk) => (graft.SharedCache.getOrCompute(tk, spark)(
        Similarity.l2Truth(queries, candidates, idCol, vecCol, k)), true)
      case None => (Similarity.l2Truth(queries, candidates, idCol, vecCol, k)
        .localCheckpoint(), false) // truth is read by hit count AND nq below
    }
    try {
      val books = cacheKey match {
        case Some(key) => graft.SharedCache.getOrComputeValue(s"$key:codebooks")(
          trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey))
        case None => trainBooks(candidates, idCol, vecCol, dim, m, ks, iters, corpusKey)
      }
      val (_, cc) = KMeansIvf.fitCached(
        candidates, idCol, vecCol, nCells, cellIters, cellCacheKey, corpusKey)
      val fe = Similarity.fixedPoint(col(vecCol))
      val sub = dim / m
      val codeCols = (0 until m).map(j =>
        org.apache.spark.sql.graft.NearestCells.nearest(
          Similarity.fixedPoint(slice(col(vecCol), j * sub + 1, sub)), books(j))
          .as(s"__c$j"))
      val coded = candidates.select(
        col(idCol).as("__pqid") +:
          org.apache.spark.sql.graft.NearestCells.nearest(fe, cc).as("__cell") +:
          codeCols: _*)
      val qcand = candidates.join(broadcast(queries.select(col(idCol))), idCol)
      val cents = centroidFrame(candidates, books)
      val tabAggs = (0 until m).map(j =>
        transform(array_sort(collect_list(
            when(col("ss") === j, struct(col("cl"), col("d"))))),
          x => x.getField("d")).as(s"__dt$j"))
      // maxProbe-ranked query cells; posexplode position = probe rank − 1
      // (the same (distance, cell) ascending order the assignment uses)
      val qcells = qcand.select(col(idCol).as("__pqid"),
          posexplode(org.apache.spark.sql.graft.NearestCells(fe, cc, maxProbe)))
        .withColumnRenamed("pos", "__prank0")
        .withColumnRenamed("col", "__cell")
      val qtabs = memberRows(qcand, idCol, vecCol, dim, m)
        .join(broadcast(cents), "ss")
        .select(col("__pqid"), col("ss"), col("cl"), distExpr.as("d"))
        .groupBy(col("__pqid")).agg(tabAggs.head, tabAggs.tail: _*)
        .join(broadcast(qcells), "__pqid")
      val dist = (0 until m).map(j =>
        element_at(col(s"q.__dt$j"), col(s"c.__c$j") + 1)).reduce(_ + _)
      val perP = broadcast(qtabs).as("q")
        .join(coded.as("c"),
          col("q.__cell") === col("c.__cell") && col("q.__pqid") =!= col("c.__pqid"))
        .select(col("q.__pqid").as("q_id"), col("c.__pqid").as("cand_id"),
          dist.as("pq_dist"), (col("q.__prank0") + 1).as("__minp"))
        .withColumn("p", explode(sequence(col("__minp"), lit(maxProbe))))
      val w = Window.partitionBy(col("p"), col("q_id"))
        .orderBy(col("pq_dist").asc, col("cand_id"))
      val topk = perP.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= k)
        .select(col("p"), col("q_id"), col("cand_id"))
      val (hitRows, nq) = KMeansIvf.collectHitsAndNq(truth, topk)
      require(nq > 0, "calibrateNProbePq: the query sample produced no " +
        "exact-L2 truth rows (empty sample, or every query id is absent " +
        "from the corpus) — a recall target over zero queries is undefined")
      val evaluated = (1 to maxProbe).map { p =>
        (p.toLong, hitRows.getOrElse(p.toLong, 0L).toDouble / (k * nq))
      }
      val chosen = evaluated.find(_._2 >= target).map(_._1)
        .getOrElse(maxProbe.toLong)
      (evaluated, chosen)
    // driver-side counts carry no lineage on `truth`; a PRIVATE checkpoint
    // is dropped here, a pinned one is owned (and shared) by SharedCache
    } finally if (!pinned) truth.unpersist(blocking = false)
  }

  /** Composed calibrate→search for the IVF-PQ index: run the
    * recall-targeted calibration ([[calibrateNProbePq]]) over the query
    * sample and immediately search ([[ivfPqTopK]]) with the CHOSEN
    * setting — [[KMeansIvf.autoTunedSearchSq8]]'s ADC counterpart,
    * making the ns75 pick load-bearing where ns68 takes the knob as a
    * manual literal. Returns the search frame with the chosen setting
    * appended as a constant `n_probe` column. Codebooks, cell fit, and
    * code table all ride the SAME SharedCache keys as the calibration,
    * so the composition trains once; reading the chosen setting from
    * the driver-built calibration frame (≤ maxProbe rows) adds no job. */
  def autoTunedIvfPqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int, nCells: Int,
      m: Int = 4, ks: Int = 16, iters: Int = 2, cellIters: Int = 2,
      maxProbe: Int, target: Double, cacheKey: Option[String] = None,
      cellCacheKey: Option[String] = None,
      corpusKey: Option[String] = None,
      truthKey: Option[String] = None,
      calKey: Option[String] = None): DataFrame = {
    // chosen setting straight off the driver-side calibration values
    // (memoized under calKey — the stored pick the search consumes)
    val (_, chosen) = calibratePqValues(queries, candidates, idCol, vecCol,
      k, dim, nCells, m, ks, iters, cellIters, maxProbe, target,
      cacheKey, cellCacheKey, corpusKey, truthKey, calKey)
    ivfPqTopK(queries, candidates, idCol, vecCol, k, dim, nCells, m, ks,
        iters, cellIters, cacheKey, cellCacheKey, corpusKey,
        nProbe = chosen.toInt)
      .withColumn("n_probe", lit(chosen))
  }
}
