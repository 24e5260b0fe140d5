package graft.queries

import graft.operators.Dedup
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Deduplication suite over the documents corpus: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard (SURVEY.md §7.2 M6 — LLM-pipeline operators).
  * Hash family is md5-based on both engines so every signature and pair is
  * hash-comparable with the DuckDB oracle.
  */
object DedupQueries extends QueryModule {

  private val NumHashes = 8
  private val Bands = 4

  /** DuckDB word-set expression shared by the oracle CTEs. */
  private val WsSql = "list_distinct(string_split(lower(text), ' '))"

  private def sigExprSql(i: Int): String =
    s"list_aggregate(list_transform(w, x -> md5(x || ':$i')), 'min')"

  private val ns01 = QueryEntry(
    "ns01_dedup_exact",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.exact(t.documents, "doc_id", "text").orderBy(col("h"))
    },
    Some(
      """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n
        |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin),
  )

  private val ns02 = QueryEntry(
    "ns02_minhash_sig",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val sig = t.documents.select(col("doc_id"),
        Dedup.minhashSig(Dedup.tokenSet(col("text")), NumHashes).as("sig"))
      sig.select(col("doc_id") +:
        (0 until NumHashes).map(i => element_at(col("sig"), i + 1).as(s"mh$i")): _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val cols = (0 until NumHashes).map(i => s"  ${sigExprSql(i)} AS mh$i").mkString(",\n")
      s"""SELECT doc_id,
         |$cols
         |FROM (SELECT doc_id, $WsSql AS w FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
  )

  private val ns03 = QueryEntry(
    "ns03_minhash_lsh_pairs",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.minhashLshPairs(t.documents, "doc_id", "text", NumHashes, Bands)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val rows = NumHashes / Bands
      val sigCols = (0 until NumHashes).map(i => s"${sigExprSql(i)} AS s$i").mkString(", ")
      val bandSelects = (0 until Bands).map { j =>
        val parts = (0 until rows).map(r => s"s${j * rows + r}").mkString(" || '|' || ")
        s"SELECT doc_id, $j AS band, md5($parts) AS bh FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH ws AS (SELECT doc_id, $WsSql AS w FROM documents),
         |sig AS (SELECT doc_id, $sigCols FROM ws),
         |bands AS (
         |  $bandSelects)
         |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
         |ORDER BY id_a, id_b""".stripMargin
    },
    headline = true,
  )

  /** Bit j = majority of md5-bit j (big-endian) — the SimHashBits family:
    * nibble j/4, bit 3-j%4 within it. Same terms as ns24's 48-bit oracle. */
  private def simhashSql: String =
    (0 until 16).map { j =>
      val nib = j / 4 + 1
      val shift = 3 - j % 4
      s"(CASE WHEN 2 * len(list_filter(w, x -> (((strpos('0123456789abcdef', substr(md5(x), $nib, 1)) - 1) >> $shift) & 1) = 1)) > len(w) THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private val ns04 = QueryEntry(
    "ns04_simhash",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"), Dedup.simhash16(Dedup.tokenSet(col("text"))).as("simhash"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""SELECT doc_id, CAST($simhashSql AS BIGINT) AS simhash
         |FROM (SELECT doc_id, $WsSql AS w FROM documents)
         |ORDER BY doc_id""".stripMargin),
  )

  private val ns05 = QueryEntry(
    "ns05_simhash_pairs",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.simhashPairs(t.documents, "doc_id", "text", Seq("lang"), maxDist = 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      s"""WITH sh AS (
         |  SELECT doc_id, lang, CAST($simhashSql AS BIGINT) AS s
         |  FROM (SELECT doc_id, lang, $WsSql AS w FROM documents))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 3
         |ORDER BY id_a, id_b""".stripMargin),
  )

  private val ns06 = QueryEntry(
    "ns06_jaccard_pairs",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.jaccardPairs(t.documents, "doc_id", "text",
          bucket = Seq("lang", "source"), ngram = 1, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      s"""WITH s AS (SELECT doc_id, lang, source, $WsSql AS w FROM documents)
         |SELECT id_a, id_b, jac FROM (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(len(list_intersect(a.w, b.w)) AS DOUBLE) /
         |      CAST(len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)) AS DOUBLE) AS jac
         |  FROM s a JOIN s b
         |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
         |WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin),
    headline = true,
  )

  /** Wide (48-bit) SimHash via the native one-pass expression; the oracle
    * states the same bit family with 48 per-bit majority terms (width kept
    * ≤ 62 because 1<<63 overflows BIGINT in SQL arithmetic). */
  private val ns24 = QueryEntry(
    "ns24_simhash_wide",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"),
          org.apache.spark.sql.graft.SimHashBits(
            Dedup.tokenSet(col("text")), 48).as("simhash48"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""SELECT doc_id, CAST($simhash48Sql AS BIGINT) AS simhash48
         |FROM (SELECT doc_id, $WsSql AS w FROM documents)
         |ORDER BY doc_id""".stripMargin),
  )

  /** The 48-bit simhash as SQL terms (shared by ns24 and ns53). */
  private lazy val simhash48Sql: String = (0 until 48).map { j =>
    val nib = j / 4 + 1
    val shift = 3 - j % 4
    s"""(CASE WHEN 2 * len(list_filter(w, x -> (((strpos('0123456789abcdef', substr(md5(x), $nib, 1)) - 1) >> $shift) & 1) = 1)) > len(w) THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END)"""
  }.mkString(" + ")

  /** Wide-simhash near-dup pairs through the LOSSLESS pigeonhole banding
    * ([[Dedup.simhashPairsBanded]]): the oracle states the equivalent
    * brute-force form — banding must find exactly the all-pairs answer on
    * the same signature, which is the operator's correctness claim. */
  private val ns53 = QueryEntry(
    "ns53_simhash_banded",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.simhashPairsBanded(t.documents, "doc_id", "text", Seq("lang"),
          maxDist = 3, bits = 48)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      s"""WITH sh AS (
         |  SELECT doc_id, lang, CAST($simhash48Sql AS BIGINT) AS s
         |  FROM (SELECT doc_id, lang, $WsSql AS w FROM documents))
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming
         |FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.s, b.s)) <= 3
         |ORDER BY id_a, id_b""".stripMargin),
  )

  /** Near-dup clusters = connected components over a STRICT LSH pair graph
    * (2 bands × 4 rows — higher-precision candidates than ns03's 4×2).
    * The Spark side propagates min-labels over the doc↔bucket bipartite
    * graph (pairs never materialized); the oracle states the SAME
    * propagation, statically unrolled to 12 rounds — the test graphs
    * converge in 6 (sf0.01) / 7 (sf0.1) rounds, so 12 is the fixpoint with
    * wide margin. (A recursive-CTE reachability closure states the fixpoint
    * without a round bound, but its working set is Σ component² rows —
    * minutes of DuckDB time at sf0.1 — while unrolled propagation is linear
    * in membership rows per round; both were verified equal at sf0.01.) */
  /** Shared oracle CTE chain for the component fixpoint: strict-LSH bands
    * then 12 unrolled min-label propagation rounds (lab12 = fixpoint).
    * AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    * level references its predecessor twice → 2^12 expression copies
    * ("too many open files") without it. */
  /** Oracle unroll depth: test band graphs converge in 6 (sf0.01) / 7
    * (sf0.1) rounds; kept with margin and SELF-CHECKED by the labconv
    * CTE, so deepening it is this one edit. */
  private val BandPropagationDepth = 12

  private def componentsOracleCtes: String = {
    val d = BandPropagationDepth
    val rows = NumHashes / 2
    val sigCols = (0 until NumHashes).map(i => s"${sigExprSql(i)} AS s$i").mkString(", ")
    val bandSelects = (0 until 2).map { j =>
      val parts = (0 until rows).map(r => s"s${j * rows + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $j AS band, md5($parts) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val levels = (1 to d).map { k =>
      s"""lab$k AS MATERIALIZED (
         |  SELECT l.id, least(l.lbl, coalesce(nm.nm, l.lbl)) AS lbl
         |  FROM lab${k - 1} l LEFT JOIN (
         |    SELECT m.doc_id AS id, min(bm.bm) AS nm
         |    FROM bands m JOIN (
         |      SELECT m2.band, m2.bh, min(l2.lbl) AS bm
         |      FROM bands m2 JOIN lab${k - 1} l2 ON m2.doc_id = l2.id
         |      GROUP BY m2.band, m2.bh) bm
         |    ON m.band = bm.band AND m.bh = bm.bh
         |    GROUP BY m.doc_id) nm
         |  ON l.id = nm.id)""".stripMargin
    }.mkString(",\n")
    // self-checking depth (the ns65 discipline, r15): labfinal compares
    // the last two rounds and raises via DuckDB error() — type-unified
    // into the label column, schema unchanged — so a regenerated testdata
    // whose band graph needs more than 12 rounds fails the oracle RUN
    // loudly instead of silently grading against under-converged labels
    s"""WITH ws AS (SELECT doc_id, $WsSql AS w FROM documents),
       |sig AS (SELECT doc_id, $sigCols FROM ws),
       |bands AS MATERIALIZED (
       |  $bandSelects),
       |lab0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents),
       |$levels,
       |labconv AS (SELECT count(*) AS n FROM (
       |  SELECT id, lbl FROM lab$d EXCEPT SELECT id, lbl FROM lab${d - 1})),
       |labfinal AS (
       |  SELECT id, CASE WHEN (SELECT n FROM labconv) > 0
       |    THEN error('band-propagation oracle under-converged at depth $d; deepen BandPropagationDepth')
       |    ELSE lbl END AS lbl
       |  FROM lab$d)""".stripMargin
  }

  /** The component fixpoint feeding BOTH ns26 and ns41, computed once per
    * run through [[graft.SharedCache]] — the session analog of persisting
    * the component table once and deriving every downstream verdict from
    * it, instead of re-running the propagation loop per consumer. */
  /** The bands=2 signature frame ns26's bucket route and ns64's pair
    * route both start from — one SharedCache pin per (corpus, hashes,
    * bands), like every other fitted artifact. */
  private def bandKey(dir: String) = s"bandhash:$dir:$NumHashes:2"

  private def componentsFor(spark: org.apache.spark.sql.SparkSession, dir: String) =
    graft.SharedCache.getOrCompute(s"lsh_components:$NumHashes:2:$dir", spark) {
      Dedup.minhashLshComponents(Tables(spark, dir).documents, "doc_id", "text",
        NumHashes, bands = 2, cacheKey = Some(bandKey(dir)))
    }

  private val ns26 = QueryEntry(
    "ns26_dedup_components",
    (spark, dir) => componentsFor(spark, dir).orderBy(col("doc_id")),
    Some(
      s"""$componentsOracleCtes
         |SELECT id AS doc_id, lbl AS component
         |FROM labfinal ORDER BY doc_id""".stripMargin),
    headline = true,
  )

  /** The SAME component contract through the OTHER clustering algorithm:
    * [[Dedup.twoPhaseComponents]] (Kiveris large/small-star contraction)
    * over the identical band graph's pair stream — fed through
    * [[Dedup.minhashLshBandStars]], the per-bucket star contraction whose
    * components provably equal the full clique pair set's (its scaladoc
    * carries the proof), so the edge feed is bounded by membership rows
    * (|docs| × bands) instead of the clique-quadratic pair multiset
    * (4.8 M pairs → ~10 k stars at sf0.1 — the r13 `weak` grade was the
    * init chewing that multiset). Two docs are LSH-pair-connected iff
    * they share a band bucket, so the contraction must reach exactly the
    * min-label fixpoint ns26's bucket-bipartite loop reaches — one oracle
    * grades both algorithms, keeping this entry a cross-algorithm
    * equivalence proof as well as the scale-path alternative's hash gate. */
  private val ns64 = QueryEntry(
    "ns64_components_twophase",
    (spark, dir) => {
      val docs = Tables(spark, dir).documents
      val pairs = Dedup.minhashLshBandStars(docs, "doc_id", "text", NumHashes,
        bands = 2, cacheKey = Some(bandKey(dir)))
      Dedup.twoPhaseComponents(docs.select(col("doc_id")), "doc_id", pairs,
          contractedPairs = true)
        .orderBy(col("doc_id"))
    },
    Some(
      s"""$componentsOracleCtes
         |SELECT id AS doc_id, lbl AS component
         |FROM labfinal ORDER BY doc_id""".stripMargin),
  )

  /** The verdict table a dedup pipeline actually ships: per document its
    * cluster, whether it is the cluster keeper, and its rank within the
    * cluster (1 = keeper; drop everything with dup_rank > 1). */
  private val ns41 = QueryEntry(
    "ns41_dedup_verdict",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      componentsFor(spark, dir)
        .withColumn("is_keeper", col("doc_id") === col("component"))
        .withColumn("dup_rank", row_number().over(
          Window.partitionBy(col("component")).orderBy(col("doc_id"))).cast("long"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""$componentsOracleCtes
         |SELECT id AS doc_id, lbl AS component, id = lbl AS is_keeper,
         |  CAST(row_number() OVER (PARTITION BY lbl ORDER BY id) AS BIGINT) AS dup_rank
         |FROM labfinal ORDER BY doc_id""".stripMargin),
  )

  /** Canonical-representative selection: per near-dup cluster keep the
    * highest-quality member (longest doc, ties to the lowest id) — the
    * content-aware upgrade of ns41's keep-lowest-id rule, and the third
    * consumer of the SharedCache'd component fixpoint. One broadcast-sized
    * join (components are (id, label) pairs) plus a per-cluster window —
    * cluster sizes are bounded by the near-dup group size, so the window
    * partitions stay small at any corpus scale. */
  private val ns43 = QueryEntry(
    "ns43_dedup_canonical",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(spark, dir)
      val wc = t.documents.select(col("doc_id"),
        graft.operators.TextAnalysis.wsTokenCount(col("text")).as("n_words"))
      componentsFor(spark, dir).join(wc, "doc_id")
        .withColumn("is_canonical", row_number().over(
          Window.partitionBy(col("component"))
            .orderBy(col("n_words").desc, col("doc_id"))) === 1)
        .orderBy(col("doc_id"))
    },
    Some(
      s"""$componentsOracleCtes
         |SELECT l.id AS doc_id, l.lbl AS component,
         |  CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) AS n_words,
         |  row_number() OVER (PARTITION BY l.lbl
         |    ORDER BY CAST(len(string_split(lower(d.text), ' ')) AS BIGINT) DESC, l.id) = 1
         |    AS is_canonical
         |FROM labfinal l JOIN documents d ON l.id = d.doc_id
         |ORDER BY doc_id""".stripMargin),
  )

  /** Incremental-ingest dedup: new documents (one source partition) flagged
    * against the signature set of the EXISTING corpus — the batch shape of
    * what [[graft.streaming.DedupStream]] does per micro-batch. The
    * history side reduces to DISTINCT 16-bit signatures (≤ 65536 rows at
    * ANY corpus size — unconditionally broadcastable), so new-batch
    * flagging is a broadcast probe with no shuffle of either corpus. */
  private val ns45 = QueryEntry(
    "ns45_incremental_dedup",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val sh = t.documents.select(col("doc_id"), col("source"),
        Dedup.simhash16(Dedup.tokenSet(col("text"))).as("simhash"))
      val history = sh.filter(col("source") =!= "src19")
        .select(col("simhash")).distinct()
      sh.filter(col("source") === "src19")
        .join(broadcast(history.withColumn("__hit", lit(true))), Seq("simhash"), "left")
        .select(col("doc_id"), col("simhash"),
          coalesce(col("__hit"), lit(false)).as("is_dup"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""WITH sh AS (
         |  SELECT doc_id, source, CAST($simhashSql AS BIGINT) AS simhash
         |  FROM (SELECT doc_id, source, $WsSql AS w FROM documents)),
         |hist AS (SELECT DISTINCT simhash FROM sh WHERE source <> 'src19')
         |SELECT n.doc_id, n.simhash, h.simhash IS NOT NULL AS is_dup
         |FROM sh n LEFT JOIN hist h ON n.simhash = h.simhash
         |WHERE n.source = 'src19' ORDER BY doc_id""".stripMargin),
  )

  /** Normalization-exact dedup: the C4/Dolma "lenient exact" first pass —
    * md5 over lowercased, punctuation-stripped, whitespace-collapsed text,
    * with an audit count of how many RAW byte-variants each normal form
    * collapsed. Same one-digest-shuffle plan as ns01. */
  private val ns54 = QueryEntry(
    "ns54_norm_dedup",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Dedup.normalizedExact(t.documents, "doc_id", "text").orderBy(col("h"))
    },
    Some(
      """SELECT
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS h,
        |  min(doc_id) AS keeper, count(*) AS n,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_raw_variants
        |FROM documents GROUP BY 1 ORDER BY h""".stripMargin),
  )

  /** Cluster-size histogram: how many near-dup clusters exist at each
    * size — the dedup-QA view (a fat head of large clusters means
    * boilerplate or a broken blocking key; mass at size 1 means the
    * corpus is mostly unique). Fourth consumer of the SharedCache'd
    * component fixpoint; two bounded aggregates on top (component keys,
    * then ≤ |distinct sizes| keys). */
  private val ns60 = QueryEntry(
    "ns60_cluster_size_hist",
    (spark, dir) => {
      componentsFor(spark, dir)
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .orderBy(col("sz"))
    },
    Some(
      s"""$componentsOracleCtes
         |SELECT sz, count(*) AS n_clusters FROM (
         |  SELECT lbl, count(*) AS sz FROM labfinal GROUP BY lbl)
         |GROUP BY sz ORDER BY sz""".stripMargin),
  )

  /** Leakage-safe train/eval split: the unit of assignment is the NEAR-DUP
    * COMPONENT, never the document — a doc-level hash split leaks ~every
    * duplicated document across the boundary (its twin lands on the other
    * side with p=2·r·(1−r)), which is exactly the contamination an eval
    * set must not have. Split = first md5 hex digit of the component label
    * under 'c' (a deterministic 12/16 = 75 % train draw, the ns22/ns31
    * scrub-sample rule applied to cluster keepers), so by construction no
    * component — hence no near-dup pair — spans the boundary. Fourth
    * consumer of the SharedCache'd component fixpoint; the split itself is
    * a scan expression over the (id, label) pairs. */
  private val ns73 = QueryEntry(
    "ns73_leakage_safe_split",
    (spark, dir) => {
      componentsFor(spark, dir)
        .withColumn("split",
          when(substring(md5(col("component").cast("string")), 1, 1) < "c", "train")
            .otherwise("eval"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""$componentsOracleCtes
         |SELECT id AS doc_id, lbl AS component,
         |  CASE WHEN substr(md5(CAST(lbl AS VARCHAR)), 1, 1) < 'c'
         |       THEN 'train' ELSE 'eval' END AS split
         |FROM labfinal ORDER BY doc_id""".stripMargin),
    headline = true,
  )

  override def entries: Seq[QueryEntry] =
    Seq(ns01, ns02, ns03, ns04, ns05, ns06, ns24, ns26, ns41, ns43, ns45,
      ns53, ns54, ns60, ns64, ns73)
}
