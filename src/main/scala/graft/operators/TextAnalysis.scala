package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface: marker-based
  * language ID, quality scoring, token counting, and content fingerprinting.
  * Pure Column expressions — codegen-friendly, no UDFs, no shuffles.
  */
object TextAnalysis {

  /** Marker vocabularies per language class. Deterministic toy model (the
    * real thing swaps in per-language frequency tables); scoring = count of
    * marker occurrences in the word sequence (duplicates count). */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast"),
    "sql" -> Seq("join", "merge", "sort"),
    "ml" -> Seq("spark", "vector", "hash"),
  )

  def words(text: Column): Column = split(lower(text), " ")

  def markerScore(ws: Column, vocab: Seq[String]): Column =
    size(filter(ws, w => vocab.map(v => w === v).reduce(_ || _))).cast("long")

  /** Argmax over marker scores, ties broken by declaration order. */
  def langId(text: Column): Column = {
    val ws = words(text)
    val scores = markers.map { case (lang, vocab) => lang -> markerScore(ws, vocab) }
    // first language whose score >= all later scores
    def pick(rest: List[(String, Column)]): Column = rest match {
      case (lang, s) :: tail if tail.nonEmpty =>
        when(tail.map(_._2).foldLeft(lit(true))((c, t) => c && s >= t), lang)
          .otherwise(pick(tail))
      case (lang, _) :: Nil => lit(lang)
      case Nil => lit(null)
    }
    pick(scores.toList)
  }

  /** Quality metrics: word count, stopword ratio, length score, and a
    * weighted quality score. One double expression tree, identical on the
    * oracle side. */
  def nWords(text: Column): Column = size(words(text)).cast("long")

  def stopwordCount(text: Column): Column =
    markerScore(words(text), Seq("the", "a"))

  def qualityScore(text: Column): Column = {
    val nw = nWords(text).cast("double")
    val lenScore = least(nw, lit(200d)) / lit(200d)
    // nullif guard: split() never returns an empty array today, but the
    // operator is documented general-purpose and ANSI division must not raise
    val stopRatio = stopwordCount(text).cast("double") / nullif(nw, lit(0d))
    lit(0.6) * lenScore + lit(0.4) * stopRatio
  }

  /** Whitespace tokens + BPE-ish sub-tokens (runs of letters, digits, or a
    * single other non-space char). */
  def wsTokenCount(text: Column): Column = nWords(text)

  def bpeTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")

  /** Content fingerprint: md5 of the sorted distinct word set — robust to
    * word order and duplication (the rolling-hash analog for word salads). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(Dedup.tokenSet(text))))

  /** Training-data scrubbing: mask number runs, collapse whitespace runs,
    * trim. Patterns are dialect-neutral (identical under Java regex and
    * RE2) so the oracle states the same chain. */
  def scrub(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[0-9]+", "<num>"),
      " +", " "))

  /** Deterministic content-hash sampling: keep a row iff the first hex
    * digits of md5(key) fall under the rate. Reproducible across engines,
    * runs, and partitionings — the sampling a curation pipeline can rerun.
    * rate16 is in 16ths (e.g. 4 → keep ~25%). */
  def hashSample(key: Column, rate16: Int): Column = {
    // the comparison is a SINGLE hex digit against a string literal:
    // toHexString(16) is "10", and the lexicographic compare would then
    // keep ~2/16 of rows where the caller asked for ALL of them — bound
    // the domain and special-case the keep-everything rate
    require(rate16 >= 0 && rate16 <= 16,
      s"rate16 is in 16ths of the keyspace (0..16), got $rate16")
    if (rate16 == 16) lit(true)
    else substring(md5(key), 1, 1) < lit(java.lang.Integer.toHexString(rate16))
  }

  /** Word n-grams over an ALREADY-MATERIALIZED words-array column,
    * preserving order and duplicates (repetition signals need the multiset;
    * [[Dedup.shingles]] deduplicates for set similarity).
    *
    * `ws` must be a materialized column (projected attribute), never an
    * inline `split(...)` expression: higher-order `transform` lambdas run
    * interpreted with NO common-subexpression elimination, so an inline
    * split would re-tokenize the full text once per element_at — O(words²)
    * per document (measured 10× on the repetition query).
    *
    * A document shorter than `n` words yields an EMPTY gram array — the
    * guard is load-bearing under Spark 4's default ANSI mode, where the
    * unguarded sequence floor of 0 would element_at past the array end
    * (INVALID_ARRAY_INDEX) instead of returning null-padded junk. */
  def ngramsOf(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(o => element_at(ws, i + o + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Within-document repetition metrics (the Gopher/RefinedWeb-style
    * quality signals): duplicate-word ratio, most-frequent-word fraction,
    * duplicate-bigram ratio. All ratios are one exact integer subtraction
    * and one IEEE division — bit-identical on the oracle.
    *
    * SCAN-ONLY: every signal is document-local, and
    * [[org.apache.spark.sql.graft.TermCounts]] computes per-doc term
    * multiplicity inside the row (the ns27/ns52 tf observation), so the
    * whole operator is one projection — no explode, no (doc, term)
    * shuffle, no join. The previous explode + two-aggregation form moved
    * a corpus-sized distinct-(doc, term) stream through two exchanges to
    * re-co-locate rows that were ALREADY co-located; at 100 TB that
    * exchange was the operator's entire cost. Distinct-count/top-count
    * read straight off the TermCounts array (size / array_max over the tf
    * field); bigram totals are size arithmetic (a d-word doc has d−1
    * bigrams). Per-row memory is one count entry per DISTINCT term — the
    * same order as the row's own token array, so a 100 MB crawl page
    * costs what its tokens already cost.
    *
    * Degenerate-width note: a sub-2-word document now keeps its row (NULL
    * dup_bigram_ratio — the nullif guard below; under ANSI mode an
    * unguarded 0/0 division RAISES, it does not produce NaN) where the
    * old form's inner join dropped it; the corpus floor is 10 words so
    * the oracle never sees the difference. NULL text is FILTERED up
    * front, preserving the old explode+join form's row set: words(NULL)
    * is a NULL array, and a row of all-NULL word stats is useless to
    * every downstream consumer (and would diverge from the oracle's
    * unnest-based shape, which drops such docs). */
  def repetitionMetrics(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.TermCounts
    // __ws must be a projected attribute before ngramsOf consumes it (the
    // no-inline-split rule on [[ngramsOf]]); the second projection keeps
    // both TermCounts invocations on that one materialized array
    val counted = df
      .where(col(textCol).isNotNull)
      .select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        TermCounts(col("__ws")).as("__tc"),
        TermCounts(ngramsOf(col("__ws"), 2)).as("__bc"))
    val stats = counted.select(col(idCol), col("n_words"),
      size(col("__tc")).cast("long").as("n_distinct_words"),
      array_max(col("__tc").getField("tf")).as("__top"),
      // split() never yields an empty array, so n_words ≥ 1 and d−1 is
      // exact for every width (0 bigrams at d = 1, matching ngramsOf)
      (col("n_words") - 1L).as("__nb"),
      size(col("__bc")).cast("long").as("__ndb"))
    stats.select(col(idCol), col("n_words"), col("n_distinct_words"),
      ((col("n_words") - col("n_distinct_words")).cast("double") /
        col("n_words").cast("double")).as("dup_word_ratio"),
      (col("__top").cast("double") / col("n_words").cast("double")).as("top_word_frac"),
      ((col("__nb") - col("__ndb")).cast("double") /
        nullif(col("__nb").cast("double"), lit(0d))).as("dup_bigram_ratio"))
  }

  /** The distinct probe-gram side shared by the contamination family. */
  private def probeGramsOf(probes: org.apache.spark.sql.DataFrame,
      probeTextCol: String, n: Int): org.apache.spark.sql.DataFrame = probes
    .select(words(col(probeTextCol)).as("__pw"))
    .select(explode(ngramsOf(col("__pw"), n)).as("pg")).distinct()

  /** TINY probe sets fold into the scan: below
    * `spark.graft.probes.rowLocalThreshold` distinct grams (default 1024)
    * the whole set collapses to ONE sorted array LITERAL in the plan, and
    * each document intersects against it row-locally
    * ([[org.apache.spark.sql.graft.IntersectSizeSorted]]'s merge walk) —
    * zero shuffles, zero joins, no per-doc aggregation, and none of the
    * broadcast/one-row-aggregate jobs a frame-valued probe side costs
    * (six sub-100 ms jobs of pure scheduler floor at sf0.1). The walk is
    * O(|doc| + |probes|) per row, so the gate is deliberately LOW: a
    * full benchmark-suite probe set (10⁵⁺ grams) would dominate every
    * row's walk, and there the explode + broadcast hash semi-join —
    * O(|doc|) hash probes per row — stays the scale shape. The count
    * gate runs BEFORE anything is collected, so the driver never holds
    * more than `limit` grams — the [[JoinHints.maybeBroadcast]]
    * eager-gate discipline (two control-plane jobs at plan-build time
    * over the small, usually literal probe frame). The array is sorted
    * ENGINE-side (array_sort), never by JVM String order — UTF-16
    * code-unit comparisons disagree with UTF8String binary order beyond
    * ASCII, and the merge walk requires the latter. */
  private def probeArrayIfTiny(probeGrams: org.apache.spark.sql.DataFrame,
      cacheKey: Option[String] = None): Option[Seq[String]] = {
    def compute: Option[Seq[String]] = {
      val limit = probeGrams.sparkSession.conf
        .get("spark.graft.probes.rowLocalThreshold", "1024").toLong
      if (probeGrams.count() > limit) None
      else Some(probeGrams.agg(array_sort(collect_set(col("pg"))).as("__pgs"))
        .head().getSeq[String](0))
    }
    // the same benchmark suite screens AND scores in one run — share the
    // two control-plane jobs across consumers like any fitted model
    // (KMeansIvf.fitCached's discipline); key must identify probes + n
    cacheKey match {
      case None => compute
      case Some(k) => graft.SharedCache.getOrComputeValue(k)(compute)
    }
  }


  /** Benchmark-contamination screen: which documents contain any probe
    * n-gram, and how many distinct ones. Probe and document texts are
    * decomposed into the same word n-grams; a tiny probe set folds into
    * the scan ([[probeArrayIfTiny]] — one sorted-array broadcast, one
    * merge walk per row, no shuffle at all), a large one is equi-joined
    * on the gram itself — the probe side is benchmark rows, so that join
    * is a broadcast hash semi-join against every document shard; no
    * substring scans, no cross product. (An earlier shape joined on
    * md5(gram); the digest bought nothing — same predicate, same-sized
    * broadcast build — and cost a per-corpus-gram md5+hex, ~1.1 B
    * digests at 20 M docs.) Grams are deduped PER ROW at the scan (a
    * (doc, gram) pair cannot recur across rows — the spanSets
    * observation), which turns the per-doc count_distinct into a plain
    * count on the join path and a plain intersect size on the row-local
    * one. */
  def contaminationScreen(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, probes: org.apache.spark.sql.DataFrame, probeTextCol: String,
      n: Int, probeCacheKey: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val probeGrams = probeGramsOf(probes, probeTextCol, n)
    // the contains prefilter is O(K·|text|) per row, so the row-local
    // screen gates TIGHTER than the merge walk (which only pays O(K) once
    // past the filter): above this the broadcast join path wins
    val containsLimit = docs.sparkSession.conf
      .get("spark.graft.probes.containsThreshold", "64").toInt
    probeArrayIfTiny(probeGrams, probeCacheKey) match {
      case Some(pgs) if pgs.size <= containsLimit =>
        // "n_hits ≥ 1" restated as a SUBSTRING predicate the scan can run:
        // a word n-gram of text is exactly a space-bounded substring of
        // the space-padded lowered text, so contains-any(padded grams) ⟺
        // at least one probe gram matches. Stating the filter this way
        // (instead of `n_hits > 0` over the projected count) matters
        // twice: predicate pushdown moves it INTO the scan where it
        // eliminates the non-contaminated bulk before the gram pipeline
        // ever runs, and the pushed form costs K contains() per row —
        // whereas pushing `n_hits > 0` inlines the whole n-gram lambda
        // with the split re-run per element (no CSE in interpreted
        // lambdas), the O(words²) trap measured 13× at sf0.1. No
        // post-filter needed: survivors have n_hits ≥ 1 by construction.
        val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
        val containsAny = pgs.map(g => padded.contains(lit(" " + g + " ")))
          .foldLeft(lit(false))(_ || _)
        docs.filter(containsAny)
          .select(col(idCol), words(col(textCol)).as("__ws"))
          .select(col(idCol),
            array_sort(array_distinct(ngramsOf(col("__ws"), n))).as("__g"))
          .select(col(idCol),
            org.apache.spark.sql.graft.IntersectSizeSorted(col("__g"), typedlit(pgs))
              .as("n_hits"))
      case _ =>
        docs.select(col(idCol), words(col(textCol)).as("__ws"))
          .select(col(idCol), explode(array_distinct(ngramsOf(col("__ws"), n))).as("g"))
          .join(broadcast(probeGrams), col("g") === col("pg"))
          .groupBy(col(idCol))
          .agg(count(lit(1)).as("n_hits"))
    }
  }

  /** Per-document benchmark-containment ratio — the decontamination metric
    * (|doc shingles ∩ benchmark shingles| / |doc shingles|, distinct
    * n-grams, exact integer counts, ONE final double division). Where
    * [[contaminationScreen]] only lists contaminated docs, this scores
    * EVERY doc so a pipeline can threshold. Same two shapes as the
    * screen: a tiny probe set is one sorted array intersected row-locally
    * (scan-only — the ratio needs no aggregation at all, since per-row
    * gram dedup makes the doc's shingle set a single array); a large one
    * is explode → broadcast LEFT join on the gram itself → one
    * map-side-combined PLAIN-count aggregation (a gram matches at most
    * one probe row, so count(pg) ≡ distinct hit grams; no count_distinct
    * expand, and only partial counts cross the per-doc shuffle). Docs
    * shorter than n words have no shingles and drop on both paths. */
  def containmentScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, probes: org.apache.spark.sql.DataFrame, probeTextCol: String,
      n: Int, probeCacheKey: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val probeGrams = probeGramsOf(probes, probeTextCol, n)
    probeArrayIfTiny(probeGrams, probeCacheKey) match {
      case Some(pgs) =>
        // the drop-short-docs predicate is size(__ws) >= n — EXACTLY the
        // rows whose shingle set is non-empty — stated on the words array
        // so predicate pushdown inlines one cheap split() into the scan;
        // filtering on n_shingles AFTER the projection pushed the WHOLE
        // inlined n-gram lambda (split per element — the O(words²) trap)
        // into the scan filter, measured 16x slower at sf0.1
        docs.select(col(idCol), words(col(textCol)).as("__ws"))
          .filter(size(col("__ws")) >= n)
          .select(col(idCol),
            array_sort(array_distinct(ngramsOf(col("__ws"), n))).as("__g"))
          .select(col(idCol), size(col("__g")).cast("long").as("n_shingles"),
            org.apache.spark.sql.graft.IntersectSizeSorted(col("__g"), typedlit(pgs))
              .as("n_hits"))
          .withColumn("containment",
            col("n_hits").cast("double") / col("n_shingles"))
      case None =>
        docs.select(col(idCol), words(col(textCol)).as("__ws"))
          .select(col(idCol), explode(array_distinct(ngramsOf(col("__ws"), n))).as("g"))
          .join(broadcast(probeGrams), col("g") === col("pg"), "left")
          .groupBy(col(idCol))
          .agg(
            count(lit(1)).as("n_shingles"),
            count(col("pg")).as("n_hits"))
          .withColumn("containment", col("n_hits").cast("double") / col("n_shingles"))
    }
  }

  /** PII redaction (the Dolma/RedPajama-style scrub): email, IPv4, and
    * international-phone patterns masked with TYPED placeholders, plus
    * per-document match counts — the audit trail a redaction pass ships
    * alongside the cleaned text. One codegen scan (regexp_replace /
    * regexp_extract_all), no shuffle; the patterns avoid backtracking-only
    * constructs so the oracle can state them verbatim in RE2. Replacement
    * order (email → ip → phone) is part of the contract: counts are
    * measured on the ORIGINAL text, so they are order-independent. */
  def piiRedact(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ip = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
    val phone = "\\+\\d{7,}"
    val t = col(textCol)
    df.select(col(idCol),
      regexp_replace(regexp_replace(regexp_replace(t,
        email, "<email>"), ip, "<ip>"), phone, "<phone>").as("redacted"),
      size(regexp_extract_all(t, lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(ip), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(t, lit(phone), lit(0))).cast("long").as("n_phones"))
  }

  /** Corpus-internal duplicate-span statistics — the Gopher/CCNet
    * dup-ngram-fraction quality signal (and the span-level dedup decision
    * input): for every document, how many of its DISTINCT n-word spans
    * occur in at least one OTHER document, and the fraction. Differs from
    * [[containmentScore]] (which compares against a small external probe
    * set) in that the "probe set" here is the corpus itself, so nothing
    * broadcasts. Production plan is [[duplicateSpanStatsWindow]] — the
    * measured winner of the round-11 three-arm race at BOTH 2 M and 20 M
    * docs over keyed incidences (SCALE.md): one exchange of (id, gramKey)
    * pairs, one sort, zero joins, and — decisively — no hash-table
    * memory cliff. The hash-everywhere contenders lose above ~1 B
    * distinct grams: the solo arm's final hash aggregate spills itself
    * 2.2× slower, and the groupBy+shuffle-hash-join arm dies outright
    * ("Can't acquire memory to build hash relation"). Exact integer
    * counts, one final double division. Docs shorter than n words have
    * no spans and drop, like the containment scorer. */
  def duplicateSpanStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    duplicateSpanStatsWindow(df, idCol, textCol, n)

  /** Per-document DISTINCT span sets, computed scan-locally: the
    * dataframe-level `.distinct()` the pre-round-11 shape paid a full
    * (doc, span) exchange for only ever removed WITHIN-document repeats —
    * a (doc, span) pair cannot recur across documents — so per-row
    * dedup before the explode is the same set at zero shuffle. Spans are
    * counted by their fixed 60-bit [[gramKey]] (Md5GramKeys — the ns51
    * move): every downstream exchange/aggregate handles an 8-byte long
    * instead of an unbounded gram string, and because the SAME key is
    * declared in the DuckDB oracle, a key collision (two spans → one
    * key) yields identical answers on both engines rather than a flaky
    * mismatch. The keying alone was worth 5–10× at 2 M docs: over gram
    * STRINGS the window arm took 95 s and the solo arm 205 s; over long
    * keys they take 18.0 s and 20.5 s (SCALE.md records the full
    * three-arm race at 2 M and 20 M). Shared by all
    * [[duplicateSpanStats]] plan variants. */
  private def spanSets(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), words(col(textCol)).as("__ws"))
      .select(col(idCol),
        org.apache.spark.sql.graft.Md5GramKeys(col("__ws"), n,
          distinct = true).as("__gs"))

  /** The distinct (doc, span) incidence frame — [[spanSets]] exploded. */
  private def spanIncidences(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    spanSets(df, idCol, textCol, n)
      .select(col(idCol), explode(col("__gs")).as("g"))

  /** "Solo-count" A/B arm: a span is duplicated iff its document
    * frequency > 1, so per-doc dup counts are n_spans minus the spans
    * UNIQUE to the doc — and a unique span's one incidence row already
    * names its owner (min(id) of a df=1 group IS the doc). n_spans is
    * size(per-doc span set) — scan-local, no explode. On paper the
    * incidence frame crosses one exchange with no sort; in the measured
    * race the per-gram hash aggregate is the flaw: distinct grams grow
    * WITH the corpus (~1 B at 20 M docs), so the final aggregate's hash
    * table outgrows task memory and its spill-merge path loses to the
    * window arm's single clean sort (481 s vs 219 s at 20 M; even at 2 M
    * it is slightly behind, 20.5 s vs 18.0 s — SCALE.md). Kept as the
    * race arm documenting WHY the production plan is sort-based: a hash
    * aggregate keyed by something that scales with the data has a memory
    * cliff, a sort does not. */
  private[graft] def duplicateSpanStatsSolo(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val sets = spanSets(df, idCol, textCol, n)
    // per-gram: document frequency + (for df=1 groups) the one owner doc.
    // min(idCol) on a df>1 group is discarded by the filter — cheap either
    // way, and it keeps the aggregation a plain partial/final HashAggregate
    val soloPerDoc = sets
      .select(col(idCol), explode(col("__gs")).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("__df"), min(col(idCol)).as("__solo"))
      .filter(col("__df") === 1)
      .groupBy(col("__solo").as(idCol))
      .agg(count(lit(1)).as("__n_solo"))
    // docs shorter than n words have no spans and DROP, like every variant
    sets.filter(size(col("__gs")) > 0)
      .select(col(idCol), size(col("__gs")).cast("long").as("n_spans"))
      .join(soloPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        (col("n_spans") - coalesce(col("__n_solo"), lit(0L))).as("n_dup_spans"))
      .withColumn("dup_frac", col("n_dup_spans").cast("double") / col("n_spans"))
  }

  /** Window-count plan (the production choice): per-span document
    * frequency via `count over (partition by g)` — same shuffle a
    * groupBy-join takes, minus the join. The WindowExec sorts every
    * incidence by gram key, and that sort is exactly why this arm WINS
    * the race once incidences are 16-byte (id, key) pairs instead of
    * strings: sorting is cliff-free at any gram cardinality, while both
    * hash-based contenders degrade (solo arm, 2.2× slower at 20 M) or
    * die (shuffle-hash join arm) when ~1 B distinct grams outgrow their
    * hash tables. 18.0 s at 2 M / 218.6 s at 20 M docs — near-linear,
    * with the gram-partitioned shuffle as the only wide exchange
    * (SCALE.md). */
  private[graft] def duplicateSpanStatsWindow(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spanIncidences(df, idCol, textCol, n)
      .withColumn("__docs", count(lit(1)).over(Window.partitionBy(col("g"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__docs") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_spans"))
      .withColumn("dup_frac", col("n_dup_spans").cast("double") / col("n_spans"))
  }

  /** GroupBy-join plan (the other A/B arm, the verdict's suggested
    * comparator): per-gram df via hash aggregation, joined back onto a
    * re-read of the incidence frame — no sort, but the full incidence
    * frame flows through a gram-keyed join probe. The shuffle_hash hint
    * is load-bearing: Catalyst's STATIC size estimate for the aggregate
    * undershoots its real ~gram-cardinality output, so the planner
    * broadcast-joined it at 2 M docs and died collecting ~1 GiB to the
    * driver (spark.driver.maxResultSize) — exactly the unbounded-build
    * broadcast this engine's broadcastRowLimit gates exist to prevent.
    * With the hint it survives 2 M (25.0 s, last of the three arms) but
    * is eliminated at 20 M: the per-gram build side grows with the
    * corpus and ShuffledHashJoin cannot spill its build ("Can't acquire
    * memory to build hash relation") — the same scales-with-data hash
    * cliff as the solo arm, terminal instead of slow (SCALE.md). */
  private[graft] def duplicateSpanStatsJoin(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val spans = spanIncidences(df, idCol, textCol, n)
    val perGram = spans.groupBy(col("g")).agg(count(lit(1)).as("__df"))
    spans.join(perGram.hint("shuffle_hash"), Seq("g"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__df") > 1, lit(1L)).otherwise(lit(0L))).as("n_dup_spans"))
      .withColumn("dup_frac", col("n_dup_spans").cast("double") / col("n_spans"))
  }

  /** Position-sensitive polynomial rolling hash (Rabin-Karp): h = Σᵢ
    * wv(wᵢ)·Bⁱ mod M with wv = the word's first 6 md5 hex digits as an
    * integer, B = 131, M = 1e9+7. Unlike [[fingerprint]] (md5 of the
    * sorted word SET), reordering words changes this hash. The B-powers
    * are precomputed and cycle every `maxLen` positions (documented,
    * engine-identical). Arithmetic stays exact Long at ANY document
    * length: each term's product is < 2²⁴·2³⁰ = 2⁵⁴ (wv is 6 hex digits,
    * the power is < M) and is reduced mod M BEFORE the sum, so the summed
    * terms are < 2³⁰ each and the running sum only overflows past ~2³³
    * words — summing unreduced terms overflowed at ~550 words (an
    * ARITHMETIC_OVERFLOW under ANSI mode). Computed by explode +
    * map-side-combined sum — no per-row lambdas, scales with tokens. */
  def rollingFingerprint(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxLen: Int = 128): org.apache.spark.sql.DataFrame = {
    val M = 1000000007L
    val pows = Array.iterate(1L, maxLen)(p => p * 131L % M)
    df.select(col(idCol), posexplode(words(col(textCol))).as(Seq("pos", "w")))
      .select(col(idCol),
        ((conv(substring(md5(col("w")), 1, 6), 16, 10).cast("long") *
          element_at(typedlit(pows.toSeq), (pmod(col("pos"), lit(maxLen)) + 1).cast("int")))
          % M).as("term"))
      .groupBy(col(idCol))
      .agg((sum(col("term")) % M).as("rhash"))
  }

  /** Gopher-style surface-quality signals beyond [[qualityScore]]: mean
    * word length, symbol-to-character ratio, and purely-alphabetic word
    * fraction. Every ratio is one exact integer count over another with a
    * single IEEE division (oracle-exact); all counts are scan-local
    * Column expressions — no shuffle, no UDFs. */
  def qualitySignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    // nullif guards on every denominator: an empty text (length 0) or an
    // empty word array must yield null ratios, not an ANSI DIVIDE_BY_ZERO
    val nw = nullif(size(col("__ws")).cast("double"), lit(0d))
    df.select(col(idCol), words(t).as("__ws"), t.as("__t"))
      .select(col(idCol),
        size(col("__ws")).cast("long").as("n_words"),
        (length(regexp_replace(col("__t"), " ", "")).cast("double") / nw)
          .as("mean_word_len"),
        ((length(col("__t")) - length(regexp_replace(col("__t"), "[^A-Za-z0-9 ]", "")))
          .cast("double") / nullif(length(col("__t")).cast("double"), lit(0d)))
          .as("symbol_ratio"),
        (size(filter(col("__ws"), w => w.rlike("^[a-z]+$"))).cast("double") / nw)
          .as("alpha_word_frac"))
  }

  /** Deterministic stratified sample: the first `n` rows per stratum in
    * md5-of-id order — per-group quotas (the data-mixing step that balances
    * a training corpus across languages/sources) with the same
    * reproducibility story as [[hashSample]]: any engine, any run, any
    * partitioning draws the identical sample. One window shuffle on the
    * stratum key; no global sort. */
  def stratifiedSample(df: org.apache.spark.sql.DataFrame, stratumCol: String,
      idCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .filter(col("__rn") <= n)
      .withColumnRenamed("__rn", "draw_order")
  }

  /** Deterministic source-mix downsampling — the Pile/Dolma data-mixing
    * step: given target corpus shares per source, find the LARGEST
    * feasible corpus honoring the mix exactly (water-filling: the binding
    * source is the one whose rows run out first at its share) and draw
    * each source's quota in md5-of-id order, the same any-engine
    * reproducibility story as [[stratifiedSample]]. Sources absent from
    * `targets` are dropped (share 0). The feasible-corpus bound and the
    * per-source quotas are computed IN-PLAN (a one-row aggregate over the
    * config-sized source counts, broadcast back), so the whole draw is a
    * single lazy dataflow — no driver-side counts action — and the only
    * data-sized shuffle is the draw window on source. All share arithmetic
    * is plain IEEE double (count / share, floor), so the oracle restates
    * it bit-for-bit. */
  def sampleToMix(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      idCol: String, targets: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val tgt = targets.toDF(sourceCol, "__share")
    // water-filling bound: the binding source is the one whose rows run
    // out first at its share; a target source absent from the data binds
    // the whole corpus to zero (left join + coalesce keeps that semantics)
    val nMax = broadcast(
      tgt.join(df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n")),
          Seq(sourceCol), "left")
        .agg(min(floor(coalesce(col("__n"), lit(0L)) / col("__share"))).as("__m")))
    val quotas = broadcast(tgt.crossJoin(nMax)
      .select(col(sourceCol),
        floor(col("__m") * col("__share")).cast("long").as("__quota")))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .join(quotas, Seq(sourceCol))
      .filter(col("__rn") <= col("__quota"))
      .select(col(sourceCol), col(idCol), col("__rn").as("pick_order"))
  }

  /** Concatenate-and-chunk sequence packing: within each group (ordered by
    * id), documents are laid end-to-end and cut into fixed token-budget
    * bins — GPT-style pretraining batch prep. Emits each document's bin
    * and its token offset inside the bin, all in exact integer arithmetic
    * (one running-sum window per group; a document straddling a boundary
    * belongs to the bin its first token lands in). */
  def packSequences(df: org.apache.spark.sql.DataFrame, groupCol: String,
      idCol: String, tokensCol: Column, budget: Int): org.apache.spark.sql.DataFrame =
    packSequences(df, groupCol, Seq(idCol), tokensCol, budget)

  /** Multi-column order variant: the lay-out order is the TUPLE of
    * `idCols` — callers with a composite identity (ns58's (doc_id,
    * chunk_id) chunks) order by the real columns instead of packing them
    * into one arithmetic key, which would overflow or collide somewhere
    * at 100 TB no matter the multiplier. */
  def packSequences(df: org.apache.spark.sql.DataFrame, groupCol: String,
      idCols: Seq[String], tokensCol: Column, budget: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(idCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tokens", tokensCol)
      .withColumn("__cum", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select((col(groupCol) +: idCols.map(col)) ++ Seq(col("tokens"),
        expr(s"__cum div $budget").as("bin"), // integer quotient ('/' on longs is double division)
        (col("__cum") % budget).as("bin_offset")): _*)
  }

  /** Top-k characteristic terms per document by raw TF-IDF
    * (tf × N / docfreq — no logarithm, so every score is one exact integer
    * product and one IEEE division, bit-identical across engines).
    *
    * ONE dataflow, no materialization barrier: term frequencies are
    * computed INSIDE each document's row ([[org.apache.spark.sql.graft
    * .TermCounts]] — tf is doc-local, so the classic explode +
    * groupBy(doc, term) form shuffles a corpus-sized token stream to
    * co-locate rows that already live together; the expression form has
    * NO tf exchange at all). Document frequencies are a
    * `groupBy(term).count()` over the same tf rows (they ARE the distinct
    * doc-term incidences) joined back on term — NOT a count window
    * partitioned by term: a window must buffer each term partition
    * wholesale, and a corpus's hottest term sits in nearly every
    * document, so at 20 M docs that one partition is ~20 M rows and the
    * window's spill buffer dies where the aggregate's map-side combine
    * collapses the same rows to one (term, df) pair per task (measured:
    * the window form OOM-killed the 20 M smoke; this form runs it). The
    * join is left unhinted on purpose — at bench scale the df table is
    * auto-broadcast (tf never shuffles), while a web-scale vocabulary
    * demotes to a streaming shuffle join whose buffered side holds one
    * row per term. The corpus size N stays in-plan: a one-row count
    * aggregate broadcast onto the scored rows instead of an eager
    * `df.count()` job. The final per-document top-k runs through the
    * [[org.apache.spark.sql.graft.TopKPerKey]] physical operator rather
    * than a row_number window: the map-side heap pass cuts every
    * partition to ≤ k rows per document BEFORE the per-doc exchange, and
    * the final pass never sorts whole partitions — the same rows the
    * window form selects ((tfidf desc, term asc) is a total order within
    * a document), one exchange-and-sort cheaper.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val tf = df
      .select(col(idCol),
        explode(org.apache.spark.sql.graft.TermCounts(words(col(textCol)))).as("__tc"))
      .select(col(idCol), col("__tc.term").as("term"), col("__tc.tf").as("tf"))
      .filter(col("term") =!= "")
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("tf") * col("__n")).cast("double") / col("df").cast("double"))
    org.apache.spark.sql.graft.TopKPerKey(scored, Seq(idCol),
        Seq(("tfidf", true), ("term", false)), k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** The fixed-width gram key both engines hash n-grams down to before
    * any shuffle: the first 15 hex digits of the gram's md5 as a 60-bit
    * long. 8 bytes move per gram instead of the (unbounded) gram string,
    * and because the SAME key is declared in the DuckDB oracle, even a
    * hash collision (two grams → one key) yields identical answers on
    * both engines rather than a flaky mismatch. */
  def gramKey(gram: Column): Column =
    conv(substr(md5(gram), lit(1), lit(15)), 16, 10).cast("long")

  /** DSIR-style hashed-vocabulary importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"): the
    * vocabulary hashes into `buckets` fixed cells, a target subcorpus
    * (`isTarget`) and the raw corpus each contribute per-bucket token
    * counts, and every document scores by how much its own token mass
    * lands in target-heavy buckets — `weight = num/den` with
    * `num = Σ_w tf(w)·ctgt(bucket(w))`, `den = Σ_w tf(w)·craw(bucket(w))`.
    * DSIR proper exponentiates a sum of per-bucket LOG-ratios; a log sum
    * is not exactly rounded (accumulation-order ULP drift would make the
    * DuckDB comparison flaky), so this takes the ratio-of-sums form —
    * same monotone "target affinity" signal, all-integer until ONE final
    * IEEE division, bit-identical on both engines. target ⊆ raw, so
    * num ≤ den and the weight is a ready-made inclusion probability for
    * [[dsirSample]].
    *
    * Scale shape (the r13 [[org.apache.spark.sql.graft.BucketCounts]]
    * rewrite): each document's whole feature map is ONE in-row codegen'd
    * expression — a `buckets`-long count vector — so the operator has NO
    * (doc, term) explode and NO corpus-keyed shuffle at all. The stats
    * pass posexplodes the vectors into a partial aggregate whose result
    * is `buckets` rows — bounded by CONFIG, not by corpus — collected
    * into two `buckets`-long arrays per `statsKey` (the same driver-state
    * discipline as IVF centroids / SQ8 bounds: SharedCache key asserts an
    * immutable corpus). Scoring is then two in-row [[org.apache.spark.sql
    * .graft.DotLongs]] against the stats literals — scan-only, the
    * identical shape the STREAMING screen runs ([[dsirScore]]). The
    * previous join-form scoring (stats broadcast + per-doc re-group) and
    * its 3.5×-slower HOF-literal rival are both superseded: this form
    * keeps the join form's codegen md5 AND the literal form's zero
    * shuffles, pinned by PlanShapeSpec. */
  def dsirWeights(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, isTarget: Column, buckets: Int,
      statsKey: String, pin: Boolean = true): org.apache.spark.sql.DataFrame = {
    // ONE tokenize+hash pass feeds BOTH halves: the per-doc
    // [[org.apache.spark.sql.graft.BucketCounts]] vector (in-row, inside
    // whole-stage codegen — no (doc, term) explode, no shuffle ANYWHERE
    // in this operator) is what the stats aggregate reduces and what the
    // scoring projection dots against the stats literals. With `pin` the
    // vector frame is a LAZY executor-local checkpoint — the stats job is
    // the action that materializes its blocks, so the tokenize+md5 work
    // is paid exactly once and never as a separate checkpoint job — held
    // only for the duration of this call (the SharedCache pin wrapping
    // the catalog entry / unpersistScratch releases it); at corpus scale
    // this is the "persist the featurized table once, every consumer
    // reads it" pattern, `buckets`×8 B per doc. A deployment that cannot
    // manage the pin's release (a long-lived app calling this library
    // directly, outside Verify/Bench's scratch sweep) passes pin = false
    // and simply runs the two scans — nothing is persisted at all.
    val featurized = df.select(col(idCol), isTarget.as("__t"),
        org.apache.spark.sql.graft.BucketCounts(words(col(textCol)), buckets).as("__bc"))
    val tb = if (pin) featurized.localCheckpoint(false) else featurized
    val (raw, tgt) = graft.SharedCache.getOrComputeValue(statsKey) {
      statsOf(tb, buckets)
    }
    // scoring = two in-row integer dots against the collected stats
    // (driver-bounded: 2×buckets longs) — scan-only, the same shape the
    // streaming screen runs ([[dsirScore]]); num ≤ den caps both dots at
    // den ≤ (corpus tokens)², fine in Long far past 20 M docs. Docs with
    // no scorable tokens (den = 0 ⟺ the vector is all zeros, since any
    // own token makes den ≥ tf²) are ABSENT — the oracle's semantics.
    tb.select(col(idCol),
        org.apache.spark.sql.graft.DotLongs(col("__bc"), typedlit(tgt)).as("num"),
        org.apache.spark.sql.graft.DotLongs(col("__bc"), typedlit(raw)).as("den"))
      .filter(col("den") > 0L)
      .withColumn("weight",
        col("num").cast("double") / col("den").cast("double"))
  }

  /** Reduce a frame carrying (__t, __bc) [[org.apache.spark.sql.graft
    * .BucketCounts]] vectors to the 2×`buckets` (raw, target) masses:
    * posexplode fans each vector to (bucket, count) rows whose hash
    * aggregate partial-combines to ≤ `buckets` rows per task — the only
    * exchange in the whole DSIR plane, and it moves config-sized data. */
  private def statsOf(tb: org.apache.spark.sql.DataFrame,
      buckets: Int): (Seq[Long], Seq[Long]) = {
    val rows = tb
      .select(col("__t"), posexplode(col("__bc")).as(Seq("b", "c")))
      .groupBy(col("b"))
      .agg(sum(col("c")).as("craw"),
        sum(when(col("__t"), col("c")).otherwise(lit(0L))).as("ctgt"))
      .collect()
    val r = new Array[Long](buckets)
    val t = new Array[Long](buckets)
    rows.foreach { row =>
      r(row.getInt(0)) = row.getLong(1); t(row.getInt(0)) = row.getLong(2)
    }
    (r.toSeq, t.toSeq)
  }

  /** The offline half of [[dsirWeights]]: one partial-aggregated pass to
    * the 2×`buckets` (raw, target) token masses — the trainable "model"
    * a streaming screen publishes ([[graft.streaming.DsirStream]]). */
  def dsirStats(df: org.apache.spark.sql.DataFrame, textCol: String,
      isTarget: Column, buckets: Int): (Seq[Long], Seq[Long]) =
    statsOf(df.select(isTarget.as("__t"),
      org.apache.spark.sql.graft.BucketCounts(words(col(textCol)), buckets).as("__bc")),
      buckets)

  /** In-row scoring over literal stats: one scan, one projection,
    * ZERO shuffles — stateless, which is what lets the SAME expression
    * score a STREAMING frame (no state store, no watermark, no
    * append-mode aggregation; [[graft.streaming.DsirStream]]), and since
    * the [[org.apache.spark.sql.graft.BucketCounts]]/[[org.apache.spark
    * .sql.graft.DotLongs]] rewrite it is the identical codegen'd scoring
    * plane batch uses (the old higher-order transform/aggregate form was
    * CodegenFallback — a measured 3.5× batch tax, now gone). The one
    * remaining difference from [[dsirWeights]]: docs with no scorable
    * tokens score (0, 0, 0.0) here; the batch form omits them. */
  def dsirScore(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, raw: Seq[Long], tgt: Seq[Long]): org.apache.spark.sql.DataFrame = {
    require(raw.size == tgt.size && raw.nonEmpty, "raw/target stats must be same-sized")
    val bc = org.apache.spark.sql.graft.BucketCounts(words(col(textCol)), raw.size)
    df.select(col(idCol),
        org.apache.spark.sql.graft.DotLongs(bc, typedlit(tgt)).as("num"),
        org.apache.spark.sql.graft.DotLongs(bc, typedlit(raw)).as("den"))
      .withColumn("weight",
        when(col("den") === 0L, lit(0.0))
          .otherwise(col("num").cast("double") / col("den").cast("double")))
  }

  /** The ns72 inclusion draw as a reusable predicate over a scored frame:
    * keep iff the id's 20-bit md5 uniform falls under num/den, in exact
    * integer space. Compared in decimal(38,0), not Long: `num·2²⁰` fits a
    * Long only while den < 2⁴³ (~1 bit of headroom at the measured
    * 20 M-doc stats), and a 100 TB corpus blows past that — Long math
    * would then error under ANSI (and in the DuckDB oracle) instead of
    * sampling. The decimal products top out near 2⁸³ (25 digits ≪ 38), so
    * the comparison stays exact at any corpus size this engine targets. */
  def dsirDraw(idCol: String): Column = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val u20 = pmod(gramKey(col(idCol).cast("string")), lit(1048576L))
    u20.cast(dec) * col("den").cast(dec) <
      col("num").cast(dec) * lit(1048576L).cast(dec)
  }

  /** Importance RESAMPLING over [[dsirWeights]]: keep a document with
    * probability equal to its weight, deterministically — the inclusion
    * draw is the document id's own [[gramKey]] reduced to a 20-bit
    * uniform, and the comparison `u20·den < num·2²⁰` stays in exact
    * integer space — evaluated in decimal(38,0) so it cannot overflow at
    * any den (Long math caps out at den ≈ 2⁴³; see [[dsirDraw]] — no
    * float threshold, no engine drift). Scan-only
    * like the scorer: the sample is reproducible row-local arithmetic,
    * the 100 TB shape for "thin this crawl toward the target domain". */
  def dsirSample(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, isTarget: Column, buckets: Int,
      statsKey: String,
      // forwarded to [[dsirWeights]] — a long-lived caller with no
      // scratch sweep needs the no-persist form through this wrapper too
      pin: Boolean = true): org.apache.spark.sql.DataFrame =
    dsirWeights(df, idCol, textCol, isTarget, buckets, statsKey, pin)
      .filter(dsirDraw(idCol))

  /** Corpus-overlap audit: for every pair of sources, the Jaccard overlap
    * of their DISTINCT word n-gram sets — "how much does dataset A
    * duplicate dataset B", the curation question asked before mixing two
    * crawls (C4 vs CC, Pile components, …).
    *
    * Scale shape: sources are a config-sized dimension, so each source is
    * assigned one BIT (sorted-name order, collected once — the same
    * control-plane collect as ns50's mixture quotas) and every gram hashes
    * to a fixed 60-bit [[gramKey]] at the scan. The only data-sized
    * shuffle then moves (gramKey: long, sourceBit: long) pairs into ONE
    * codegen hash aggregate — `bit_or` of the masks per gram — which is
    * simultaneously the distinct pass (bit_or is idempotent, so duplicate
    * (gram, source) rows collapse map-side for free) and the set-builder
    * (the mask IS the source set). No gram string, no collect_set, no
    * ObjectHashAggregate anywhere. Per-source sizes and the pair fan-out
    * both read set bits off the mask frame in ONE unified pass: every
    * mask emits one sizes row per set bit, and pair rows only when it has
    * ≥ 2 bits (a single-source gram's pair transform is empty — do NOT
    * "optimize" by filtering those masks out, the sizes branch needs
    * them); a hot gram present in every source costs one bounded array
    * (k·(k−1)/2 bit pairs), never a join-side blowup. Output is one row
    * per source pair. Corpora with more than 63 sources fall back to the
    * sorted-set shape (still over hashed gram keys). */
  def sourceOverlap(df: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, n: Int,
      // plan-audit hook: the fan-out result is eagerly materialized for
      // its two consumers; PlanShapeSpec passes identity so the WHOLE
      // dataflow stays in one inspectable (and pinnable) plan
      // EAGER on purpose: the fan feeds TWO broadcast builds plus the
      // probe side, and Spark materializes broadcasts concurrently — a
      // lazy checkpoint here raced its own first computation and ran the
      // gram pipeline twice (measured 2× on ns51). Lazy is only safe when
      // exactly one downstream job materializes the blocks.
      materialize: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
        _.localCheckpoint()): org.apache.spark.sql.DataFrame = {
    val toks = overlapToks(df, groupCol, textCol, n)
    // null sources are excluded, matching the former collect_set shape
    // (which skipped nulls): they get no bit, and their rows' null bit
    // index yields a null mask contribution that bit_or ignores
    val srcNames = overlapSrcNames(df, groupCol)
    if (srcNames.length > 63) return sourceOverlapSets(toks)
    val bitName = typedLit(srcNames.zipWithIndex.map(_.swap).toMap)
    val fan = overlapFan(overlapMasks(overlapBits(toks, srcNames)))
    val fanM = materialize(fan)
    val sizes = fanM.filter(col("__bb") === -1)
      .select(col("__ba").as("__b"), col("__cnt").as("__sz"))
    val shared = fanM.filter(col("__bb") =!= -1)
      .select(col("__ba"), col("__bb"), col("__cnt").as("shared"))
    shared
      .join(broadcast(sizes.select(col("__b").as("__ba"), col("__sz").as("__sa"))),
        Seq("__ba"))
      .join(broadcast(sizes.select(col("__b").as("__bb"), col("__sz").as("__sb"))),
        Seq("__bb"))
      .select(element_at(bitName, col("__ba")).as("src_a"),
        element_at(bitName, col("__bb")).as("src_b"), col("shared"),
        (col("shared").cast("double") /
          (col("__sa") + col("__sb") - col("shared")).cast("double")).as("jac"))
  }

  /** [[sourceOverlap]] stage 1 — (source, hashed-gram-key) incidences.
    * Package-private so diagnostics (tools.Ns51Probe) time the OPERATOR'S
    * stages, not a by-eye replica that drifts. The split binds to a column
    * FIRST: inlining `words(...)` into the gram lambda would re-evaluate
    * it per element_at reference — O(words²) per document. Md5GramKeys
    * emits gramKey(gram) for every n-gram in ONE native pass (no per-gram
    * string/hex/parse allocations) and drops WITHIN-document repeats
    * before the explode — set semantics downstream make that a free
    * shuffle-row reduction. */
  private[graft] def overlapToks(df: org.apache.spark.sql.DataFrame,
      groupCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    // NOT widened (r14 A/B: widening lost, 0.83 s vs 0.65 s at sf0.1 —
    // the mask aggregate, not the gram pass, is the dominant term here,
    // so the repartition bought parallelism nothing and cost an exchange)
    df.select(col(groupCol).as("__src"), words(col(textCol)).as("__ws"))
      .select(col("__src"),
        explode(org.apache.spark.sql.graft.Md5GramKeys(col("__ws"), n,
          distinct = true)).as("__gk"))

  /** [[sourceOverlap]]'s source→bit universe: distinct non-null source
    * names, sorted — bit index = rank in sorted name order, so ascending
    * bit pairs are already ascending (src_a, src_b) name pairs and the
    * oracle's a.source < b.source orientation falls out of the encoding. */
  private[graft] def overlapSrcNames(df: org.apache.spark.sql.DataFrame,
      groupCol: String): Array[String] =
    df.select(col(groupCol).cast("string")).distinct()
      .collect().map(_.getString(0)).filter(_ != null).sorted

  /** [[sourceOverlap]] stage 2a — each incidence as (gram key, one-bit
    * source mask). Split from [[overlapMasks]] so a diagnostic can insert
    * an exchange/sort between projection and aggregation and still be
    * timing the operator's own projection. */
  private[graft] def overlapBits(toks: org.apache.spark.sql.DataFrame,
      srcNames: Array[String]): org.apache.spark.sql.DataFrame = {
    val srcBit = typedLit(srcNames.zipWithIndex.toMap)
    toks.select(col("__gk"), element_at(srcBit, col("__src")).as("__bi"))
      .select(col("__gk"), expr("shiftleft(1L, __bi)").as("__m"))
  }

  /** [[sourceOverlap]] stage 2b — per-gram source bitmask via one bit_or
    * aggregation (the mask IS the source set; no collect_set, no
    * ObjectHashAggregate). */
  private[graft] def overlapMasks(
      bits: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bits.groupBy(col("__gk")).agg(bit_or(col("__m")).as("__mask"))

  /** [[sourceOverlap]] stage 3 — ONE fan-out pass serves both downstream
    * aggregates: each mask explodes into its set bits (b = −1 rows →
    * per-source sizes) AND its ascending bit pairs (→ shared counts)
    * together, so the 100M+-row mask frame is read exactly once and never
    * checkpointed. MaskPairCodes emits both row kinds as packed ints in
    * one native codegen pass (the higher-order-function formulation ran
    * interpreted and was ~50 s of the 2 M-doc wall by itself); decode is
    * two-instruction arithmetic. The aggregate has ≤ sources + sources²/2
    * distinct keys — map-side partial aggregation collapses it to a
    * config-sized shuffle — and the ≤-sources²-row result is what gets
    * checkpointed for the two consumers in [[sourceOverlap]]. */
  private[graft] def overlapFan(
      masks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    masks
      .select(explode(org.apache.spark.sql.graft.MaskPairCodes(
        col("__mask"))).as("__c"))
      .groupBy(shiftright(col("__c"), 6).as("__ba"),
        (col("__c").bitwiseAND(lit(63)) - lit(1)).as("__bb"))
      .agg(count(lit(1)).as("__cnt"))

  /** Fallback pair shape for > 63 sources: per-gram sorted source SETS
    * (ObjectHashAggregate) instead of a bitmask — same semantics, same
    * hashed gram keys, heavier per gram. */
  private def sourceOverlapSets(
      toks: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sets = toks
      .groupBy(col("__gk"))
      .agg(sort_array(collect_set(col("__src"))).as("__ss"))
      .localCheckpoint()
    val sizes = sets.select(explode(col("__ss")).as("__src"))
      .groupBy(col("__src")).agg(count(lit(1)).as("__sz"))
    val pairs = sets
      .filter(size(col("__ss")) >= 2)
      .select(explode(expr(
        """flatten(transform(__ss, (x, i) ->
          |  transform(slice(__ss, i + 2, size(__ss) - i - 1), y ->
          |    named_struct('src_a', x, 'src_b', y))))""".stripMargin)).as("__p"))
    val shared = pairs
      .groupBy(col("__p.src_a").as("src_a"), col("__p.src_b").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(broadcast(sizes.select(col("__src").as("src_a"), col("__sz").as("__sa"))),
        Seq("src_a"))
      .join(broadcast(sizes.select(col("__src").as("src_b"), col("__sz").as("__sb"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared"),
        (col("shared").cast("double") /
          (col("__sa") + col("__sb") - col("shared")).cast("double")).as("jac"))
  }

  /** BM25 ranked retrieval of documents against a fixed probe-term set —
    * the classic sparse-retrieval scorer, with the rational idf variant
    * (N − df + ½)/(df + ½): every score is built from integer counts with
    * only IEEE +,−,×,÷ (no logarithm), so the oracle restates it
    * bit-for-bit. Per-document scores fold in SORTED term order (float
    * addition is order-sensitive; an unordered SUM would flake the hash).
    *
    * Scale shape: document length is a PER-ROW expression (count of
    * non-empty split words) — no token explode or shuffle just to count
    * lengths; the token explode semi-joins the broadcast probe set
    * BEFORE the tf aggregate, so the only token-sized shuffle moves
    * probe-term tokens; corpus stats (N, avgdl) are a one-row broadcast;
    * docfreq is probe-sized. The final top-k is TakeOrderedAndProject —
    * no global sort. */
  def bm25Rank(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String], k1: Double, b: Double,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE corpus scan (r14 — the previous shape re-tokenized the corpus
    // three times: the stats pass, the docfreq broadcast build, and the
    // scoring pass each re-evaluated the split+TermCounts plan): tokenize
    // + in-row count + in-row probe prune land in an EAGERLY-checkpointed
    // base of (id, dl, <=|probe| pruned term counts) — tens of bytes per
    // doc at any scale, swept as scratch — and every downstream stat
    // reads it. Eager, not lazy: stats and dfreq are both broadcast
    // builds that materialize CONCURRENTLY, and a lazy checkpoint would
    // race its own first computation and run the tokenize pass twice
    // (the ns51 lesson). NOT widened (r14 A/B: 1.12 s widened vs 0.81 s
    // not, same in-suite context at sf0.1 — the exchange plus 32-task
    // stage trains cost more than the serial tokenize pass saves; at
    // data scale the input is already wide and widening was a no-op, so
    // the 2 M/20 M one-scan wins are untouched).
    val base = df
      .select(col(idCol).as("__id"), words(col(textCol)).as("__ws"))
      .withColumn("__dl",
        size(filter(col("__ws"), w => w =!= lit(""))).cast("long"))
      .filter(col("__dl") > 0)
      .select(col("__id"), col("__dl"),
        filter(org.apache.spark.sql.graft.TermCounts(col("__ws")),
          tc => tc.getField("term").isInCollection(terms)).as("__ptc"))
      .localCheckpoint()
    val dl = base.select(col("__id"), col("__dl"))
    val stats = broadcast(
      dl.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
        .select(col("__n"),
          (col("__sumdl").cast("double") / col("__n").cast("double")).as("__avgdl")))
    // tf stays doc-local (TermCounts — see tfidfTopTerms): the in-row
    // probe prune replaces the former probe semi-join, so no (doc, term)
    // exchange exists anywhere in the tf path (the probe set is a literal)
    val tf = base
      .select(col("__id"), explode(col("__ptc")).as("__tc"))
      .select(col("__id"), col("__tc.term").as("term"), col("__tc.tf").as("__tf"))
    val dfreq = broadcast(tf.groupBy(col("term")).agg(count(lit(1)).as("__df")))
    val scored = tf.join(dl, Seq("__id")).join(dfreq, Seq("term")).crossJoin(stats)
      .withColumn("__idf",
        (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
          (col("__df").cast("double") + lit(0.5)))
      .withColumn("__score",
        col("__idf") * ((col("__tf").cast("double") * lit(k1 + 1)) /
          (col("__tf").cast("double") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * (col("__dl").cast("double") / col("__avgdl"))))))
    scored.groupBy(col("__id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("term"), col("__score")))),
          lit(0.0), (acc, x) => acc + x.getField("__score")).as("score"),
        count(lit(1)).as("n_terms"))
      .select(col("__id").as(idCol), col("score"), col("n_terms"))
      .orderBy(col("score").desc, col(idCol)).limit(k)
  }

  /** Token-budget curation (ns55): per source, admit documents in
    * quality-descending order (id-ascending tiebreak) while the RUNNING
    * token total — inclusive of the candidate — stays within `budget`.
    * The greedy fill every mixture recipe (Pile/Dolma token budgets per
    * component) actually runs; unlike a doc-count cap, the budget is in
    * tokens, so short high-quality docs pack denser.
    *
    * Scale shape: one window shuffle partitioned by source (the natural
    * parallel unit — sources are independent); tokens and quality are
    * per-row scan expressions; no explode, no join, no global sort. A
    * skewed giant source still bounds at its own partition; at 100 TB the
    * partition column is the source, exactly how the corpus is stored. */
  def tokenBudgetSelect(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      idCol: String, textCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(col("q_score").desc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(sourceCol), col(idCol),
        wsTokenCount(col(textCol)).as("tokens"),
        qualityScore(col(textCol)).as("q_score"))
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
  }

  /** Overlapping-window chunking (ns56): split into whitespace tokens,
    * emit one row per (chunk of `size` tokens, stride `stride`) — the
    * standard RAG / context-window prep (stride < size ⇒ consecutive
    * chunks overlap by size − stride tokens; stride > size ⇒ gapped
    * sampling windows). Starts advance by stride only until a chunk
    * reaches the final token (last start ≤ min(n − size + stride, n) —
    * the inner bound stops duplicate-content tails when windows overlap,
    * the outer cap keeps gapped sampling from emitting phantom
    * past-the-end starts with empty content), so the tail chunk may be
    * short but is NEVER empty and NEVER a sub-slice of its predecessor.
    * Chunk identity is the md5 of the re-joined token slice so the
    * oracle can verify content, not just counts.
    *
    * Scale shape: per-row `sequence` + explode — fan-out is
    * ~n_tokens/stride rows per document, no shuffle at all (the
    * chunk rows stay in their document's partition); the token array is
    * computed once in the scan projection and sliced per chunk. */
  def chunkOverlap(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int,
      // extra columns replicated onto every chunk row — the streaming
      // face needs the event-time column to survive the fan-out so a
      // watermark can still be declared downstream
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(stride >= 1 && size >= 1, "chunk size and stride must be >= 1")
    val n = org.apache.spark.sql.functions.size(col("__toks"))
    df.select(col(idCol) +: words(col(textCol)).as("__toks") +: carry.map(col): _*)
      .withColumn("start",
        explode(sequence(lit(1), greatest(least(n - size + stride, n), lit(1)), lit(stride))))
      .select(Seq(col(idCol),
        ((col("start") - 1) / stride).cast("long").as("chunk_id"),
        col("start").cast("long").as("start_tok"),
        least(lit(size), org.apache.spark.sql.functions.size(col("__toks")) - col("start") + 1)
          .cast("long").as("n_toks"),
        md5(concat_ws(" ", slice(col("__toks"), col("start"), lit(size)))).as("chunk_h")) ++
        carry.map(col): _*)
  }

  /** Per-source quality-decile histogram (ns59): bucket every document's
    * quality score into tenths and count per (source, decile) — the
    * mixture-drift audit a curation run watches across crawls (a source
    * whose mass slides down-decile gets re-weighted or dropped). Scores
    * land exactly on [0,1] (qualityScore's construction), and the 1.0
    * edge folds into the top decile so the histogram has exactly 10 bins.
    *
    * Scale shape: the decile is a per-row scan expression; the aggregate
    * is a partial-agg shuffle over ≤ 10·|sources| keys. */
  def qualityHistogram(df: org.apache.spark.sql.DataFrame, sourceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(sourceCol),
        least(floor(qualityScore(col(textCol)) * 10).cast("long"), lit(9L))
          .as("decile"))
      .groupBy(col(sourceCol), col("decile"))
      .agg(count(lit(1)).as("n_docs"))

  /** Per-domain URL stats (ns57): extract every http(s) URL, reduce to its
    * host, and aggregate documents + total hits per host — the shape of a
    * domain-blocklist / domain-mix audit (C4's badlist pass, Dolma's
    * per-domain counts). Like ns49's PII, the corpus is synthetic so both
    * engines inject the SAME deterministic URLs derived from doc_id; the
    * extraction regex is RE2-safe and stated verbatim in the oracle.
    *
    * Scale shape: extract is a scan expression (regexp_extract_all),
    * explode fans out only matched URLs, and the per-host aggregate is a
    * partial-agg shuffle on ~|domains| keys. distinct-doc counting rides
    * the same shuffle (count(distinct id) per host). */
  def urlDomains(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val urls = expr(
      s"regexp_extract_all(`$textCol`, 'https?://[a-z0-9.-]+', 0)")
    df.select(col(idCol), explode(urls).as("url"))
      .select(col(idCol), regexp_replace(col("url"), "https?://", "").as("host"))
      .groupBy(col("host"))
      .agg(countDistinct(col(idCol)).as("n_docs"), count(lit(1)).as("n_hits"))
  }
}
