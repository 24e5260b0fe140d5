package graft.queries

import graft.operators.{Bpe, Multimodal, TextAnalysis}
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis + multimodal-plumbing suite (SURVEY.md §7.2 M6): marker
  * language-ID, quality scoring, token counting, fingerprinting, and the
  * stubbed media-decode pipeline (real mapPartitions plumbing, fake codec).
  */
object TextQueries extends QueryModule {

  private def markerSql(vocab: Seq[String]): String = {
    val cond = vocab.map(v => s"x = '$v'").mkString(" OR ")
    s"CAST(len(list_filter(string_split(lower(text), ' '), x -> $cond)) AS BIGINT)"
  }

  /** ns11's quality formula inline over a `text` column — the SQL twin of
    * [[TextAnalysis.qualityScore]]. ONE definition shared by every oracle
    * that scores quality (ns23, ns55, ns59); a weight/cap tweak edits this
    * and `qualityScore` only. */
  private def qualitySql: String =
    "0.6 * (least(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 200.0) / 200.0)" +
      s" + 0.4 * (CAST(${markerSql(Seq("the", "a"))} AS DOUBLE)" +
      " / CAST(len(string_split(lower(text), ' ')) AS DOUBLE))"

  private val ns10 = QueryEntry(
    "ns10_langid",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val ws = TextAnalysis.words(col("text"))
      val scored = t.documents.select(
        col("doc_id") +:
          TextAnalysis.markers.map { case (l, v) => TextAnalysis.markerScore(ws, v).as(s"s_$l") } :+
          TextAnalysis.langId(col("text")).as("predicted"): _*)
      scored.orderBy(col("doc_id"))
    },
    Some {
      val scores = TextAnalysis.markers
        .map { case (l, v) => s"  ${markerSql(v)} AS s_$l" }.mkString(",\n")
      """SELECT doc_id,
        |SCORES,
        |  CASE WHEN s_en >= s_sql AND s_en >= s_ml THEN 'en'
        |       WHEN s_sql >= s_ml THEN 'sql'
        |       ELSE 'ml' END AS predicted
        |FROM documents
        |ORDER BY doc_id""".stripMargin.replace("SCORES", scores)
    },
  )

  private val ns11 = QueryEntry(
    "ns11_quality",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents.select(
          col("doc_id"),
          TextAnalysis.nWords(col("text")).as("n_words"),
          TextAnalysis.stopwordCount(col("text")).as("n_stop"),
          TextAnalysis.qualityScore(col("text")).as("q_score"))
        .orderBy(col("doc_id"))
    },
    Some(
      s"""SELECT doc_id, n_words, n_stop,
         |  0.6 * (least(CAST(n_words AS DOUBLE), 200.0) / 200.0)
         |    + 0.4 * (CAST(n_stop AS DOUBLE) / CAST(n_words AS DOUBLE)) AS q_score
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
         |    ${markerSql(Seq("the", "a"))} AS n_stop
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin),
  )

  private val ns12 = QueryEntry(
    "ns12_tokens",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(col("lang"),
          TextAnalysis.wsTokenCount(col("text")).as("ws_tok"),
          TextAnalysis.bpeTokenCount(col("text")).as("bpe_tok"))
        .groupBy(col("lang"))
        .agg(sum(col("ws_tok")).as("sum_ws_tok"),
          sum(col("bpe_tok")).as("sum_bpe_tok"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    },
    Some(
      """SELECT lang,
        |  CAST(sum(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS BIGINT) AS sum_ws_tok,
        |  CAST(sum(CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)) AS BIGINT) AS sum_bpe_tok,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
  )

  private val ns13 = QueryEntry(
    "ns13_fingerprint",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin),
  )

  /** Multimodal stub pipeline: pack text bytes as the opaque media payload,
    * run the per-partition decode stub, emit typed metadata. The oracle
    * states the same deterministic fake. */
  private val ns14 = QueryEntry(
    "ns14_multimodal_meta",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Multimodal.metadataFromText(spark, t.documents, "doc_id", "text", "image")
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, 'image' AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  md5(text) AS sha,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS INTEGER) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 480 AS INTEGER) AS height
        |FROM documents ORDER BY doc_id""".stripMargin),
  )

  /** REAL image decode in the oracle gate: each document gets a PNG whose
    * dimensions are an arithmetic function of its id, encoded and decoded
    * through the JDK's actual ImageIO codecs per partition
    * ([[Multimodal.decodeImages]]); the oracle states the dimensions
    * directly, so a hash match proves the real encode→decode round-trip
    * recovered every image's exact geometry. Scan-parallel: images are
    * generated, parsed, and dropped inside one mapPartitions pass — only
    * (id, width, height) rows survive. */
  private val ns46 = QueryEntry(
    "ns46_image_roundtrip",
    (spark, dir) => {
      val s = spark
      import s.implicits._
      val t = Tables(spark, dir)
      // bounded probe: 500 round-trips prove the codec at every SF — the
      // oracle side is pure arithmetic, so scaling the image count with
      // the corpus would only benchmark ImageIO against a constant.
      // Widened: the probe reads ONE parquet split, so the PNG
      // encode+decode loop (the dominant cost — ImageIO, ~0.5 ms/image)
      // otherwise runs serially on ≤3 cores; compute-dense scans follow
      // cores, not input bytes (Parallelism.widen is a no-op at scale)
      val media = graft.operators.Parallelism.widen(
          t.documents.select(col("doc_id")).filter(col("doc_id") < 500))
        .as[Long].mapPartitions(_.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 8).toInt
        val im = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var x = 0
        while (x < w) {
          var y = 0
          while (y < h) { im.setRGB(x, y, ((x * 31 + y * 17 + id) % 0xffffff).toInt); y += 1 }
          x += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        Multimodal.MediaRow(id, "image", bos.toByteArray)
      })
      Multimodal.decodeImages(media).toDF()
        .select(col("doc_id"), col("width"), col("height"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id,
        |  CAST(8 + doc_id % 16 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 8 AS INTEGER) AS height
        |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin),
  )

  /** Scrub + deterministic hash sample — the reproducible cleaning step of
    * a curation pipeline. */
  private val ns22 = QueryEntry(
    "ns22_scrub_sample",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .withColumn("clean", TextAnalysis.scrub(concat(col("text"), lit(" id 12345"))))
        .filter(TextAnalysis.hashSample(col("text"), rate16 = 4))
        .select(col("doc_id"), col("clean"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(text || ' id 12345', '[0-9]+', '<num>', 'g'), ' +', ' ', 'g')) AS clean
        |FROM documents
        |WHERE substr(md5(text), 1, 1) < '4'
        |ORDER BY doc_id""".stripMargin),
  )

  /** The composed curation pipeline: quality-gate → exact-dedup keepers →
    * deterministic sample → per-language corpus stats. Each stage is one of
    * the catalog's operators; the oracle composes the same relational
    * steps. */
  private val ns23 = QueryEntry(
    "ns23_curation_pipeline",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val quality = t.documents
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .filter(col("q") >= 0.3)
      val keepers = quality
        .withColumn("h", md5(col("text")))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
            .orderBy(col("doc_id"))))
        .filter(col("rn") === 1)
      keepers
        .filter(TextAnalysis.hashSample(col("text"), rate16 = 8))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.wsTokenCount(col("text"))).as("sum_tokens"))
        .orderBy(col("lang"))
    },
    Some(
      s"""WITH q AS (
         |  SELECT doc_id, lang, text, $qualitySql AS qs
         |  FROM documents),
         |gated AS (SELECT * FROM q WHERE qs >= 0.3),
         |keepers AS (
         |  SELECT * FROM (
         |    SELECT doc_id, lang, text,
         |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |    FROM gated) WHERE rn = 1)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) AS BIGINT) AS sum_tokens
         |FROM keepers
         |WHERE substr(md5(text), 1, 1) < '8'
         |GROUP BY lang ORDER BY lang""".stripMargin),
  )

  /** Raw TF-IDF (tf × N / docfreq, no log — one exact integer product and
    * one IEEE division, so scores hash-match bit-for-bit) with a per-doc
    * top-3 window. */
  private val ns27 = QueryEntry(
    "ns27_tfidf_topterms",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.tfidfTopTerms(t.documents, "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("term"))
    },
    Some(
      """WITH tok AS (
        |  SELECT doc_id, t AS term FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents)
        |  WHERE t <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT doc_id, term, tf, df,
        |  CAST(tf * n.n AS DOUBLE) / CAST(df AS DOUBLE) AS tfidf
        |FROM tf JOIN dfreq USING (term) CROSS JOIN n
        |QUALIFY row_number() OVER (
        |  PARTITION BY doc_id ORDER BY CAST(tf * n.n AS DOUBLE) / CAST(df AS DOUBLE) DESC, term ASC) <= 3
        |ORDER BY doc_id, term""".stripMargin),
    headline = true,
  )

  /** Within-doc repetition signals; min corpus doc length is 10 words so
    * the bigram expressions never hit the degenerate <2-word case. */
  private val ns28 = QueryEntry(
    "ns28_repetition",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.repetitionMetrics(t.documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some(
      """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |tf AS (
        |  SELECT doc_id, t, count(*) AS c
        |  FROM (SELECT doc_id, unnest(w) AS t FROM w) GROUP BY doc_id, t),
        |ws AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    count(*) AS n_distinct_words, max(c) AS top_c
        |  FROM tf GROUP BY doc_id),
        |bg AS (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
        |    FROM w) GROUP BY doc_id, g),
        |bgc AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb, count(*) AS ndb
        |  FROM bg GROUP BY doc_id)
        |SELECT doc_id, n_words, n_distinct_words,
        |  CAST(n_words - n_distinct_words AS DOUBLE) / CAST(n_words AS DOUBLE) AS dup_word_ratio,
        |  CAST(top_c AS DOUBLE) / CAST(n_words AS DOUBLE) AS top_word_frac,
        |  CAST(nb - ndb AS DOUBLE) / CAST(nb AS DOUBLE) AS dup_bigram_ratio
        |FROM ws JOIN bgc USING (doc_id) ORDER BY doc_id""".stripMargin),
  )

  /** Contamination screen against three probe trigrams drawn from the
    * corpus vocabulary (each hits a handful of documents at every SF). */
  private val ProbeTexts = Seq("part filter scan", "stream table hash", "window fast query")

  private val ns29 = QueryEntry(
    "ns29_contamination",
    (spark, dir) => {
      val s = spark
      import s.implicits._
      val t = Tables(spark, dir)
      val probes = ProbeTexts.toDF("ptext")
      TextAnalysis.contaminationScreen(t.documents, "doc_id", "text", probes, "ptext", n = 3,
        probeCacheKey = Some(s"probegrams:$dir:3"))
        .orderBy(col("doc_id"))
    },
    Some {
      val values = ProbeTexts.map(p => s"('$p')").mkString(", ")
      s"""WITH probes(ptext) AS (VALUES $values),
         |pw AS (SELECT string_split(lower(ptext), ' ') AS pw FROM probes),
         |psh AS (SELECT DISTINCT g AS pg FROM (
         |  SELECT unnest(list_transform(range(1, len(pw) - 1),
         |    i -> pw[i] || ' ' || pw[i+1] || ' ' || pw[i+2])) AS g FROM pw)),
         |dsh AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents))
         |SELECT doc_id, count(DISTINCT g) AS n_hits
         |FROM dsh JOIN psh ON g = pg
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  )

  /** Per-doc benchmark-containment ratio (decontamination scoring): the
    * graded companion of ns29's screen — every doc scored, threshold
    * downstream. */
  private val ns47 = QueryEntry(
    "ns47_containment_score",
    (spark, dir) => {
      val s = spark
      import s.implicits._
      val t = Tables(spark, dir)
      val probes = ProbeTexts.toDF("ptext")
      TextAnalysis.containmentScore(t.documents, "doc_id", "text", probes, "ptext", n = 3,
        probeCacheKey = Some(s"probegrams:$dir:3"))
        .orderBy(col("doc_id"))
    },
    Some {
      val values = ProbeTexts.map(p => s"('$p')").mkString(", ")
      s"""WITH probes(ptext) AS (VALUES $values),
         |pw AS (SELECT string_split(lower(ptext), ' ') AS pw FROM probes),
         |psh AS (SELECT DISTINCT g AS pg FROM (
         |  SELECT unnest(list_transform(range(1, len(pw) - 1),
         |    i -> pw[i] || ' ' || pw[i+1] || ' ' || pw[i+2])) AS g FROM pw)),
         |dsh AS (SELECT doc_id,
         |  unnest(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
         |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)),
         |j AS (SELECT d.doc_id, d.g, p.pg FROM dsh d LEFT JOIN psh p ON d.g = p.pg)
         |SELECT doc_id,
         |  count(DISTINCT g) AS n_shingles,
         |  count(DISTINCT CASE WHEN pg IS NOT NULL THEN g END) AS n_hits,
         |  CAST(count(DISTINCT CASE WHEN pg IS NOT NULL THEN g END) AS DOUBLE)
         |    / count(DISTINCT g) AS containment
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  )

  /** Corpus-internal duplicate-span fraction (Gopher/CCNet dup-ngram
    * quality signal): for every doc, the share of its distinct trigram
    * spans that some OTHER document also contains — the span-level dedup
    * decision input, with the corpus itself as the probe set (nothing
    * broadcasts; see TextAnalysis.duplicateSpanStats). Spans are counted
    * by their fixed 60-bit [[TextAnalysis.gramKey]] on BOTH engines
    * (same move as ns51), so the comparison is collision-identical. */
  private val ns48 = QueryEntry(
    "ns48_dup_spans",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.duplicateSpanStats(t.documents, "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },
    Some {
      val gk = duckGramKey("g0")
      s"""WITH dsh AS (SELECT DISTINCT doc_id, $gk AS g FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g0
         |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents))),
         |cnt AS (SELECT g, count(*) AS docs FROM dsh GROUP BY g)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |  CAST(sum(CASE WHEN docs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_frac
         |FROM dsh JOIN cnt USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
  )

  /** PII redaction with audit counts: synthetic PII (derived from doc_id,
    * both engines state the same concat) injected into each document,
    * masked with typed placeholders, match counts reported. */
  private val ns49 = QueryEntry(
    "ns49_pii_redact",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val did = col("doc_id").cast("string")
      val withPii = t.documents.select(col("doc_id"),
        concat(col("text"), lit(" call +8190123"), did,
          lit(" mail u"), did, lit("@example.com ip 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7")).as("tx"))
      TextAnalysis.piiRedact(withPii, "doc_id", "tx").orderBy(col("doc_id"))
    },
    Some(
      """WITH t AS (SELECT doc_id,
        |  text || ' call +8190123' || CAST(doc_id AS VARCHAR) || ' mail u' ||
        |  CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' ||
        |  CAST(doc_id % 256 AS VARCHAR) || '.7' AS tx FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(tx,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<email>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<ip>', 'g'),
        |    '\+\d{7,}', '<phone>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(tx, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(tx, '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(tx, '\+\d{7,}')) AS BIGINT) AS n_phones
        |FROM t ORDER BY doc_id""".stripMargin),
  )

  /** The ns50 mix (sums to 1): 30/20/15/15/10/10 over six sources; the
    * other fourteen drop. Declared ABOVE ns50: object vals initialize in
    * declaration order, and ns50's oracle block reads this eagerly. */
  private val MixTargets: Seq[(String, Double)] = Seq(
    "src0" -> 0.3, "src1" -> 0.2, "src2" -> 0.15, "src3" -> 0.15,
    "src4" -> 0.1, "src5" -> 0.1)

  /** Deterministic source-mix downsample: a non-uniform target mix over a
    * uniform corpus — the binding source (highest share) caps the
    * feasible corpus, every quota follows from it, and the draw order is
    * md5-of-id on both engines. */
  private val ns50 = QueryEntry(
    "ns50_source_mix",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.sampleToMix(t.documents, "source", "doc_id", MixTargets)
        .orderBy(col("doc_id"))
    },
    Some {
      val values = MixTargets.map { case (s, t) => s"('$s', $t)" }.mkString(", ")
      s"""WITH tgt(source, share) AS (VALUES $values),
         |c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |nmax AS (SELECT min(floor(n / share)) AS m FROM c JOIN tgt USING (source)),
         |q AS (SELECT source, CAST(floor(m * share) AS BIGINT) AS quota
         |      FROM tgt CROSS JOIN nmax),
         |r AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rn
         |  FROM documents)
         |SELECT source, doc_id, rn AS pick_order
         |FROM r JOIN q USING (source) WHERE rn <= quota
         |ORDER BY doc_id""".stripMargin
    },
  )

  /** Deterministic per-language quota sample (data mixing): first 50 docs
    * per lang in md5-of-id order. */
  private val ns31 = QueryEntry(
    "ns31_stratified_sample",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.stratifiedSample(t.documents, "lang", "doc_id", n = 50)
        .select(col("lang"), col("doc_id"), col("draw_order"))
        .orderBy(col("lang"), col("draw_order"))
    },
    Some(
      """SELECT lang, doc_id, draw_order FROM (
        |  SELECT lang, doc_id,
        |    CAST(row_number() OVER (
        |      PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS draw_order
        |  FROM documents)
        |WHERE draw_order <= 50 ORDER BY lang, draw_order""".stripMargin),
  )

  /** Concatenate-and-chunk packing into 200-token bins per source. */
  private val ns32 = QueryEntry(
    "ns32_sequence_packing",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.packSequences(t.documents, "source", "doc_id",
          TextAnalysis.wsTokenCount(col("text")), budget = 200)
        .orderBy(col("source"), col("doc_id"))
    },
    Some(
      """SELECT source, doc_id, tokens,
        |  cum // 200 AS bin, cum % 200 AS bin_offset
        |FROM (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tokens,
        |    COALESCE(CAST(sum(CAST(len(string_split(lower(text), ' ')) AS BIGINT)) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
        |  FROM documents)
        |ORDER BY source, doc_id""".stripMargin),
  )

  /** Surface-quality signals (the Gopher rule family minus line-based
    * ones — the corpus is single-line). */
  private val ns33 = QueryEntry(
    "ns33_quality_signals",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.qualitySignals(t.documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id,
        |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_words,
        |  CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |    / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS mean_word_len,
        |  CAST(len(text) - len(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
        |    / CAST(len(text) AS DOUBLE) AS symbol_ratio,
        |  CAST(len(list_filter(string_split(lower(text), ' '),
        |      x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
        |    / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS alpha_word_frac
        |FROM documents ORDER BY doc_id""".stripMargin),
  )

  /** Corpus vocabulary: top-100 terms by frequency. Tokens are
    * pre-counted inside each document's row (TermCounts — the partial
    * aggregate then hashes per-doc-DISTINCT terms instead of every
    * token), one partial-aggregated groupBy sums them; the top-100 is
    * TakeOrderedAndProject (bounded heap per partition + driver merge),
    * never a global sort. */
  private val ns34 = QueryEntry(
    "ns34_vocab_top",
    (spark, dir) => {
      val t = Tables(spark, dir)
      t.documents
        .select(explode(org.apache.spark.sql.graft.TermCounts(
          TextAnalysis.words(col("text")))).as("__tc"))
        .select(col("__tc.term").as("term"), col("__tc.tf").as("tf"))
        .filter(col("term") =!= "")
        .groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
        .orderBy(col("cnt").desc, col("term"))
        .limit(100)
    },
    Some(
      """SELECT t AS term, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS t FROM documents)
        |WHERE t <> '' GROUP BY t ORDER BY cnt DESC, term LIMIT 100""".stripMargin),
  )

  /** Rabin-Karp rolling-hash fingerprint (position-sensitive; B-powers
    * embedded as literals on both engines). */
  private val ns38 = QueryEntry(
    "ns38_rolling_fingerprint",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.rollingFingerprint(t.documents, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    Some {
      val M = 1000000007L
      val pows = Array.iterate(1L, 128)(p => p * 131L % M).mkString("[", ", ", "]")
      val wv = (1 to 6).map { k =>
        val mult = math.pow(16, 6 - k).toLong
        s"(strpos('0123456789abcdef', substr(md5(w[i]), $k, 1)) - 1) * $mult"
      }.mkString(" + ")
      s"""SELECT doc_id,
         |  CAST(list_sum(list_transform(range(1, len(w) + 1), i ->
         |    (($wv) * ($pows)[(i - 1) % 128 + 1]) % 1000000007)) AS BIGINT) % 1000000007 AS rhash
         |FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
         |ORDER BY doc_id""".stripMargin
    },
  )

  /** ns52's probe-term set (drawn from the synthetic vocab). */
  private val Bm25Probe: Seq[String] =
    Seq("spark", "vector", "join", "merge", "window", "filter", "customer", "query")

  /** DuckDB restatement of [[graft.operators.TextAnalysis.gramKey]] over
    * the named gram column: the first 15 md5 hex digits as a base-16
    * BIGINT, digit-by-digit (strpos over the hex alphabet — DuckDB 1.0
    * has no conv()). Declared in every oracle whose Spark side hashes
    * grams through Md5GramKeys (ns48, ns51), so key collisions are
    * engine-identical rather than flaky. */
  private def duckGramKey(c: String): String =
    (1 to 15).map { k =>
      val mult = 1L << (4 * (15 - k))
      s"(strpos('0123456789abcdef', substr(md5($c), $k, 1)) - 1) * CAST($mult AS BIGINT)"
    }.mkString(" + ")

  /** Corpus-overlap audit: pairwise shared distinct-trigram Jaccard
    * between sources — the "does dataset A duplicate dataset B" question
    * asked before mixing corpora. Pair fan-out is bounded by sources²,
    * never documents². Both engines hash every gram down to the SAME
    * fixed 60-bit key (first 15 hex digits of its md5 —
    * [[graft.operators.TextAnalysis.gramKey]]) before aggregating, so the
    * comparison is collision-identical, not merely collision-unlikely. */
  private val ns51 = QueryEntry(
    "ns51_source_overlap",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.sourceOverlap(t.documents, "source", "text", n = 3)
        .orderBy(col("src_a"), col("src_b"))
    },
    Some {
      val gk = duckGramKey("g0")
      s"""WITH w AS (SELECT source, string_split(lower(text), ' ') AS w FROM documents),
         |g AS (SELECT DISTINCT source, $gk AS g FROM (
         |  SELECT source, unnest(list_transform(range(1, len(w) - 1),
         |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g0 FROM w)),
         |sz AS (SELECT source, count(*) AS sz FROM g GROUP BY source),
         |sh AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
         |  FROM g a JOIN g b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2)
         |SELECT src_a, src_b, shared,
         |  CAST(shared AS DOUBLE) / CAST(sa.sz + sb.sz - shared AS DOUBLE) AS jac
         |FROM sh JOIN sz sa ON sa.source = src_a JOIN sz sb ON sb.source = src_b
         |ORDER BY src_a, src_b""".stripMargin
    },
  )

  /** BM25 retrieval over the corpus for a fixed probe-term set (rational
    * idf — no logarithm, so both engines compute bit-identical doubles;
    * the per-doc fold runs in sorted term order on both sides because
    * float addition is order-sensitive). k1 = 1.2, b = 0.75. */
  private val ns52 = QueryEntry(
    "ns52_bm25_search",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.bm25Rank(t.documents, "doc_id", "text", Bm25Probe,
          k1 = 1.2, b = 0.75, k = 20)
        .orderBy(col("score").desc, col("doc_id"))
    },
    Some {
      val values = Bm25Probe.map(p => s"('$p')").mkString(", ")
      s"""WITH tok AS (SELECT doc_id, t AS term FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t FROM documents)
         |  WHERE t <> ''),
         |dln AS (SELECT doc_id,
         |    CAST(len(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS BIGINT) AS dl
         |  FROM documents
         |  WHERE len(list_filter(string_split(lower(text), ' '), x -> x <> '')) > 0),
         |st AS (SELECT count(*) AS n,
         |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dln),
         |probe(term) AS (VALUES $values),
         |tf AS (SELECT doc_id, term, count(*) AS tf
         |  FROM tok JOIN probe USING (term) GROUP BY doc_id, term),
         |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT doc_id, term,
         |  ((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
         |  ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) +
         |    1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) AS score
         |  FROM tf JOIN dln USING (doc_id) JOIN dfreq USING (term) CROSS JOIN st),
         |agg AS (SELECT doc_id,
         |  CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(score ORDER BY term)),
         |    (a, b) -> a + b) AS DOUBLE) AS score,
         |  count(*) AS n_terms FROM sc GROUP BY doc_id)
         |SELECT doc_id, score, n_terms FROM agg
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
    },
  )

  /** Per-source token budget for ns55 — small enough that every source
    * overflows it (the filter actually bites at every SF). */
  private val TokenBudget = 500L

  /** Token-budget curation: greedy quality-ordered fill per source until
    * the running token total hits the budget — the per-component token
    * cap of a Pile/Dolma-style mixture recipe. One window shuffle on
    * source; tokens and quality are scan expressions (ns11's formula). */
  private val ns55 = QueryEntry(
    "ns55_token_budget",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.tokenBudgetSelect(t.documents, "source", "doc_id", "text",
          TokenBudget)
        .orderBy(col("source"), col("doc_id"))
    },
    Some(
      s"""WITH t AS (SELECT source, doc_id,
         |  CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS tokens,
         |  $qualitySql AS q_score
         |  FROM documents)
         |SELECT source, doc_id, tokens, q_score,
         |  CAST(sum(tokens) OVER (PARTITION BY source
         |    ORDER BY q_score DESC, doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |FROM t
         |QUALIFY cum_tokens <= $TokenBudget
         |ORDER BY source, doc_id""".stripMargin),
  )

  private val ChunkSize = 32
  private val ChunkStride = 24

  /** Overlapping-window chunking: one row per 32-token window at stride 24
    * (8-token overlap) — RAG / context-window prep. Chunk content is
    * verified via md5 of the re-joined slice; fan-out is per-row sequence
    * + explode, shuffle-free. */
  private val ns56 = QueryEntry(
    "ns56_chunk_overlap",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.chunkOverlap(t.documents, "doc_id", "text",
          ChunkSize, ChunkStride)
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks,
         |  unnest(generate_series(1,
         |    greatest(least(len(toks) - $ChunkSize + $ChunkStride, len(toks)), 1), $ChunkStride)) AS start
         |  FROM t)
         |SELECT doc_id,
         |  CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
         |  CAST(start AS BIGINT) AS start_tok,
         |  CAST(least($ChunkSize, len(toks) - start + 1) AS BIGINT) AS n_toks,
         |  md5(array_to_string(list_slice(toks, start, start + ${ChunkSize - 1}), ' ')) AS chunk_h
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin),
  )

  /** Per-domain URL audit: synthetic URLs (derived from doc_id — the
    * corpus has none, so both engines inject the SAME ones, the ns49
    * pattern) extracted with one RE2-safe regex, reduced to hosts, and
    * aggregated per host — the domain-blocklist / domain-mix audit shape.
    * Extract is a scan expression; the per-host aggregate is a
    * partial-agg shuffle over ~48 keys. */
  private val ns57 = QueryEntry(
    "ns57_url_domains",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val did = col("doc_id").cast("string")
      val withUrls = t.documents.select(col("doc_id"),
        concat(col("text"),
          lit(" see https://mirror"), (col("doc_id") % 37).cast("string"),
          lit(".example.com/d/"), did,
          lit(" and http://cdn"), (col("doc_id") % 11).cast("string"),
          lit(".example.net/x")).as("tx"))
      TextAnalysis.urlDomains(withUrls, "doc_id", "tx").orderBy(col("host"))
    },
    Some(
      """WITH t AS (SELECT doc_id,
        |  text || ' see https://mirror' || CAST(doc_id % 37 AS VARCHAR) ||
        |  '.example.com/d/' || CAST(doc_id AS VARCHAR) ||
        |  ' and http://cdn' || CAST(doc_id % 11 AS VARCHAR) ||
        |  '.example.net/x' AS tx FROM documents),
        |u AS (SELECT doc_id,
        |  regexp_replace(unnest(regexp_extract_all(tx, 'https?://[a-z0-9.-]+')),
        |    'https?://', '') AS host
        |  FROM t)
        |SELECT host, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  count(*) AS n_hits
        |FROM u GROUP BY host ORDER BY host""".stripMargin),
  )

  private val PackBudget = 256

  /** The composed curation tail every training-prep run actually ships:
    * chunk the corpus (ns56's windows), drop duplicate chunks corpus-wide
    * (first occurrence by (doc, chunk) wins — chunk-level exact dedup, the
    * granularity at which boilerplate repeats), then lay the survivors
    * end-to-end per source and cut fixed token-budget training sequences
    * (ns32's packing). Demonstrates the operators COMPOSE in one
    * dataflow: explode → per-hash window → join → per-source running-sum
    * window, each shuffle on a scalable key (chunk_h, doc_id, source). */
  private val ns58 = QueryEntry(
    "ns58_chunk_pack",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables(spark, dir)
      val chunks = TextAnalysis.chunkOverlap(t.documents, "doc_id", "text",
        ChunkSize, ChunkStride)
      val firstSeen = chunks.withColumn("__rn", row_number().over(
          Window.partitionBy(col("chunk_h"))
            .orderBy(col("doc_id"), col("chunk_id"))))
        .filter(col("__rn") === 1)
      // surviving chunks keep their REAL composite identity — pack order
      // is the (doc_id, chunk_id) tuple, not an arithmetic key with a
      // token-count cliff
      val keyed = firstSeen
        .join(t.documents.select(col("doc_id"), col("source")), "doc_id")
      TextAnalysis.packSequences(keyed, "source", Seq("doc_id", "chunk_id"),
          col("n_toks"), PackBudget)
        .orderBy(col("source"), col("doc_id"), col("chunk_id"))
    },
    Some(
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, toks,
         |  unnest(generate_series(1,
         |    greatest(least(len(toks) - $ChunkSize + $ChunkStride, len(toks)), 1), $ChunkStride)) AS start
         |  FROM t),
         |c AS (SELECT doc_id,
         |  CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
         |  CAST(least($ChunkSize, len(toks) - start + 1) AS BIGINT) AS n_toks,
         |  md5(array_to_string(list_slice(toks, start, start + ${ChunkSize - 1}), ' ')) AS chunk_h
         |  FROM s),
         |d AS (SELECT doc_id, chunk_id, n_toks FROM (
         |  SELECT c.*, row_number() OVER (PARTITION BY chunk_h
         |    ORDER BY doc_id, chunk_id) AS rn FROM c) WHERE rn = 1),
         |j AS (SELECT doc.source, d.doc_id, d.chunk_id,
         |  d.n_toks FROM d JOIN documents doc USING (doc_id)),
         |p AS (SELECT source, doc_id, chunk_id, n_toks AS tokens,
         |  COALESCE(CAST(sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id, chunk_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum
         |  FROM j)
         |SELECT source, doc_id, chunk_id, tokens,
         |  cum // $PackBudget AS bin, cum % $PackBudget AS bin_offset
         |FROM p ORDER BY source, doc_id, chunk_id""".stripMargin),
  )

  /** Quality-decile mixture audit: 10 bins per source, the drift view a
    * curation run compares across crawls. Quality is ns11's exact formula
    * on both engines, so the decile boundary arithmetic hash-matches. */
  private val ns59 = QueryEntry(
    "ns59_quality_histogram",
    (spark, dir) => {
      val t = Tables(spark, dir)
      TextAnalysis.qualityHistogram(t.documents, "source", "text")
        .orderBy(col("source"), col("decile"))
    },
    Some(
      s"""WITH q AS (SELECT source,
         |  $qualitySql AS q_score
         |  FROM documents)
         |SELECT source,
         |  least(CAST(floor(q_score * 10) AS BIGINT), 9) AS decile,
         |  count(*) AS n_docs
         |FROM q GROUP BY source, decile ORDER BY source, decile""".stripMargin),
  )

  /** Shared CTE chain for the DSIR pair (ns71/ns72): per-doc hashed-bucket
    * token counts, 256-bucket target/raw stats, and the per-doc integer
    * (num, den) scores. The weight itself is ONE IEEE division of exact
    * integers — see [[graft.operators.TextAnalysis.dsirWeights]] for why
    * the ratio-of-sums form replaces DSIR's log-ratio sum here. */
  private def dsirScoreCtes: String = {
    val gk = duckGramKey("w")
    s"""tok AS (SELECT doc_id, lang, w, CAST(count(*) AS BIGINT) AS tf FROM (
       |    SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS w FROM documents)
       |  WHERE w <> '' GROUP BY doc_id, lang, w),
       |bk AS (SELECT doc_id, lang, ($gk) % 256 AS b, tf FROM tok),
       |stats AS (SELECT b, CAST(sum(tf) AS BIGINT) AS craw,
       |    CAST(sum(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS ctgt
       |  FROM bk GROUP BY b),
       |sc AS (SELECT doc_id,
       |    CAST(sum(bk.tf * s.ctgt) AS BIGINT) AS num,
       |    CAST(sum(bk.tf * s.craw) AS BIGINT) AS den
       |  FROM bk JOIN stats s USING (b) GROUP BY doc_id)""".stripMargin
  }

  /** The scored (doc_id, num, den, weight) frame ns71 emits and ns72
    * resamples — ONE explode+join+re-group materialization through
    * SharedCache, so the pair shares the scoring plan the way a real
    * pipeline shares a scored table (score once, weight-read and
    * sample-read both consume it). The stats pass underneath is itself
    * SharedCache'd per statsKey. */
  private def dsirScored(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    graft.SharedCache.getOrCompute(s"dsirscored:$dir:en:256", spark) {
      TextAnalysis.dsirWeights(Tables(spark, dir).documents, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 256,
        statsKey = s"dsir:$dir:en:256")
    }

  /** DSIR-style importance weights toward the English subcorpus: hashed
    * 256-bucket vocabulary, all-integer scoring, one final division. */
  private val ns71 = QueryEntry(
    "ns71_dsir_weights",
    (spark, dir) => dsirScored(spark, dir).orderBy(col("doc_id")),
    Some(
      s"""WITH $dsirScoreCtes
         |SELECT doc_id, num, den,
         |  CASE WHEN den = 0 THEN 0.0 ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS weight
         |FROM sc ORDER BY doc_id""".stripMargin),
    headline = true,
  )

  /** Deterministic importance resampling over ns71's weights: inclusion
    * iff the doc id's 20-bit md5 uniform falls under its weight, compared
    * in exact integer space on both engines. */
  private val ns72 = QueryEntry(
    "ns72_dsir_sample",
    (spark, dir) => dsirScored(spark, dir)
      .filter(TextAnalysis.dsirDraw("doc_id"))
      .orderBy(col("doc_id")),
    Some {
      val ugk = duckGramKey("CAST(doc_id AS VARCHAR)")
      s"""WITH $dsirScoreCtes
         |SELECT doc_id, num, den,
         |  CASE WHEN den = 0 THEN 0.0 ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS weight
         |FROM sc
         |WHERE (($ugk) % 1048576) * den < num * 1048576
         |ORDER BY doc_id""".stripMargin
    },
    headline = true,
  )

  /** Real merges-table BPE token counts (the budget arithmetic ns12's
    * whitespace count and ns32's regex proxy stand in for) — per doc,
    * under the committed [[graft.operators.Bpe.Fixture]] table (48
    * merges trained from the sf0.001 corpus, spec-pinned to the
    * trainer's output). The Spark side is ONE scan through the native
    * [[org.apache.spark.sql.graft.BpeCount]] expression (merges ride
    * the expression as a constant; per-word results memoized
    * executor-side). The oracle replays the merge LOOP itself in SQL: a
    * recursive CTE over the DISTINCT words advances each word one merge
    * per iteration — always the lowest-ranked adjacent pair present,
    * all occurrences merged per step via a per-position list rewrite
    * (exact because the trainer never emits self-merges, so occurrences
    * cannot overlap) — then joins terminal symbol counts back to the
    * per-doc word multiset. Same vocabulary-not-corpus shape both
    * sides: the loop runs over distinct words (vocabulary-sized at any
    * corpus scale), the corpus pass is a scan + join on word. */
  private val ns78 = QueryEntry(
    "ns78_bpe_token_count",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Bpe.tokenCounts(t.documents, "doc_id", "text").orderBy(col("doc_id"))
    },
    Some {
      val fixtureRows = Bpe.Fixture.zipWithIndex.map { case ((l, r), i) =>
        s"(${i + 1}, '$l', '$r')"
      }.mkString(", ")
      s"""WITH RECURSIVE
         |mk(rank, l, r) AS (VALUES $fixtureRows),
         |mkl AS (SELECT list(l || ' ' || r ORDER BY rank) AS ks FROM mk),
         |dw AS (SELECT doc_id, w FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents)
         |  WHERE w <> ''),
         |words AS (SELECT DISTINCT w FROM dw),
         |init AS (SELECT w, list_transform(range(1, len(w) + 1), i -> w[i]) AS s
         |  FROM words),
         |st AS (
         |  SELECT w, s FROM init
         |  UNION ALL
         |  SELECT w,
         |    list_filter(
         |      list_transform(range(1, len(s) + 1), i ->
         |        CASE
         |          WHEN s[i] = bl AND i < len(s) AND s[i + 1] = br THEN bl || br
         |          WHEN s[i] = br AND i > 1 AND s[i - 1] = bl THEN NULL
         |          ELSE s[i]
         |        END),
         |      x -> x IS NOT NULL) AS s
         |  FROM (
         |    SELECT w, s,
         |      string_split(ks[best], ' ')[1] AS bl,
         |      string_split(ks[best], ' ')[2] AS br
         |    FROM (
         |      SELECT w, s, ks,
         |        list_min(list_filter(
         |          list_transform(range(1, len(s)),
         |            i -> list_position(ks, s[i] || ' ' || s[i + 1])),
         |          p -> p > 0)) AS best
         |      FROM st, mkl)
         |    WHERE best IS NOT NULL)),
         |fin AS (
         |  SELECT w, len(s) AS n FROM st, mkl
         |  WHERE len(list_filter(
         |    list_transform(range(1, len(s)),
         |      i -> list_position(ks, s[i] || ' ' || s[i + 1])),
         |    p -> p > 0)) = 0)
         |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bpe_tokens
         |FROM dw JOIN fin USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    headline = true,
  )

  override def entries: Seq[QueryEntry] =
    Seq(ns10, ns11, ns12, ns13, ns14, ns22, ns23, ns27, ns28, ns29, ns31, ns32,
      ns33, ns34, ns38, ns46, ns47, ns48, ns49, ns50, ns51, ns52, ns55, ns56,
      ns57, ns58, ns59, ns71, ns72, ns78)
}
