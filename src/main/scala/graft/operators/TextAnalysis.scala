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
    val stopRatio = stopwordCount(text).cast("double") / nw
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
  def hashSample(key: Column, rate16: Int): Column =
    substring(md5(key), 1, 1) < lit(java.lang.Integer.toHexString(rate16))

  /** Top-k characteristic terms per document by raw TF-IDF
    * (tf × N / docfreq — no logarithm, so every score is one exact integer
    * product and one IEEE division, bit-identical across engines).
    *
    * One token explode feeds both aggregations: term frequencies
    * (group by doc, term) and document frequencies (re-aggregate the tf
    * frame — its (doc, term) rows ARE the distinct doc-term incidences).
    * The docfreq side is vocabulary-sized; it broadcasts under
    * [[JoinHints]]' gate and shuffle-joins on term beyond it. The final
    * per-document top-k is a partitioned window, never a global sort.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.count()
    val tf = df
      .select(col(idCol), explode(words(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // feeds docfreq AND the join below; computed once
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(JoinHints.maybeBroadcast(dfreq), "term")
      .withColumn("tfidf",
        (col("tf") * lit(nDocs)).cast("double") / col("df").cast("double"))
    val rn = row_number().over(
      Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term").asc))
    scored.withColumn("rn", rn).filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
