package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-table training over a corpus — the tokenizer-fitting step
  * of a training-data pipeline (the counts its budget math runs on are
  * only as real as the merges table behind them; reference behavior:
  * the token-budget fields in /root/reference/src/algos/starrysky.ts).
  *
  * Shape, for the 100 TB argument: the iterated state is the DISTINCT
  * WORD vocabulary with corpus frequencies — one corpus-sized
  * aggregation up front (partial-agg compressed, the same scan every
  * tf consumer pays), then every merge iteration runs over
  * vocabulary-sized data only, which is MBs at any corpus scale (heaps
  * more words exist in a 100 TB corpus, but vocabulary grows ~log in
  * corpus size, not linearly). Driver state per iteration is exactly
  * ONE row (the argmax pair), `numMerges` rows total; the corpus is
  * never collected. The trained table then ships to executors as a
  * constant inside [[org.apache.spark.sql.graft.BpeCount]] — token
  * counting itself is a scan, no join, no shuffle.
  *
  * Determinism: the argmax tie-breaks on (count DESC, left ASC, right
  * ASC), so the same corpus always yields the same table — what lets
  * the ns78 oracle embed the trained fixture as a literal and the spec
  * pin `Fixture == train(sf0.001 documents)`.
  *
  * Self-merges (l == r) are EXCLUDED from candidates: allowing them
  * makes one merge step order-dependent ("ggg" merges differently
  * left-to-right vs right-to-left), while with l ≠ r occurrences can
  * never overlap and a merge step is position-parallel — the property
  * the SQL oracle's per-position replay and the expression's one-pass
  * rewrite both rely on. The cost is real but marginal (a run of k
  * identical chars stays k symbols until a neighboring merge breaks
  * it); GPT-2's own table is dominated by non-self pairs for the same
  * frequency reasons.
  */
object Bpe {

  /** The committed fixture: `train(sf0.001 documents, 48)` — derived
    * once from the smallest driver-generated corpus and pinned by
    * BpeSpec (which re-trains and compares), so the constant is
    * auditable, not authored. ns78 embeds it on both engines. */
  val Fixture: Seq[(String, String)] = FixtureMerges.table

  /** Train `numMerges` BPE merges over `textCol` of `df`.
    *
    * Returns the ranked merge list (rank = position). Each iteration:
    * pair-count the current vocabulary tokenization (weighted by word
    * frequency), take the deterministic argmax to the driver (1 row),
    * rewrite the vocabulary with the chosen merge. The vocabulary
    * DataFrame is cached per iteration and unpersisted after the next
    * materializes — peak footprint is two vocabulary-sized frames. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._

    // corpus pass: distinct words + frequencies (the only corpus-sized
    // job), then chars as the starting tokenization. localCheckpoint
    // (not cache): each iteration derives the next vocabulary FROM the
    // previous one, and an uncut lineage accumulates 48 nested lambda
    // rewrites whose Catalyst analysis cost grows superlinearly — by
    // iteration ~30 the driver spends minutes ANALYZING, not running.
    // Truncating per iteration keeps every plan two nodes deep; the
    // checkpointed data is vocabulary-sized (MBs at any corpus scale).
    var vocab: DataFrame = df
      .select(explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(split(col("w"), "").as("syms"), col("cnt"))
      .localCheckpoint(true)

    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var it = 0
    while (!done && it < numMerges) {
      // adjacent pairs weighted by word frequency; l != r excluded (see
      // the scaladoc). transform+filter stays in-row; the only exchange
      // is the pair-keyed partial aggregation, vocabulary-sized. The
      // size-2 filter keeps fully-merged words out (no pairs to emit)
      // AND keeps sequence() ascending — ANSI mode is on, and an
      // out-of-bounds syms[] would throw, not null out.
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "filter(transform(sequence(1, size(syms) - 1), " +
            "i -> struct(syms[i - 1] as l, syms[i] as r)), p -> p.l != p.r)"))
          .as("p"), col("cnt"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      best.headOption match {
        case None => done = true // vocabulary fully merged
        case Some((l, r, _)) =>
          merges += ((l, r))
          // rewrite: merge all occurrences of (l, r); with l != r they
          // cannot overlap, so the per-position form is exact — emit
          // the merged symbol at each left position, drop each right
          // position, keep the rest
          // 1-based loop index i, current symbol syms[i - 1] (0-based
          // bracket indexing); neighbor peeks ride inner CASEs so the
          // guarded index is provably in range before the bracket
          // evaluates (ANSI throws on out-of-bounds, and AND operand
          // order is the optimizer's to rearrange — CASE is not)
          def sqlStr(s: String) = "'" + s.replace("'", "''") + "'"
          val L = sqlStr(l)
          val R = sqlStr(r)
          val next = vocab
            .select(expr(
              s"""filter(transform(sequence(1, size(syms)),
                 |  i -> CASE
                 |    WHEN syms[i - 1] = $L AND
                 |      (CASE WHEN i < size(syms) THEN syms[i]
                 |            ELSE CAST(NULL AS STRING) END) = $R
                 |      THEN ${sqlStr(l + r)}
                 |    WHEN syms[i - 1] = $R AND
                 |      (CASE WHEN i > 1 THEN syms[i - 2]
                 |            ELSE CAST(NULL AS STRING) END) = $L
                 |      THEN CAST(NULL AS STRING)
                 |    ELSE syms[i - 1] END), x -> x IS NOT NULL)""".stripMargin)
              .as("syms"), col("cnt"))
            .localCheckpoint(true) // eager: materialized + lineage cut
          vocab.unpersist()
          vocab = next
      }
      it += 1
    }
    vocab.unpersist()
    merges.result()
  }

  /** Per-document BPE token counts under a merges table — the ns78
    * entry body and the production budget column. A pure scan:
    * the table rides the expression, nothing shuffles. */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)] = Fixture): DataFrame =
    docs.select(col(idCol),
      org.apache.spark.sql.graft.BpeCount(col(textCol), merges)
        .as("n_bpe_tokens"))
}
