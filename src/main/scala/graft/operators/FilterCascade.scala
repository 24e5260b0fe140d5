package graft.operators

import graft.model.Condition
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The per-condition filter cascade (/root/reference/src/subscription.ts:
  * 271-350, operators P3-P10 in SURVEY.md §2.2) as ONE composed Column
  * predicate over PostView-shaped rows — a single codegen'd stage, no UDFs.
  *
  * Regex dialect: Java with an embedded (?iu) flag (SURVEY §7.4#1). The
  * reference compiles `new RegExp(pat, 'ig')`, and the JS 'i' flag does
  * FULL Unicode case folding; Java's (?i) alone folds ASCII only, so the
  * faithful mapping is CASE_INSENSITIVE|UNICODE_CASE — which also agrees
  * with RE2's Unicode-aware (?i) (the oracle engine). Remaining accepted
  * divergences are documented in RegexDialectSpec.
  * Label quirk divergence (§7.4#3): missing `labels` is treated as
  * unlabeled (kept), unlike the reference which drops undefined labels.
  */
object FilterCascade {

  private def ci(pat: String): String = s"(?iu)$pat"

  /** Search text (P5): record.text, plus '\n'-joined image ALTs when the
    * condition opts in (subscription.ts:284-288). */
  def searchText(includeAltText: Boolean): Column = {
    val text = coalesce(col("record.text"), lit(""))
    if (!includeAltText) text
    else concat_ws("\n",
      text,
      array_join(
        filter(transform(coalesce(col("record.embed.images"), array()), i => i("alt")),
          a => a.isNotNull),
        "\n"))
  }

  private def imageCount: Column =
    size(coalesce(col("record.embed.images"), array()))

  /** P3 — include-regex match count > 0 on the search text. */
  def includeRegex(st: Column, pat: String): Column =
    regexp_count(st, lit(ci(pat))) > 0

  /** P4 — exclude regex; empty pattern disables (subscription.ts:297-299). */
  def excludeRegex(st: Column, pat: String): Column =
    if (pat.isEmpty) lit(true) else !st.rlike(ci(pat))

  /** P6 — image presence 3-state enum (subscription.ts:301-307). */
  def imageFilter(mode: String): Column = mode match {
    case "imageOnly" => imageCount > 0
    case "textOnly"  => imageCount === 0
    case _           => lit(true)
  }

  /** P7 — label filter (missing labels = unlabeled, divergence §7.4#3). */
  def labelFilter(labelDisable: Boolean): Column =
    if (!labelDisable) lit(true)
    else size(coalesce(col("labels"), array())) === 0

  /** P8 — reply filter. */
  def replyFilter(replyDisable: Boolean): Column =
    if (!replyDisable) lit(true) else col("record.reply").isNull

  /** P10 — language membership (pushed into the source in the reference;
    * a post-filter here, a DSv2 pushdown on a real search source). */
  def langFilter(lang: Option[String]): Column =
    lang.map(l => array_contains(coalesce(col("record.langs"), array()), l))
      .getOrElse(lit(true))

  /** P9 — profileMatch conditional two-regex (subscription.ts:319-350):
    * when the text matches ONLY the narrow term (m1>0 and m0==m1), the
    * author's profile text must match the profile regex. `profileText` is
    * the joined displayName+' '+description column (null when the profile
    * dimension had no row). */
  def profileMatchFilter(st: Column, c: Condition, profileText: Column): Column =
    c.profileMatch match {
      case None => lit(true)
      case Some(pm) =>
        val m0 = regexp_count(st, lit(ci(c.inputRegex)))
        val m1 = regexp_count(st, lit(ci(pm.textTerm)))
        !(m1 > 0 && (m0 - m1) === 0) ||
          coalesce(profileText, lit("")).rlike(ci(pm.profileRegex))
    }

  /** The full composed predicate for one condition. */
  def predicate(c: Condition, profileText: Column): Column = {
    val st = searchText(c.includeAltText)
    includeRegex(st, c.inputRegex) &&
      excludeRegex(st, c.invertRegex) &&
      imageFilter(c.imageOnly) &&
      labelFilter(c.labelDisable) &&
      replyFilter(c.replyDisable) &&
      langFilter(c.lang) &&
      profileMatchFilter(st, c, profileText)
  }

  /** Apply one condition to a PostView DataFrame, joining the (small)
    * profile dimension via broadcast only when profileMatch needs it, and
    * stamping the feed key. Output: stored-Post-shaped rows. */
  def apply(posts: DataFrame, c: Condition, profiles: Option[DataFrame]): DataFrame = {
    val needsProfiles = c.profileMatch.isDefined && profiles.isDefined
    val withProfile =
      if (!needsProfiles) posts.withColumn("__profile_text", lit(null).cast("string"))
      else {
        val p = profiles.get.select(col("did").as("__pdid"),
          concat_ws(" ", coalesce(col("displayName"), lit("")),
            coalesce(col("description"), lit(""))).as("__profile_text"))
        posts.join(broadcast(p), posts("author.did") === col("__pdid"), "left")
          .drop("__pdid")
      }
    withProfile
      .filter(predicate(c, col("__profile_text")))
      .select(
        col("uri"),
        lit(c.key).as("key"),
        col("cid"),
        col("record.reply.parent.uri").as("replyParent"),
        col("record.reply.root.uri").as("replyRoot"),
        to_timestamp(col("record.createdAt")).as("indexedAt"))
  }

  /** Regex metacharacters a literal run may not contain (and '{' / '}',
    * whose quantifier-vs-literal status depends on what follows). */
  private val RegexMeta = "[](){}*+?.^$|\\"

  /** A leading inline-flag group with only screen-invisible flags — see
    * the normalizer in [[requiredLiterals]]. Compiled once: the
    * normalizer runs per condition per micro-batch drain. */
  private val LeadingSafeFlags = "^\\(\\?[iumsdU]+\\)".r

  /** REQUIRED literals of one include regex, one per top-level
    * alternation branch — strings the regex cannot match a text without
    * containing (case-insensitively). Conservative by construction: the
    * pattern must be an alternation of plain sequences of literal chars
    * and zero-width `\b`/`\B` (which split a branch into runs — each run
    * is still individually required; the longest is kept). Escaped
    * punctuation is literal; escaped letters/digits (classes `\d`,
    * backrefs `\1`, ...) and any metacharacter reject the whole
    * extraction — a screen that might drop a matchable post is worse
    * than no screen. Non-ASCII literal chars also split runs: only
    * ASCII needles are sound under the 4-char fold below (Greek final
    * sigma and friends fold within Unicode, not into ASCII). Branches
    * whose longest run is shorter than 2 chars reject too (a 1-char
    * needle keeps ~every post — the screen would be pure overhead). */
  private[graft] def requiredLiterals(pattern: String): Option[Seq[String]] = {
    // normalize the two super-common wrappers before the strict parse:
    //  - a LEADING inline-flag group `(?idmsux...)` is dropped — the
    //    screen matches case-insensitively always, which is a superset of
    //    every flag combination (a case-SENSITIVE pattern's matches are a
    //    subset of the CI matches), and the accepted subset contains no
    //    ^ $ . for m/s to change;
    //  - a group wrapping the WHOLE pattern (`(a|b)`, `(?:a|b)`) unwraps —
    //    capturing-group numbering is irrelevant because backreferences
    //    reject below. Bounded recursion; `(a)(b)`/`(a|b)+` do NOT unwrap
    //    (the close paren is not the final char) and reject downstream.
    var p = pattern
    var normalizing = true
    var depth = 0
    while (normalizing && depth < 5) {
      depth += 1
      normalizing = false
      // only flags that cannot change the accepted subset's semantics:
      // i/u (case — the screen is CI-always, a superset), m/s/d (anchors
      // and dot, neither of which the parser admits), U (\w-class
      // unicode, no classes admitted). NOT 'x' (COMMENTS makes literal
      // whitespace vanish from the pattern — a needle with a space would
      // go unsound) and nothing unknown.
      val flags = if (p.startsWith("(?")) LeadingSafeFlags.findPrefixOf(p) else None
      if (flags.isDefined) { p = p.substring(flags.get.length); normalizing = true }
      else if (p.length >= 2 && p.charAt(0) == '(' && p.last == ')') {
        // whole-pattern wrap iff the opening paren's match is the LAST char
        var level = 0
        var whole = true
        var i = 0
        while (i < p.length - 1 && whole) {
          p.charAt(i) match {
            case '\\' => i += 1 // skip the escaped char
            case '(' => level += 1
            case ')' => level -= 1; if (level == 0) whole = false
            case _ =>
          }
          i += 1
        }
        if (whole && level == 1) {
          val inner = p.substring(1, p.length - 1)
          val body =
            if (inner.startsWith("?:")) Some(inner.substring(2))
            else if (inner.startsWith("?")) None // lookaround/named/atomic: reject
            else Some(inner)
          body match {
            case Some(b) => p = b; normalizing = true
            case None => return None
          }
        }
      }
    }
    val pattern2 = p
    val branches = Seq.newBuilder[String]
    var runs = List.empty[String]
    val cur = new StringBuilder
    def endRun(): Unit = { if (cur.nonEmpty) runs ::= cur.toString; cur.clear() }
    def endBranch(): Boolean = {
      endRun()
      val best = runs.sortBy(-_.length).headOption.getOrElse("")
      runs = Nil
      if (best.length < 2) false
      else { branches += best.toLowerCase(java.util.Locale.ROOT); true }
    }
    var i = 0
    val n = pattern2.length
    while (i < n) {
      val c = pattern2.charAt(i)
      if (c == '\\') {
        if (i + 1 >= n) return None
        val e = pattern2.charAt(i + 1)
        if (e == 'b' || e == 'B') endRun() // zero-width: splits the run
        else if (e.isLetterOrDigit) return None // class / backref / \uXXXX
        else if (e < 0x20 || e > 0x7e) endRun() // ASCII-only needles (fold)
        else cur.append(e) // escaped ASCII punctuation is a literal char
        i += 2
      } else if (c == '|') {
        if (!endBranch()) return None
        i += 1
      } else if (RegexMeta.indexOf(c) >= 0) {
        return None
      } else {
        if (c < 0x20 || c > 0x7e) endRun() else cur.append(c)
        i += 1
      }
    }
    if (!endBranch()) return None
    Some(branches.result())
  }

  /** The non-ASCII characters Java's `(?iu)` single-character folding
    * equates with an ASCII letter — mapped to that letter BEFORE
    * lowercasing (İ first: `toLowerCase` would explode it into i +
    * combining dot and break substring adjacency). Exhaustively proven
    * complete over the BMP by ContainsAnyFoldedSpec's fold-table test. */
  private val FoldFrom = "ſKİı" // ſ KELVIN-K İ ı
  private val FoldTo = "skii"

  /** OR-of-includes PREFILTER for [[fanOut]]: every cascade branch
    * requires its condition's include regex to match, so a post matching
    * NONE of them cannot survive any branch — it can skip the width-way
    * nested loop entirely. The screen is ONE Aho–Corasick pass per post
    * ([[org.apache.spark.sql.graft.ContainsAnyFolded]]) over the
    * lowercased (fold-mapped) ALT-EXTENDED text, with one REQUIRED
    * literal per include-regex branch as the needles — O(|text|) per
    * post whatever the width, where both the pair loop and a regex
    * alternation pay O(|text|·width) (the alternation form was measured
    * barely ahead of the loop it screened — SCALE.md fanout section).
    * Always a SUPERSET filter: alt-extended text for everyone, and a
    * needle hit only admits the post into the loop, never past it.
    *
    * None (fan-out unchanged) when any condition defeats the
    * extraction ([[requiredLiterals]]) — soundness over coverage. */
  def includePrefilter(cs: Seq[Condition]): Option[Column] = {
    if (cs.isEmpty) return None
    val perCond = cs.map(c => requiredLiterals(c.inputRegex))
    if (perCond.exists(_.isEmpty)) None
    else {
      val needles = perCond.flatMap(_.get).distinct
      val folded = lower(translate(
        searchText(includeAltText = true), FoldFrom, FoldTo))
      Some(org.apache.spark.sql.graft.ContainsAnyFolded(folded, needles))
    }
  }

  /** [[fanOut]] with the include screen applied PER PARTITION of the
    * condition set, not all-or-nothing: conditions whose include regex
    * yields required literals fan out over the screened post stream;
    * the (typically few) unscreenable ones fan out over the full stream,
    * and the two result sets union. One unscreenable condition then
    * costs ONE extra full-stream branch instead of silently disabling
    * the screen for the other 999 — the mixed standing-query set a real
    * deployment has. Row-equivalence with the unscreened fan-out is
    * spec-pinned (FilterCascadeSpec). */
  def fanOutScreened(spark: org.apache.spark.sql.SparkSession, posts: DataFrame,
      cs: Seq[Condition], profiles: Option[DataFrame]): DataFrame = {
    // parse each include ONCE per drain (width × one driver-side parse,
    // not two) and thread the literals through to the index build
    val parsed = cs.map(c => c -> requiredLiterals(c.inputRegex))
    val (screenable, rest) = parsed.partition(_._2.isDefined)
    if (screenable.isEmpty)
      fanOut(posts, conditionsDf(spark, cs), profiles)
    else {
      val screened = fanOutIndexed(spark, posts,
        screenable.map { case (c, lits) => (c, lits.get) }, profiles)
      if (rest.isEmpty) screened
      else screened.unionByName(
        fanOut(posts, conditionsDf(spark, rest.map(_._1)), profiles))
    }
  }

  /** The INVERTED-INDEX fan-out for a fully screenable condition set:
    * one [[org.apache.spark.sql.graft.MatchedConditionsFolded]] scan per
    * post emits the ordinals of the conditions whose required literal
    * the post contains; the explode + broadcast-HASH-join on that
    * ordinal then evaluates the full cascade predicate only for the
    * CANDIDATE pairs. Total work is |posts| + |candidate pairs| in every
    * match regime — the crossJoin form pays |posts| × width even when a
    * post can only ever match a handful of feeds (SCALE.md fanout
    * section: dense width-1000 race 1.1 s vs 9.9 s). Still a superset
    * funnel: a needle hit only ADMITS a pair to the predicate. */
  private def fanOutIndexed(spark: org.apache.spark.sql.SparkSession,
      posts: DataFrame, condLits: Seq[(Condition, Seq[String])],
      profiles: Option[DataFrame]): DataFrame = {
    import spark.implicits._
    val cs = condLits.map(_._1)
    val needleTags = condLits.zipWithIndex.flatMap { case ((_, lits), i) =>
      lits.map(n => (n, i))
    }.distinct
    val folded = lower(translate(
      searchText(includeAltText = true), FoldFrom, FoldTo))
    val condIdx = cs.zipWithIndex.map { case (c, i) =>
      (i, c.key, c.inputRegex, c.invertRegex, c.lang.orNull,
        c.labelDisable, c.replyDisable, c.imageOnly, c.includeAltText,
        c.profileMatch.map(_.textTerm).orNull,
        c.profileMatch.map(_.profileRegex).orNull)
    }.toDF("__cidx", "__ckey", "__in", "__out", "__lang", "__nolabel",
      "__noreply", "__img", "__alt", "__pterm", "__pre")
    // profiles join AFTER the candidate explode: the screen has already
    // dropped the no-candidate posts, so the (broadcast, per-row-cheap)
    // profile probe runs on candidates only — in the sparse regime that
    // is near-zero rows instead of the whole stream
    val candidates = withProfileText(
      posts.withColumn("__cidx", explode(
        org.apache.spark.sql.graft.MatchedConditionsFolded(
          folded, needleTags, cs.size)))
        .join(broadcast(condIdx), "__cidx"),
      profiles)
    cascadeFinish(candidates)
  }

  /** Scale-out fan-out: evaluate ALL conditions in one distributed job —
    * posts × broadcast(conditions) with column-typed regex patterns
    * (SURVEY §7.4#6). One pass over the post stream regardless of the
    * number of standing feeds; no driver loop over conditions.
    *
    * `prefilter` (from [[includePrefilter]], when the caller holds the
    * driver-side condition list) screens posts BEFORE the nested loop.
    */
  def fanOut(posts: DataFrame, conditions: DataFrame, profiles: Option[DataFrame],
      prefilter: Option[Column] = None): DataFrame = {
    val screened = prefilter.fold(posts)(posts.filter)
    val joined = withProfileText(screened, profiles)
      .crossJoin(broadcast(conditions.select(
        col("key").as("__ckey"), col("inputRegex").as("__in"),
        col("invertRegex").as("__out"), col("lang").as("__lang"),
        col("labelDisable").as("__nolabel"), col("replyDisable").as("__noreply"),
        col("imageOnly").as("__img"), col("includeAltText").as("__alt"),
        col("profileTerm").as("__pterm"), col("profileRegex").as("__pre"))))
    cascadeFinish(joined)
  }

  /** Posts plus the broadcast-joined `__profile_text` column (null when
    * no profile dimension is wired in) — shared by both fan-out forms. */
  private def withProfileText(posts: DataFrame,
      profiles: Option[DataFrame]): DataFrame = profiles match {
    case Some(pr) =>
      val p = pr.select(col("did").as("__pdid"),
        concat_ws(" ", coalesce(col("displayName"), lit("")),
          coalesce(col("description"), lit(""))).as("__profile_text"))
      posts.join(broadcast(p), posts("author.did") === col("__pdid"), "left")
        .drop("__pdid")
    case None => posts.withColumn("__profile_text", lit(null).cast("string"))
  }

  /** The cascade predicate + stored-Post projection over a frame carrying
    * the post columns, `__profile_text`, and the `__`-renamed condition
    * columns — however the condition rows were joined in (crossJoin or
    * the inverted-index candidate join). */
  private def cascadeFinish(joined: DataFrame): DataFrame = {
    val stBase = coalesce(col("record.text"), lit(""))
    val stAlt = concat_ws("\n", stBase,
      array_join(filter(transform(coalesce(col("record.embed.images"), array()),
        i => i("alt")), a => a.isNotNull), "\n"))
    val st = when(col("__alt"), stAlt).otherwise(stBase)
    val ciCol = (p: Column) => concat(lit("(?iu)"), p)
    // COLUMN-typed patterns (the broadcast conditions side) take the
    // cached-regex expressions: stock RLike compiles a non-literal pattern
    // per ROW, and RegExpCount's single-entry lastRegex cache misses on
    // every evaluation because the crossJoin sweeps the condition side
    // between consecutive rows — at width (1 000 standing feeds) the
    // compile cost dominated the whole drain (SCALE.md fanout section).
    // The include test is EXISTENCE, so it takes the find-first form
    // directly (what RegexCountToRLike rewrites the literal path to);
    // the profile gate needs the actual counts.
    import org.apache.spark.sql.graft.{RegexpCountCached, RLikeCached}
    // the match COUNTS exist only for the profile gate. m1's pattern is
    // DELIBERATELY not coalesced: a null __pterm must null-propagate
    // through the count (zero work) rather than default to "" — with
    // coalesce(pterm, ''), every no-profileMatch pair that reached the
    // gate count-walked its whole text against the bare zero-width
    // '(?iu)' pattern (one find() per character), measured 28.7 → 10.3 s
    // on the 200 k × 1000 width race (SCALE.md fanout section). The
    // isNull disjunct below already owns the verdict for those rows, so
    // the null m1 is never read.
    val m0 = RegexpCountCached(st, ciCol(col("__in")))
    val m1 = RegexpCountCached(st, ciCol(col("__pterm")))
    val pred =
      RLikeCached(st, ciCol(col("__in"))) &&
        (col("__out") === "" || !RLikeCached(st, ciCol(col("__out")))) &&
        (when(col("__img") === "imageOnly", imageCount > 0)
          .when(col("__img") === "textOnly", imageCount === 0)
          .otherwise(lit(true))) &&
        (!col("__nolabel") || size(coalesce(col("labels"), array())) === 0) &&
        (!col("__noreply") || col("record.reply").isNull) &&
        (col("__lang").isNull ||
          array_contains(coalesce(col("record.langs"), array()), col("__lang"))) &&
        (col("__pterm").isNull ||
          !(m1 > 0 && (m0 - m1) === 0) ||
          RLikeCached(coalesce(col("__profile_text"), lit("")), ciCol(col("__pre"))))

    joined.filter(pred).select(
      col("uri"),
      col("__ckey").as("key"),
      col("cid"),
      col("record.reply.parent.uri").as("replyParent"),
      col("record.reply.root.uri").as("replyRoot"),
      to_timestamp(col("record.createdAt")).as("indexedAt"))
  }

  /** Conditions as the DataFrame shape fanOut expects. */
  def conditionsDf(spark: org.apache.spark.sql.SparkSession, cs: Seq[Condition]): DataFrame = {
    import spark.implicits._
    cs.map(c => (c.key, c.inputRegex, c.invertRegex, c.lang.orNull,
        c.labelDisable, c.replyDisable, c.imageOnly, c.includeAltText,
        c.profileMatch.map(_.textTerm).orNull, c.profileMatch.map(_.profileRegex).orNull))
      .toDF("key", "inputRegex", "invertRegex", "lang", "labelDisable",
        "replyDisable", "imageOnly", "includeAltText", "profileTerm", "profileRegex")
  }
}
