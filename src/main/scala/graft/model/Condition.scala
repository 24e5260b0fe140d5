package graft.model

import java.util.regex.Pattern

import scala.util.Try

/** One standing query (= one feed). Raw wire form keeps the reference's
  * type quirks (string booleans, comma-joined lists, '::' pairs —
  * /root/reference/src/db/schema.ts:22-44); `Condition` is the normalized
  * engine form. Defaults mirror the restore path
  * (/root/reference/src/subscription.ts:73-92): initPost→100,
  * limitCount→2000, missing strings→''.
  */
final case class ProfileMatch(textTerm: String, profileRegex: String)

final case class ConditionRaw(
    key: String, recordName: String, query: String, inputRegex: String,
    invertRegex: Option[String], refresh: Option[Int], lang: Option[String],
    labelDisable: Option[String], replyDisable: Option[String],
    imageOnly: Option[String], includeAltText: Option[String],
    initPost: Option[Int], pinnedPost: Option[String],
    limitCount: Option[Int], privateFeed: Option[String],
    profileMatch: Option[String])

final case class Condition(
    key: String, recordName: String, query: String, inputRegex: String,
    invertRegex: String, refresh: Int, lang: Option[String],
    labelDisable: Boolean, replyDisable: Boolean, imageOnly: String,
    includeAltText: Boolean, initPost: Int, limitCount: Int,
    pinnedPost: Seq[String], privateFeed: Seq[String],
    profileMatch: Option[ProfileMatch])

object Condition {

  /** String-bool per the reference: only the literal 'true' is true
    * (subscription.ts:284,310,315). */
  private def sbool(v: Option[String]): Boolean = v.contains("true")

  private def csv(v: Option[String]): Seq[String] =
    v.filter(_.nonEmpty).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  def normalize(raw: ConditionRaw): Condition = Condition(
    key = raw.key,
    recordName = raw.recordName,
    query = raw.query,
    inputRegex = raw.inputRegex,
    invertRegex = raw.invertRegex.getOrElse(""),
    refresh = raw.refresh.getOrElse(0),
    lang = raw.lang.filter(_.nonEmpty),
    labelDisable = sbool(raw.labelDisable),
    replyDisable = sbool(raw.replyDisable),
    imageOnly = raw.imageOnly.getOrElse(""),
    includeAltText = sbool(raw.includeAltText),
    initPost = raw.initPost.filter(_ > 0).getOrElse(100),
    limitCount = raw.limitCount.filter(_ > 0).getOrElse(2000),
    pinnedPost = csv(raw.pinnedPost),
    privateFeed = csv(raw.privateFeed),
    profileMatch = raw.profileMatch.filter(_.contains("::")).map { s =>
      val Array(term, re) = s.split("::", 2)
      ProfileMatch(term, re)
    },
  )

  /** RegexDialectSpec's documented residuals, measured against the
    * reference's ACTUAL dialect: it compiles `new RegExp(p, 'i'/'ig')`
    * (/root/reference/src/subscription.ts:203-204,
    * databaseUtil.ts:19-27) — NO 'u' flag, so Annex-B non-unicode-mode
    * JS, where `\p`, `\P`, `\Q`, `\E` are all identity escapes matching
    * the LITERAL letter. Three construct classes therefore compile under
    * Java yet can never mean the same thing on the reference's wire:
    *
    *  - possessive quantifiers (`*+` `++` `?+` `{m,n}+`) — a JS
    *    SyntaxError in every mode; Java silently never backtracks;
    *  - `\p`/`\P` in ANY form — Java reads Unicode/POSIX property
    *    classes, Annex-B JS matches a literal 'p'/'P' (there IS no
    *    portable `\p` spelling without the 'u' flag the reference never
    *    passes — `\p{L}` matches letters here and the literal text
    *    "p{L}" there);
    *  - `\Q…\E` quoting — Java-only; Annex-B JS matches literal
    *    'Q'/'E' characters, and quantifier-looking quoted content
    *    (`\Qa*+\E`) is a JS SyntaxError outright;
    *  - atomic groups and inline flags (`(?>…)`, `(?i)…`, `(?s)…`) — a
    *    JS "Invalid group" SyntaxError (possessives are sugar for
    *    atomic groups; same class);
    *  - the Java-only escapes `\A \G \R \h \H \v \V \Z \z \a \e` and
    *    braced hex `\x{…}` — all V8-verified Annex-B identity escapes
    *    matching the literal letter (`\Afoo` matches "Afoo" there; Java
    *    anchors), `\v` matches ONLY U+000B there while Java reads a
    *    vertical-whitespace CLASS including \n, and `\x{41}` parses as
    *    a 41-fold quantifier on a literal 'x' there while Java reads
    *    U+0041.
    *
    * We REJECT all of these with a pointed error rather than mimic the
    * literal-letter reading — a user typing `\p{L}` wants a property
    * class, and silently matching "p{L}" would be absurd fidelity; the
    * deliberate divergence is documented in RegexDialectSpec. Scans a
    * Java-COMPILABLE pattern (call after the compile gate); character
    * classes are skipped for quantifier purposes but `\p`/`\Q` are
    * rejected inside them too (Java honors both in classes). Returns
    * the offending construct for a pointed CRUD error. */
  private[graft] def javaOnlyConstruct(p: String): Option[String] = {
    var i = 0
    var inClass = false
    var prevQuant = false
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          val n = p.charAt(i + 1)
          if (n == 'p' || n == 'P')
            return Some(s"\\$n — Java-only property class (the " +
              "reference's JS dialect compiles without the 'u' flag and " +
              s"would match a literal '$n'); spell the class out, e.g. " +
              "[a-zA-Z] or an explicit range")
          if (n == 'Q' || n == 'E')
            return Some(s"\\$n — Java-only quoting (the reference's JS " +
              "dialect would match a literal '" + n + "'); escape each " +
              "special character individually instead")
          if ("AGRhHvVZzae".indexOf(n.toInt) >= 0)
            return Some(s"\\$n — Java-only escape (the reference's JS " +
              s"dialect would match a literal '$n'); use the portable " +
              "equivalent (^/$ anchors, [ \\t] for \\h, \\x0B for \\v, " +
              "\\x07/\\x1B for \\a/\\e)")
          if (n == 'x' && i + 2 < p.length && p.charAt(i + 2) == '{')
            return Some("\\x{...} — Java-only braced hex (the reference's " +
              "JS dialect reads it as a quantified literal 'x'); use " +
              "\\uXXXX, which both dialects share")
          // octal escapes: Java's \0n and \0nn forms consume the same
          // digits V8's Annex-B legacy octal does (verified: both read
          // \045 as '%', \0456 as "%6"), but Java's FOUR-char \0mnn form
          // (m ≤ 3) consumes three digits after the 0 where JS stops at
          // three INCLUDING it — \0123 is 'S' in Java, LF + "3" in JS
          def oct(c: Char) = c >= '0' && c <= '7'
          if (n == '0' && i + 4 < p.length && p.charAt(i + 2) <= '3' &&
              oct(p.charAt(i + 2)) && oct(p.charAt(i + 3)) && oct(p.charAt(i + 4)))
            return Some("\\0mnn — Java-only 4-digit octal escape (the " +
              "reference's JS dialect reads at most three octal digits " +
              "counting the 0, leaving the last as a literal digit); use " +
              "\\xHH or \\uHHHH, which both dialects share")
          prevQuant = false; i += 2
        case ']' if inClass => inClass = false; i += 1
        // inside a class, Java-compilable '[' opens a NESTED class
        // (union) and '&&' is intersection; the reference's JS dialect
        // reads both as literal members (V8-verified: JS [a[b]] is the
        // set {a,[,b} followed by a literal ']', so "b" alone does not
        // match; JS [a-c&&d] matches '&') — compilable-but-divergent,
        // exactly the class the fence exists to catch
        case '[' if inClass =>
          return Some("[ inside a character class — Java-only nested " +
            "class / union (the reference's JS dialect reads it as a " +
            "literal '[', changing both the member set and where the " +
            "class ends); escape it as \\[ if a literal is meant")
        case '&' if inClass && i + 1 < p.length && p.charAt(i + 1) == '&' =>
          return Some("&& inside a character class — Java-only " +
            "intersection (the reference's JS dialect reads two literal " +
            "ampersands); rewrite the intersection as an explicit range " +
            "or escape as \\&\\& if literals are meant")
        case _ if inClass => i += 1
        case '[' => inClass = true; prevQuant = false; i += 1
        case '(' =>
          // Java-only group forms: atomic groups `(?>` and inline flags
          // `(?i)`/`(?s)`/… are an "Invalid group" SyntaxError in JS.
          // The portable `(?…` forms — (?:, (?=, (?!, (?<=, (?<!,
          // (?<name> — pass (Java-compilable named groups start with a
          // letter, so the letter check is exhaustive post-compile-gate).
          if (i + 1 < p.length && p.charAt(i + 1) == '?') {
            val c2 = if (i + 2 < p.length) p.charAt(i + 2) else ' '
            val ok = c2 == ':' || c2 == '=' || c2 == '!' ||
              (c2 == '<' && i + 3 < p.length &&
                (p.charAt(i + 3) == '=' || p.charAt(i + 3) == '!' ||
                  p.charAt(i + 3).isLetter))
            if (!ok)
              return Some(s"(?$c2 — Java-only group (atomic group or " +
                "inline flags; the reference's JS dialect rejects it " +
                "as an invalid group); use (?: ) / (?= ) / (?! ) / " +
                "lookbehind / named groups, which both dialects share")
            i += 2
          } else i += 1
          prevQuant = false
        case '+' if prevQuant =>
          return Some("possessive quantifier — Java-only (the reference's " +
            "JS dialect rejects '*+', '++', '?+', '{m,n}+'); drop the " +
            "trailing '+' or use an atomic rewrite")
        case '*' | '+' | '?' => prevQuant = true; i += 1
        case '{' =>
          // only a well-formed brace quantifier makes a trailing '+'
          // possessive; a literal '{' does not
          val end = p.indexOf('}', i + 1)
          val body = if (end < 0) "" else p.substring(i + 1, end)
          if (end > 0 && body.matches("[0-9]+(,[0-9]*)?")) {
            prevQuant = true; i = end + 1
          } else { prevQuant = false; i += 1 }
        case _ => prevQuant = false; i += 1
      }
    }
    None
  }

  /** CRUD-boundary validation (P13, /root/reference/src/databaseUtil.ts:17-75):
    * record-name shape, regex compilability, non-negative ints — plus
    * (r19) rejection of the documented Java-only constructs that would
    * otherwise compile here and silently diverge from the reference's JS
    * dialect ([[javaOnlyConstruct]]). */
  def validate(raw: ConditionRaw): Either[String, ConditionRaw] = {
    def compiles(p: String): Boolean =
      p.isEmpty || Try(Pattern.compile(p, Pattern.CASE_INSENSITIVE)).isSuccess
    // both profileMatch halves compile with 'i' on the reference too
    // (databaseUtil.ts:66-69), so the same compile gate + dialect fence
    // apply — the load/restore path must not accept what setQuery rejects
    val pmHalves = raw.profileMatch.toSeq.flatMap(_.split("::", 2).toSeq)
    if (!raw.recordName.matches("^[a-z0-9-]{1,15}$"))
      Left(s"invalid recordName: ${raw.recordName}")
    else if (raw.inputRegex.isEmpty || !compiles(raw.inputRegex))
      Left(s"invalid inputRegex: ${raw.inputRegex}")
    else if (!compiles(raw.invertRegex.getOrElse("")))
      Left(s"invalid invertRegex")
    else if (!pmHalves.forall(compiles))
      Left("invalid profileMatch")
    else (javaOnlyConstruct(raw.inputRegex),
        raw.invertRegex.flatMap(javaOnlyConstruct),
        pmHalves.flatMap(javaOnlyConstruct(_)).headOption) match {
      case (Some(err), _, _) => Left(s"invalid inputRegex: $err")
      case (_, Some(err), _) => Left(s"invalid invertRegex: $err")
      case (_, _, Some(err)) => Left(s"invalid profileMatch: $err")
      case _ if raw.initPost.exists(_ < 0) || raw.limitCount.exists(_ < 0) =>
        Left("negative count")
      case _ => Right(raw)
    }
  }
}
