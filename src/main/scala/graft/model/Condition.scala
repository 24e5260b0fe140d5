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

  /** General-category property names — the ONLY `\p{...}` spellings that
    * compile in BOTH dialects with identical semantics (Java and JS each
    * accept the short Unicode category forms; everything else Java
    * accepts is Java-only: POSIX classes like `\p{Alpha}` are ASCII-only
    * in Java and a SyntaxError in JS, `Is`/`In`/`java` prefixes are
    * Java-only, and JS long names like `\p{Letter}` don't compile in
    * Java at all — those the compile gate already rejects). */
  private val PortableCategories = Set(
    "L", "Lu", "Ll", "Lt", "Lm", "Lo", "M", "Mn", "Mc", "Me",
    "N", "Nd", "Nl", "No", "P", "Pc", "Pd", "Ps", "Pe", "Pi", "Pf", "Po",
    "S", "Sm", "Sc", "Sk", "So", "Z", "Zs", "Zl", "Zp",
    "C", "Cc", "Cf", "Co", "Cn")

  /** RegexDialectSpec's documented residuals: constructs that COMPILE
    * under Java but the reference's `new RegExp(p, "is")` would reject —
    * so a pattern slipping through the compile gate would silently run
    * with Java-only semantics the user never tested. Scans a
    * Java-COMPILABLE pattern (call after the compile gate) for:
    *
    *  - possessive quantifiers (`*+` `++` `?+` `{m,n}+`) — JS
    *    SyntaxError, Java silently never backtracks;
    *  - `\p`/`\P` property names outside the general-category set
    *    (`\p{Alpha}` is ASCII-only POSIX in Java, an error in JS), and
    *    the brace-less Java shorthand `\pL`.
    *
    * Quoted `\Q…\E` regions and character classes are skipped — their
    * contents are literal/member chars, never quantifiers. Returns the
    * offending construct for a pointed CRUD error. */
  private[model] def javaOnlyConstruct(p: String): Option[String] = {
    var i = 0
    var inClass = false
    var prevQuant = false
    while (i < p.length) {
      p.charAt(i) match {
        case '\\' if i + 1 < p.length =>
          val n = p.charAt(i + 1)
          if (n == 'Q') {
            val end = p.indexOf("\\E", i + 2)
            i = if (end < 0) p.length else end + 2
          } else if (!inClass && (n == 'p' || n == 'P')) {
            if (i + 2 >= p.length || p.charAt(i + 2) != '{')
              return Some(s"\\$n without braces — Java-only shorthand, " +
                s"the reference's JS dialect requires \\$n{...}")
            val end = p.indexOf('}', i + 3)
            val name = if (end < 0) "" else p.substring(i + 3, end)
            if (!PortableCategories.contains(name))
              return Some(s"\\$n{$name} — Java-only property name " +
                "(only general-category names like \\p{L} mean the same " +
                "in the reference's JS dialect)")
            i = end + 1
          } else i += 2
          prevQuant = false
        case ']' if inClass => inClass = false; i += 1
        case _ if inClass => i += 1
        case '[' => inClass = true; prevQuant = false; i += 1
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
    if (!raw.recordName.matches("^[a-z0-9-]{1,15}$"))
      Left(s"invalid recordName: ${raw.recordName}")
    else if (raw.inputRegex.isEmpty || !compiles(raw.inputRegex))
      Left(s"invalid inputRegex: ${raw.inputRegex}")
    else if (!compiles(raw.invertRegex.getOrElse("")))
      Left(s"invalid invertRegex")
    else if (javaOnlyConstruct(raw.inputRegex).isDefined)
      Left(s"invalid inputRegex: ${javaOnlyConstruct(raw.inputRegex).get}")
    else if (raw.invertRegex.exists(javaOnlyConstruct(_).isDefined))
      Left(s"invalid invertRegex: ${raw.invertRegex.flatMap(javaOnlyConstruct).get}")
    else if (raw.initPost.exists(_ < 0) || raw.limitCount.exists(_ < 0))
      Left("negative count")
    else Right(raw)
  }
}
