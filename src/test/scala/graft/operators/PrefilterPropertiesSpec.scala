package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.AhoCorasick

/** Property-based soundness of the fan-out include screen — pure JVM, no
  * Spark session needed:
  *
  *   1. For ANY pattern the conservative parser accepts, (?iu)-matching a
  *      text implies the folded text contains one of the extracted
  *      needles — the invariant that makes the screen a sound SUPERSET
  *      (a violation silently drops a matchable post, the worst failure
  *      mode this plane has).
  *   2. The Aho–Corasick automaton agrees with naive multi-contains on
  *      random needle sets over a small alphabet (maximizing overlap and
  *      suffix-link traffic).
  */
class PrefilterPropertiesSpec extends AnyFunSuite {

  /** Deterministic generator sampling (the scalatest-scalacheck bridge is
    * not on the offline classpath) — PropertiesSpec's convention. */
  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  /** The 4-char fold the production prefilter applies via translate +
    * lower (FilterCascade's FoldFrom/FoldTo). */
  private def fold(text: String): String =
    text.map {
      case 'ſ' => 's'
      case 'K' => 'k'
      case 'İ' => 'i'
      case 'ı' => 'i'
      case c => c
    }.mkString.toLowerCase(java.util.Locale.ROOT)

  // ---- generators over the parser's ACCEPTED subset plus fold-edge text

  private val runGen: Gen[String] = for {
    n <- Gen.choose(2, 6)
    cs <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.alphaLowerChar, 3 -> Gen.alphaUpperChar,
      2 -> Gen.numChar, 1 -> Gen.const(' '), 1 -> Gen.const('+')))
  } yield cs.mkString

  private val branchGen: Gen[String] = for {
    runs <- Gen.choose(1, 3)
    parts <- Gen.listOfN(runs, runGen)
    sep <- Gen.oneOf("\\b", "\\B")
  } yield parts.map(_.replace("+", "\\+")).mkString(sep)

  private val patternGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    bs <- Gen.listOfN(n, branchGen)
    core = bs.mkString("|")
    // the normalizer's accepted wrappers must preserve soundness too
    wrapped <- Gen.oneOf(core, s"($core)", s"(?:$core)", s"(?i)$core",
      s"(?iu)($core)")
  } yield wrapped

  // texts biased to collide with the patterns: words drawn from the same
  // alphabet, plus the Unicode fold-edge characters
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, Gen.frequency(
      6 -> runGen,
      1 -> Gen.oneOf("ſpark", "Kelvin", "İstanbul", "ıq", "STRASSE", "śpark")))
  } yield ws.mkString(" ")

  test("property: parser-accepted (?iu) match implies a folded-needle hit (screen soundness)") {
    var checked = 0
    for (i <- 1 to 400) {
      val pattern = sample(patternGen, i.toLong)
      FilterCascade.requiredLiterals(pattern).foreach { needles =>
        val p = java.util.regex.Pattern.compile(s"(?iu)$pattern")
        val ac = AhoCorasick(needles)
        for (j <- 1 to 8) {
          // half adversarial-random, half guaranteed-matching (embed a
          // branch of the pattern verbatim, upper-cased, mid-text)
          val base = sample(textGen, i * 1000L + j)
          val texts = Seq(base,
            base + " " + pattern.split('|').head
              .replace("\\b", "").replace("\\B", "").replace("\\+", "+")
              .replace("(?iu)", "").replace("(?i)", "")
              .replace("(?:", "").replace("(", "").replace(")", "")
              .toUpperCase(java.util.Locale.ROOT) + " tail")
          texts.foreach { t =>
            if (p.matcher(t).find()) {
              checked += 1
              assert(ac.containsAny(fold(t)),
                s"UNSOUND screen: pattern '$pattern' matches '$t' but needles " +
                  s"$needles miss the folded text '${fold(t)}'")
            }
          }
        }
      }
    }
    assert(checked > 300, s"only $checked matching cases exercised — generator drifted")
  }

  test("property: widened grammar — AST-generated patterns with derived matching texts stay sound") {
    // r17 widening: quantifiers, classes, groups (plain/?:/named), nested
    // quantified alternations, inline-flag toggles. Patterns are grown
    // from an AST that can also SAMPLE a guaranteed-matching string, so
    // every accepted pattern is exercised with texts the regex provably
    // matches — no reliance on random collisions.
    import scala.util.Random

    sealed trait Node { def pat: String; def sample(rnd: Random): String }
    final case class Lit(s: String) extends Node {
      def pat: String = s.flatMap(c =>
        if ("\\^$.|?*+()[]{}".indexOf(c.toInt) >= 0) "\\" + c else c.toString)
      def sample(rnd: Random): String = s
    }
    final case class Cat(ns: List[Node]) extends Node {
      def pat: String = ns.map(_.pat).mkString
      def sample(rnd: Random): String = ns.map(_.sample(rnd)).mkString
    }
    final case class Alt(ns: List[Node], wrap: String) extends Node {
      def pat: String = wrap + ns.map(_.pat).mkString("|") + ")"
      def sample(rnd: Random): String = ns(rnd.nextInt(ns.size)).sample(rnd)
    }
    // q must follow an ATOM (1-char literal or a parenthesized group)
    final case class Quant(n: Node, q: String, min: Int, max: Int) extends Node {
      def pat: String = n.pat + q
      def sample(rnd: Random): String =
        (0 until (min + rnd.nextInt(max - min + 1))).map(_ => n.sample(rnd)).mkString
    }
    final case class Cls(cpat: String, opts: Seq[Char]) extends Node {
      def pat: String = cpat
      def sample(rnd: Random): String = opts(rnd.nextInt(opts.size)).toString
    }
    final case class FlagNoop(f: String) extends Node {
      def pat: String = f
      def sample(rnd: Random): String = ""
    }
    // \Q…\E quoted region: a sequence of literal atoms in Java's parse
    final case class QLit(s: String) extends Node {
      def pat: String = "\\Q" + s + "\\E"
      def sample(rnd: Random): String = s
    }
    // quantifier AFTER \E binds the LAST quoted code point only
    // (\Qab\E+ ≡ ab+) — the sample must repeat just that code point
    final case class QuantLastCp(n: QLit, q: String, min: Int, max: Int) extends Node {
      def pat: String = n.pat + q
      def sample(rnd: Random): String = {
        val last = new String(Character.toChars(n.s.codePointBefore(n.s.length)))
        val reps = min + rnd.nextInt(max - min + 1)
        n.s.dropRight(last.length) + (last * reps)
      }
    }

    def word(rnd: Random): String = {
      val alpha = "abcdefgh xyz059"
      val n = 2 + rnd.nextInt(5)
      val base = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      // occasionally seed a fold-edge char (extractor must break the run,
      // fold must keep the needle live) or a caseless-safe emoji/CJK char
      // (now a literal needle char in its own right) into a literal
      rnd.nextInt(12) match {
        case 0 => base + "ſK"
        case 1 => base + "🧶"
        case 2 => base + "中文"
        case _ => base
      }
    }
    var named = 0
    def gen(rnd: Random, depth: Int): Node = {
      val r = rnd.nextInt(13)
      if (depth >= 3 || r < 4) Lit(word(rnd))
      else r match {
        case 4 | 5 => Cat(List.fill(2 + rnd.nextInt(2))(gen(rnd, depth + 1)))
        case 6 | 7 =>
          val wrap = rnd.nextInt(3) match {
            case 0 => "("
            case 1 => "(?:"
            case 2 => named += 1; s"(?<g$named>"
          }
          val alt = Alt(List.fill(2 + rnd.nextInt(2))(gen(rnd, depth + 1)), wrap)
          if (rnd.nextInt(3) == 0) { // adversarial: quantified nested group
            val (q, mn, mx) = Seq(("+", 1, 3), ("?", 0, 1), ("{1,3}", 1, 3),
              ("{2}", 2, 2))(rnd.nextInt(4))
            Quant(alt, q, mn, mx)
          } else alt
        case 8 =>
          val c = ('a' + rnd.nextInt(6)).toChar
          val (q, mn, mx) = Seq(("?", 0, 1), ("*", 0, 2), ("+", 1, 3),
            ("{2}", 2, 2), ("{2,}", 2, 4), ("{2,4}", 2, 4), ("??", 0, 1),
            ("+?", 1, 2))(rnd.nextInt(8))
          Cat(List(Lit(word(rnd)), Quant(Lit(c.toString), q, mn, mx), Lit(word(rnd))))
        case 9 =>
          val (cp, opts) = Seq(
            ("[abc]", Seq('a', 'b', 'c')), ("[a-f]", Seq('a', 'c', 'f')),
            ("\\d", Seq('0', '7')), ("\\w", Seq('q', '4')),
            (".", Seq('z', '!', ' ')))(rnd.nextInt(5))
          Cat(List(Lit(word(rnd)), Cls(cp, opts), Lit(word(rnd))))
        case 10 => Cat(List(FlagNoop(Seq("(?i)", "(?u)", "(?m)")(rnd.nextInt(3))),
          gen(rnd, depth + 1)))
        case 11 =>
          // quoted region carrying metachars (the exact-phrase paste
          // path), sometimes quantified (binds the last quoted cp only),
          // sometimes concatenated with unquoted atoms on either side
          val meta = "+?*.()[]{}|^$ \\"
          val body = word(rnd) + meta(rnd.nextInt(meta.length)) + word(rnd)
          val ql = QLit(body)
          rnd.nextInt(4) match {
            case 0 =>
              val (q, mn, mx) = Seq(("+", 1, 3), ("{2}", 2, 2),
                ("{1,3}", 1, 3))(rnd.nextInt(3))
              QuantLastCp(ql, q, mn, mx)
            case 1 => Cat(List(Lit(word(rnd)), ql))
            case 2 => Cat(List(ql, gen(rnd, depth + 1)))
            case _ => ql
          }
        case _ => Alt(List.fill(2)(gen(rnd, depth + 1)), "(")
      }
    }

    def flipCase(s: String, rnd: Random): String =
      s.map(c => if (c.isLetter && c <= 'z' && rnd.nextBoolean())
        (if (c.isUpper) c.toLower else c.toUpper) else c)

    var accepted = 0
    var checked = 0
    for (i <- 1 to 500) {
      named = 0
      val rnd = new Random(i.toLong * 7919)
      val node = gen(rnd, 0)
      val pattern = node.pat
      FilterCascade.requiredLiterals(pattern).foreach { needles =>
        accepted += 1
        assert(needles.forall { n =>
          val cps = n.codePoints().toArray
          n.nonEmpty && n == n.toLowerCase &&
            (n.length >= 2 || cps.exists(_ > 0x7f)) &&
            cps.forall(cp => (cp >= 0x20 && cp <= 0x7e) ||
              FilterCascade.CaselessSafe.isSafe(cp))
        }, s"needle contract violated for '$pattern': $needles")
        val p = java.util.regex.Pattern.compile(s"(?iu)$pattern")
        val ac = AhoCorasick(needles)
        for (j <- 1 to 6) {
          val trnd = new Random(i.toLong * 100003 + j)
          val embedded = "pre " + flipCase(node.sample(trnd), trnd) + " post"
          val random = flipCase(word(trnd) + word(trnd), trnd)
          for (t <- Seq(embedded, random)) {
            if (p.matcher(t).find()) {
              checked += 1
              assert(ac.containsAny(fold(t)),
                s"UNSOUND screen: pattern '$pattern' matches '$t' but needles " +
                  s"$needles miss the folded text '${fold(t)}'")
            }
          }
        }
      }
    }
    assert(accepted > 150, s"only $accepted/500 AST patterns extracted — coverage collapsed")
    assert(checked > 800, s"only $checked matching cases exercised — generator drifted")
  }

  test("quoted regions: \\Q…\\E shapes mine their raw phrase and match Java's parse exactly") {
    def lits(pat: String): Option[Seq[String]] = FilterCascade.requiredLiterals(pat)
    // exact extraction on the canonical shapes
    assert(lits("\\Qspark sql\\E") == Some(Seq("spark sql")))
    assert(lits("\\Qa+b(c)\\E") == Some(Seq("a+b(c)")))
    assert(lits("\\Qa|b\\E") == Some(Seq("a|b"))) // quoted '|' is NOT an alternation
    assert(lits("\\Qtail") == Some(Seq("tail"))) // \E-less: quotes to the end
    assert(lits("foo\\Q.*\\E") == Some(Seq("foo.*")))
    assert(lits("\\Qc++\\E|\\Qc#\\E") == Some(Seq("c++", "c#")))
    assert(lits("\\Qback\\slash\\E") == Some(Seq("back\\slash")))
    // quantifier after \E binds the LAST quoted char: \Qab\E+ ≡ ab+,
    // so "ab" is still the guaranteed literal
    assert(lits("\\Qab\\E+") == Some(Seq("ab")))
    assert(lits("\\Qab\\E{3}") == Some(Seq("abbb")))
    // optional last char retracts it: \Qab\E? guarantees only "a" (1-char
    // ASCII → unselective → stand down)
    assert(lits("\\Qab\\E?").isEmpty)
    assert(lits("xy\\Qab\\E?") == Some(Seq("xya"))) // prefix keeps it selective
    // empty quote vanishes; a following quantifier binds the PRIOR atom
    assert(lits("ab\\Q\\E+") == Some(Seq("ab")))
    // stray \E outside any quote: Java rejects the pattern — stand down
    assert(lits("ab\\Ecd").isEmpty)
    // \\Q is an escaped backslash + literal Q, NOT a quote opener
    assert(lits("\\\\Qab") == Some(Seq("\\qab")))
    // quoted region inside a class stays a class (breaker), brackets sanely
    assert(lits("xy[\\Qa-z\\E]") == Some(Seq("xy")))
    // quoted metachars never unbalance the group/class scans
    assert(lits("(\\Qa)b\\E|cd)x").isDefined)

    // differential vs Java: every shape above (plus supplementary-char
    // quotes) — matching texts hit a needle, and the rewrite's language
    // agrees with Java's on a probe set
    val shapes = Seq(
      "\\Qspark sql\\E" -> Seq("use Spark SQL now"),
      "\\Qa+b(c)\\E" -> Seq("xA+B(C)y"),
      "\\Qab\\E+" -> Seq("zab", "zabbb", "zaab"),
      "\\Qab\\E{2}" -> Seq("abb"),
      "\\Qtail" -> Seq("the TAIL"),
      "foo\\Q.*\\E" -> Seq("foo.*"),
      "\\Qc++\\E|\\Qc#\\E" -> Seq("i like c++", "and C# too"),
      "\\Qback\\slash\\E" -> Seq("a back\\slash b"),
      "xy\\Qab\\E?" -> Seq("xya", "xyab"),
      "ab\\Q\\E+" -> Seq("dabble"),
      "\\Q🧶+1\\E" -> Seq("yarn 🧶+1 fan"),
      "\\Q🧶\\E+" -> Seq("a🧶", "a🧶🧶"))
    for ((pat, texts) <- shapes; t <- texts) {
      val p = java.util.regex.Pattern.compile(s"(?iu)$pat")
      assert(p.matcher(t).find(), s"probe drifted: '$pat' should match '$t'")
      val needles = lits(pat).getOrElse(fail(s"'$pat' must extract"))
      assert(AhoCorasick(needles).containsAny(fold(t)),
        s"UNSOUND: '$pat' matches '$t' but needles $needles miss it")
    }
  }

  test("exhaustive differential: every <=4-token pattern vs every <=4-char text") {
    // the strongest soundness net for the extractor: enumerate ALL
    // patterns built from 4 metachar-heavy tokens, and for each one that
    // compiles AND extracts, check EVERY string over a small alphabet —
    // regex find ⇒ needle hit. No generator luck involved; subtle
    // quantifier/group/class interactions are all in the cross-product.
    // \Q / \E as bare tokens: the cross-product then covers quote
    // regions swallowing metachars, \E-less tails, quantifiers after
    // \E, stray \E (must stand down), and quotes inside classes
    val tokens = Array("a", "b", "ab", "?", "*", "+", "|", "(", ")", ".",
      "^", "$", "[ab]", "\\d", "{2}", "\\b", "\\Q", "\\E")
    val chars = Array('a', 'b', 'B', '0')
    val texts = {
      val b = Seq.newBuilder[String]
      b += ""
      var level = Seq("")
      for (_ <- 1 to 4) {
        level = level.flatMap(s => chars.map(c => s + c))
        b ++= level
      }
      b.result()
    }
    var accepted = 0
    var checkedPairs = 0L
    def walk(depth: Int, pat: String): Unit = {
      if (depth > 0) tokens.foreach(t => walk(depth - 1, pat + t))
      if (pat.nonEmpty) {
        FilterCascade.requiredLiterals(pat).foreach { needles =>
          val p =
            try Some(java.util.regex.Pattern.compile(s"(?iu)$pat"))
            catch { case _: Exception => None }
          p.foreach { rx =>
            accepted += 1
            val ac = AhoCorasick(needles)
            val m = rx.matcher("")
            texts.foreach { t =>
              if (m.reset(t).find()) {
                checkedPairs += 1
                assert(ac.containsAny(fold(t)),
                  s"UNSOUND: '$pat' matches '$t' but needles $needles miss it")
              }
            }
          }
        }
      }
    }
    walk(3, "") // 16^1 + 16^2 + 16^3 = 4 368 patterns
    // one extra layer for the pure-literal-ish prefixes (full 16^4 is
    // ~70 k patterns x 341 texts — too slow for the suite; the 3-token
    // universe already crosses every pairwise construct interaction)
    tokens.take(8).foreach(t0 => walk(3, t0))
    assert(accepted > 400, s"only $accepted patterns extracted — coverage collapsed")
    assert(checkedPairs > 10000L, s"only $checkedPairs matching pairs checked")
  }

  test("fuzz: requiredLiterals never throws and stays sound on random metachar soup") {
    val alphabet = "ab01?*+|()[]{}.^$\\dwbQEksu-:<>=!,ſ🧶 "
    var soundChecks = 0
    for (i <- 1 to 10000) {
      val rnd = new scala.util.Random(i * 2654435761L)
      val n = 1 + rnd.nextInt(12)
      val pat = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val lits = FilterCascade.requiredLiterals(pat) // must never throw
      lits.foreach { needles =>
        val rx =
          try Some(java.util.regex.Pattern.compile(s"(?iu)$pat"))
          catch { case _: Exception => None }
        rx.foreach { p =>
          val ac = AhoCorasick(needles)
          val m = p.matcher("")
          for (j <- 1 to 20) {
            val trnd = new scala.util.Random(i * 100000L + j)
            val t = (0 until trnd.nextInt(10)).map(_ =>
              "abB01 🧶ſ" (trnd.nextInt(8))).mkString
            if (m.reset(t).find()) {
              soundChecks += 1
              assert(ac.containsAny(fold(t)),
                s"UNSOUND: '$pat' matches '$t' but needles $needles miss it")
            }
          }
        }
      }
    }
    // random soup rarely both extracts and matches random text — the
    // real assertions here are never-throws and the fired sound-checks
    assert(soundChecks > 40, s"only $soundChecks sound-checks fired")
  }

  test("property: automaton == naive multi-contains on random overlapping needle sets") {
    val needleGen = for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, for {
        l <- Gen.choose(1, 4)
        cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws
    val hayGen = for {
      l <- Gen.choose(0, 24)
      cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c', 'd'))
    } yield cs.mkString
    for (i <- 1 to 300) {
      val needles = sample(needleGen, i.toLong)
      val ac = AhoCorasick(needles)
      for (j <- 1 to 12) {
        val hay = sample(hayGen, i * 500L + j)
        assert(ac.containsAny(hay) == needles.exists(hay.contains),
          s"needles=$needles hay='$hay'")
      }
    }
  }
}
