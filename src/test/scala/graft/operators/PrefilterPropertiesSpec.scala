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
