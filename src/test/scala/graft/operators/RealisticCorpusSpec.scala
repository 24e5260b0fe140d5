package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.AhoCorasick

/** Pins the extractor-widening coverage claims on the REALISTIC
  * standing-query corpus (ScaleSmoke.realisticConditions): how many of
  * 1 000 real-world regex shapes ride the inverted-index screen, and that
  * every extracted needle set is sound on a constructed matching text per
  * template family. The corpus has 13 families since r18 (the `\Q…\E`
  * quoted-phrase family joined when quote mining landed); the r16
  * extractor accepted only families 0/3/8/10. Pure JVM — no Spark
  * session. */
class RealisticCorpusSpec extends AnyFunSuite {

  private def fold(text: String): String =
    text.map {
      case 'ſ' => 's'
      case 'K' => 'k'
      case 'İ' => 'i'
      case 'ı' => 'i'
      case c => c
    }.mkString.toLowerCase(java.util.Locale.ROOT)

  test("screened share: 1000/1000 realistic conditions extract (r16 extractor: 308)") {
    val cs = graft.ScaleSmoke.realisticConditions(1000)
    val parsed = cs.map(c => FilterCascade.requiredLiterals(c.inputRegex))
    val screenable = parsed.count(_.isDefined)
    // 1000 = 76*13 + 12, so families 0..11 have 77 members, family 12
    // has 76. ALL families extract: the emoji branch contributes its own
    // (fold-isolated) needle since the r17 caseless widening, and the
    // \Q…\E family resolves to its raw phrase since r18.
    assert(screenable == 1000, s"screened share drifted: $screenable/1000")
    // the pre-r17 extractor accepted only plain runs, \b splits, leading
    // safe flags and whole-pattern groups — families 0, 3, 8, 10, which
    // under the 13-family cycle hold 77 members each = 308 (~31%). The
    // widenings: grammar (r17), caseless-safe needles (r17), quote
    // mining (r18) take the rest to 100%.
    val r16Families = Set(0, 3, 8, 10)
    val r16Share = cs.zipWithIndex.count { case (_, j) => r16Families(j % 13) }
    assert(r16Share == 308, s"baseline-family count drifted: $r16Share")
    // every family must extract for ALL its members
    for (f <- 0 until 13) {
      val fam = cs.zipWithIndex.filter(_._2 % 13 == f)
      assert(fam.forall(p => FilterCascade.requiredLiterals(p._1.inputRegex).isDefined),
        s"family $f has non-extracting members")
    }
  }

  test("per-family soundness: a matching text always contains an extracted needle") {
    // one constructed matching text per template family, exercised
    // against the family's j=13..25 member (topic13..topic25)
    val cs = graft.ScaleSmoke.realisticConditions(26).drop(13)
    val matchingText: Map[Int, String] = Map(
      0 -> "saw topic13 today", // topic13\b
      1 -> "many topic14s!", // topic14s?\b
      2 -> "re topic16s here", // (topic15|topic16)s? — second branch
      3 -> "tag #topic16 x", // #topic16\b
      4 -> "topic17 2026 launch", // topic17 \d{4}
      5 -> "topic18 leads the text", // ^topic18
      6 -> "coloured topic19 yarn", // colou?red topic19
      7 -> "topic20ness abounds", // topic20(ly|ness)
      8 -> "a topic21 b", // \btopic21\b
      9 -> "knitting 🧶 content", // topic22|🧶 (emoji branch)
      10 -> "TOPIC23 spotted", // (?i)TOPIC23\b
      11 -> "w77 topic24 tail", // w\d+ topic24
      12 -> "ship Topic25 (C++) soon") // \Qtopic25 (c++)\E — quoted phrase
    for ((f, text) <- matchingText) {
      val c = cs(f)
      val needles = FilterCascade.requiredLiterals(c.inputRegex)
        .getOrElse(fail(s"family $f must extract: ${c.inputRegex}"))
      val p = java.util.regex.Pattern.compile(s"(?iu)${c.inputRegex}")
      assert(p.matcher(text).find(), s"family $f: '$text' must match ${c.inputRegex}")
      assert(AhoCorasick(needles).containsAny(fold(text)),
        s"family $f: needles $needles miss matching text '$text'")
    }
  }
}
