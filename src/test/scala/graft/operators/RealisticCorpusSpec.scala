package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.AhoCorasick

/** Pins the r17 widening's coverage claim on the REALISTIC standing-query
  * corpus (ScaleSmoke.realisticConditions): how many of 1 000 real-world
  * regex shapes ride the inverted-index screen, and that every extracted
  * needle set is sound on a constructed matching text per template
  * family. Pure JVM — no Spark session. */
class RealisticCorpusSpec extends AnyFunSuite {

  private def fold(text: String): String =
    text.map {
      case 'ſ' => 's'
      case 'K' => 'k'
      case 'İ' => 'i'
      case 'ı' => 'i'
      case c => c
    }.mkString.toLowerCase(java.util.Locale.ROOT)

  test("screened share: 1000/1000 realistic conditions extract (r16 shapes: 334)") {
    val cs = graft.ScaleSmoke.realisticConditions(1000)
    val parsed = cs.map(c => FilterCascade.requiredLiterals(c.inputRegex))
    val screenable = parsed.count(_.isDefined)
    // 1000 = 83*12 + 4, so families 0..3 have 84 members, 4..11 have 83.
    // ALL families extract since the caseless-safe widening: the emoji
    // branch contributes its own (fold-isolated) needle.
    assert(screenable == 1000, s"screened share drifted: $screenable/1000")
    // the pre-r17 extractor accepted only plain runs, \b splits, leading
    // safe flags and whole-pattern groups — families 0 (84), 3 (84),
    // 8 (83), 10 (83) = 334. The r17 widening is two steps: grammar
    // (334 → 917) then caseless-safe non-ASCII needles (917 → 1000).
    val r16Families = Set(0, 3, 8, 10)
    val r16Share = cs.zipWithIndex.count { case (_, j) => r16Families(j % 12) }
    assert(r16Share == 334, s"baseline-family count drifted: $r16Share")
    // every family must extract for ALL its members
    for (f <- 0 until 12) {
      val fam = cs.zipWithIndex.filter(_._2 % 12 == f)
      assert(fam.forall(p => FilterCascade.requiredLiterals(p._1.inputRegex).isDefined),
        s"family $f has non-extracting members")
    }
  }

  test("per-family soundness: a matching text always contains an extracted needle") {
    // one constructed matching text per screenable template family,
    // exercised against the family's j=12..23 member (topic12..topic23)
    val cs = graft.ScaleSmoke.realisticConditions(24).drop(12)
    val matchingText: Map[Int, String] = Map(
      0 -> "saw topic12 today", // topic12\b
      1 -> "many topic13s!", // topic13s?\b
      2 -> "re topic15s here", // (topic14|topic15)s? — second branch
      3 -> "tag #topic15 x", // #topic15\b
      4 -> "topic16 2026 launch", // topic16 \d{4}
      5 -> "topic17 leads the text", // ^topic17
      6 -> "coloured topic18 yarn", // colou?red topic18
      7 -> "topic19ness abounds", // topic19(ly|ness)
      8 -> "a topic20 b", // \btopic20\b
      9 -> "knitting \uD83E\uDDF6 content", // topic21|\uD83E\uDDF6 (emoji branch)
      10 -> "TOPIC22 spotted", // (?i)TOPIC22\b
      11 -> "w77 topic23 tail") // w\d+ topic23
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
