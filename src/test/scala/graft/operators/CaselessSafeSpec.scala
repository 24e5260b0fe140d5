package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Proves the [[FilterCascade.CaselessSafe]] table against Java's OWN
  * matcher — the same evidence standard as the fold-table sweep: a
  * caseless fold-isolated code point c must satisfy "(?iu)c matches
  * exactly {c} over all of Unicode", or the screen could drop a
  * matchable post. Pure JVM. */
class CaselessSafeSpec extends AnyFunSuite {

  import FilterCascade.CaselessSafe

  test("known classes: symbols/emoji/caseless scripts are safe; cased or case-targeted chars are not") {
    // safe: emoji, symbols, CJK, Arabic, Hebrew, Thai — caseless scripts
    for (cp <- Seq(0x1F9F6 /* 🧶 */, 0x2605 /* ★ */, 0x00A9 /* © */,
        0x2026 /* … */, 0x4E2D /* 中 */, 0x65E5 /* 日 */, 0x0627 /* ا */,
        0x05D0 /* א */, 0x0E01 /* ก */, 0x1F680 /* 🚀 */))
      assert(CaselessSafe.isSafe(cp), f"U+$cp%04X must be safe")
    // unsafe: every cased letter, every case-target, all of ASCII
    for (cp <- Seq(0x212A /* KELVIN */, 0x017F /* ſ */, 0x0130 /* İ */,
        0x0131 /* ı */, 0x03A3 /* Σ */, 0x03C3 /* σ */, 0x03C2 /* ς */,
        0x212B /* ANGSTROM */, 0x0410 /* А cyrillic */, 0x00DF /* ß */,
        'a'.toInt, 'Z'.toInt, '7'.toInt, ' '.toInt))
      assert(!CaselessSafe.isSafe(cp), f"U+$cp%04X must NOT be safe")
  }

  test("matcher proof: for sampled safe chars, (?iu)c matches exactly {c} over all of Unicode") {
    // the construction is reverse-map based; this validates it against
    // the matcher itself on a spread of safe chars across planes/scripts
    val sample = Seq(0x1F9F6, 0x2605, 0x00A9, 0x4E2D, 0x0627, 0x05D0,
      0x0E01, 0x1F680, 0x3042 /* あ */, 0x20AC /* € */)
    for (c <- sample) {
      assert(CaselessSafe.isSafe(c))
      val p = java.util.regex.Pattern.compile(
        s"(?iu)${java.util.regex.Pattern.quote(new String(Character.toChars(c)))}")
      val m = p.matcher("")
      var d = 0
      while (d <= 0x10FFFF) {
        if (d != c && Character.isValidCodePoint(d) &&
            !(d >= Character.MIN_SURROGATE && d <= Character.MAX_SURROGATE)) {
          m.reset(new String(Character.toChars(d)))
          assert(!m.find(),
            f"U+$d%04X matches (?iu)U+$c%04X — the char is not fold-isolated")
        }
        d += 1
      }
    }
  }

  test("extraction: caseless needles ride the screen, cased non-ASCII still splits") {
    import FilterCascade.requiredLiterals
    assert(requiredLiterals("topic1|🧶") == Some(Seq("topic1", "🧶")))
    assert(requiredLiterals("日本語") == Some(Seq("日本語")))
    // hex escapes resolve to their code point (the JSON-escaped-emoji
    // shape real feed configs carry): surrogate pairs combine, \x{...}
    // takes a code point directly, and VS-16 is caseless-safe too
    assert(requiredLiterals("knit|\\uD83E\\uDDF6") == Some(Seq("knit", "🧶")))
    assert(requiredLiterals("knit|\\x{1F9F6}") == Some(Seq("knit", "🧶")))
    assert(requiredLiterals("chess|♟\\uFE0F") == Some(Seq("chess", "♟️")))
    // ASCII hex escapes join the run like raw chars (lowercased needle)
    assert(requiredLiterals("\\u0073park") == Some(Seq("spark")))
    assert(requiredLiterals("\\u004Bpark") == Some(Seq("kpark")))
    // a CASED non-ASCII escape splits the run exactly like its raw form
    assert(requiredLiterals("\\u017Fpark") == Some(Seq("park"))) // ſ
    // malformed hex stands down (Java rejects the pattern too)
    assert(requiredLiterals("a\\uZZZZb").isEmpty)
    assert(requiredLiterals("a\\x{}b").isEmpty)
    assert(requiredLiterals("chess|♟") == Some(Seq("chess", "♟")))
    // cased non-ASCII splits the run exactly as before
    assert(requiredLiterals("Σpark") == Some(Seq("park")))
    // a branch that is ONLY a cased non-ASCII char still stands down
    assert(requiredLiterals("topic|ſ").isEmpty)
    // quantifier retraction removes the whole surrogate pair
    assert(requiredLiterals("ab🧶?cd") == Some(Seq("cd")))
  }
}
