package graft.operators

import graft.SparkSpec
import graft.domain.Fixtures
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §7.4 divergence #1: the reference compiles user patterns with
  * JS `new RegExp(pat, 'ig')` (/root/reference/src/subscription.ts:203-204);
  * we compile Java regex with an embedded `(?iu)` prefix. This spec pins
  * the mapping:
  *
  *  - `(?iu)`, not `(?i)`: the JS 'i' flag performs full Unicode case
  *    folding; Java's bare (?i) folds ASCII only. (?iu) restores JS (and
  *    RE2/DuckDB-oracle) behavior.
  *  - For ASCII patterns — every DQ oracle pattern — (?i) and (?iu) are
  *    indistinguishable (property-checked), which is why the oracle suite
  *    is dialect-neutral.
  *  - Residual divergences, now FENCED at both CRUD boundaries (r19,
  *    Condition.javaOnlyConstruct in validate() AND FeedServer.setQuery):
  *    the reference compiles `new RegExp(p, 'i'/'ig')` — NO 'u' flag —
  *    so possessive quantifiers are a SyntaxError there while Java
  *    silently never backtracks, and `\p` `\P` `\Q` `\E` are Annex-B
  *    identity escapes matching the LITERAL letter while Java reads
  *    property classes / quoting. Verified empirically against V8
  *    (node, this container): `a*+`/`a++`/`a{2,3}+`/`\Qa*+\E` all throw
  *    "Nothing to repeat"; `\p{L}` matches "p{L}" and not "x";
  *    `\Qfoo\E` matches "QfooE" and not "foo"; `[\p{L}x]` is the member
  *    set {p,{,L,},x}; `a+?` stays a valid reluctant quantifier. We
  *    REJECT all three classes with pointed errors rather than mimic
  *    the literal-letter reading. Engine-internal patterns (tests
  *    below, FilterCascade's \Q mining) still exercise Java semantics
  *    directly — the fence is the admin surface, not the regex engine.
  */
class RegexDialectSpec extends SparkSpec {

  /** Deterministic generator sampling (the scalatest-scalacheck bridge is
    * not on the offline classpath). */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 8)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }

  test("(?iu) folds non-ASCII case like the JS 'i' flag; bare (?i) does not") {
    val s = spark
    import s.implicits._
    val df = Seq("ÄPFEL UND BIRNEN", "İSTANBUL").toDF("t")
    val iu = df.filter(col("t").rlike("(?iu)äpfel")).count()
    val iOnly = df.filter(col("t").rlike("(?i)äpfel")).count()
    assert(iu == 1)    // JS /äpfel/i matches "ÄPFEL..." — (?iu) reproduces it
    assert(iOnly == 0) // bare (?i) silently misses every non-ASCII match
  }

  test("filter cascade matches non-ASCII case-insensitively end to end") {
    val s = spark
    import s.implicits._
    val posts = Seq(
      Fixtures.pv("at://d/p/1", "c1", "ÄPFEL sind gut", "2024-03-01T10:00:00.000Z"),
      Fixtures.pv("at://d/p/2", "c2", "nur birnen", "2024-03-01T10:01:00.000Z"),
    )
    val conds = FilterCascade.conditionsDf(spark,
      Seq(Fixtures.cond(key = "f1", inputRegex = "äpfel")))
    val kept = FilterCascade.fanOut(posts.toDF(), conds, None)
      .select("uri").as[String].collect()
    assert(kept.toSeq == Seq("at://d/p/1"))
  }

  test("ASCII patterns behave identically under (?i) and (?iu) — the oracle dialect-neutrality property") {
    val s = spark
    import s.implicits._
    val asciiText = Gen.listOfN(12, Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '.', '-'))).map(_.mkString)
    val asciiPat = Gen.oneOf("spark", "a.c", "x+", "[a-m]{2}", "(the|a) ", "\\d+", "^[a-z]")
    forAll(Gen.listOfN(40, asciiText), asciiPat) { (texts: List[String], pat: String) =>
      val df = texts.toDF("t")
      val a = df.filter(col("t").rlike(s"(?i)$pat")).collect().map(_.getString(0)).toSeq
      val b = df.filter(col("t").rlike(s"(?iu)$pat")).collect().map(_.getString(0)).toSeq
      assert(a == b)
    }
  }

  test("CRUD fence: validate() rejects the Java-only residuals the compile gate admits") {
    import graft.model.{Condition, ConditionRaw}
    def raw(re: String, inv: Option[String] = None) = ConditionRaw(
      "k", "my-feed", "q", re, inv, None, None, None, None, None, None,
      None, None, None, None, None)
    // every rejected pattern below COMPILES under Java — the old gate
    // admitted them and the engine silently ran Java-only semantics. The
    // reference compiles `new RegExp(p, 'i'/'ig')` — NO 'u' flag — so in
    // ITS dialect possessive quantifiers are a SyntaxError, while \p/\P
    // and \Q/\E are Annex-B identity escapes matching the LITERAL
    // letter: every spelling of them is divergent, so all are fenced.
    // (The \Q...\E mining in FilterCascade is unaffected: it serves
    // conditions constructed through the library API, which does not
    // promise reference-wire compatibility the way the CRUD surface
    // does.)
    val javaOnly = Seq(
      "a*+a",        // possessive star (the divergence test below)
      "a++",         // possessive plus
      "ab?+",        // possessive optional
      "a{2,3}+",     // possessive brace quantifier
      "\\p{L}+",     // ANY \p: property class in Java, literal 'p' in non-'u' JS
      "\\P{Nd}",     // negated property: same divergence
      "\\p{Alpha}+", // POSIX class: ASCII-only in Java, literal in JS
      "\\p{IsGreek}x", // Is-prefix: Java-only reading
      "\\pL",        // brace-less shorthand
      "[\\p{L}x]",   // property inside a class: Java honors it there too
      "\\Qfoo\\E",   // Java quoting: matches "foo" here, "QfooE" there
      "\\Qa*+\\E",   // quoted quantifiers: a JS SyntaxError outright
      "(?>ab)+c",    // atomic group: "Invalid group" in JS (V8-verified)
      "(?i)foo",     // inline flags: "Invalid group" in JS
      "\\Afoo",      // Java anchor; JS matches the literal "Afoo"
      "bar\\z",      // Java anchor; JS matches "barz"
      "a\\v",        // Java vertical-whitespace CLASS; JS = only U+000B
      "\\h+",        // Java horizontal whitespace; JS literal 'h'
      "\\x{41}",     // Java U+0041; JS = a 41-fold quantified literal 'x'
      // r20, V8-verified class constructs: Java-compilable-but-divergent
      "[a[b]]",      // Java nested class {a,b}; JS set {a,[,b} + literal ']'
                     //   — JS /[a[b]]/.test("b") is false, Java matches
      "[a-c&&d]",    // Java intersection (empty set); JS literal '&' —
                     //   JS matches 'b' and '&', Java matches neither
      "[x[^y]]",     // negated nested class: same divergence family
      "\\0123",      // Java 4-char octal \0mnn = 'S'; JS reads 3 digits
                     //   (\012 = LF) then a literal '3'
    )
    javaOnly.foreach { p =>
      assert(java.util.regex.Pattern.compile(p) != null, s"$p must be Java-compilable")
      assert(Condition.validate(raw(p)).isLeft, s"$p must be rejected at the CRUD fence")
      assert(Condition.validate(raw("ok", inv = Some(p))).isLeft,
        s"$p must be rejected on invertRegex too")
    }
    // portable shapes keep flowing: reluctant quantifiers, escaped
    // metas, character classes, brace quantifiers, anchors, and the
    // `(?…` group forms BOTH dialects share
    Seq("a+?", "a*?b", "a\\++", "[*+?]+", "x{2,3}b", "^sp(ark|orts)\\b",
        "(?:a|b)+c?", "(?=x)a", "(?!y)a", "(?<=a)b", "(?<nm>a)\\k<nm>",
        "\\x41\\u0042", "\\d+\\s\\w",
        // the fence is PRECISE on class members and octal escapes:
        // escaped brackets and lone ampersands are literals in both
        // dialects, and the 2-/3-char octal forms consume the same
        // digits in both (V8-verified: \045 is '%' in JS too, \0456 is
        // "%6" in both) — only the 4-char \0mnn form diverges
        "[\\[x]", "[a\\]b]", "[a&b]", "\\045", "\\07", "\\012x", "\\0456")
      .foreach { p =>
        assert(Condition.validate(raw(p)).isRight, s"$p must remain valid")
      }
    // profileMatch halves ride the SAME gate on the load/restore path —
    // what setQuery rejects must not slip in through a stored row
    def rawPm(pm: String) = ConditionRaw(
      "k", "my-feed", "q", "ok", None, None, None, None, None, None, None,
      None, None, None, None, Some(pm))
    assert(Condition.validate(rawPm("term::\\p{L}+")).isLeft,
      "a Java-only profileMatch regex must be rejected on load/restore too")
    assert(Condition.validate(rawPm("term::[unclosed")).isLeft,
      "an uncompilable profileMatch half must be rejected")
    assert(Condition.validate(rawPm("term::sp(ark|am)")).isRight)
    // the HTTP CRUD surface enforces the same fence with the reference's
    // own result codes — pinned in FeedServerSpec's setQuery cases
  }

  test("documented divergence: Java accepts possessive quantifiers JS rejects") {
    val s = spark
    import s.implicits._
    // JS: `new RegExp("a*+")` throws SyntaxError; Java compiles it.
    // Policy (SURVEY §7.4#1): Java semantics, recorded here.
    val n = Seq("aaa", "b").toDF("t").filter(col("t").rlike("a*+a")).count()
    assert(n == 0) // possessive a*+ leaves nothing for the trailing 'a'
    assert(Seq("aaa").toDF("t").filter(col("t").rlike("a++")).count() == 1)
  }
}
