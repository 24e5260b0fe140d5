package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AhoCorasick, ContainsAnyFolded}

/** The fan-out include-prefilter engine: the Aho–Corasick automaton must
  * agree with naive contains on adversarial needle sets, the expression
  * must agree with the equivalent OR-of-contains in Spark, and the
  * 4-char Unicode→ASCII fold table the prefilter's `translate` uses must
  * be COMPLETE — proven by enumerating the whole BMP against Java's own
  * `(?iu)` matcher, not asserted from documentation. */
class ContainsAnyFoldedSpec extends SparkSpec {

  test("automaton ≡ naive multi-contains on overlapping/suffix-linked needle sets") {
    val needleSets = Seq(
      Seq("ab", "bc"), Seq("she", "he", "hers"), Seq("aaa", "aa"),
      Seq("topic7", "topic77"), Seq("spark", "vector", "rk v"),
      Seq("xy"), Seq("a b", "b a"))
    val texts = Seq("", "a", "abc", "ushers", "aa", "aaaa", "topic777",
      "vector all", "spark v", "rk vector", "a b a", "zzzzzz",
      "topic7", "xtopic77x", "sheershe")
    for (ns <- needleSets; t <- texts) {
      val ac = AhoCorasick(ns)
      assert(ac.containsAny(t) == ns.exists(t.contains),
        s"needles=$ns text='$t'")
    }
  }

  test("expression ≡ OR of contains, inside codegen, null-propagating") {
    val s = spark
    import s.implicits._
    val needles = Seq("spark", "topic7", "a b")
    val df = Seq(Some("a spark flies"), Some("topic77 here"), Some("no hit"),
      Some("x a b y"), None).toDF("t")
    val rows = df.select(
        ContainsAnyFolded(col("t"), needles).as("got"),
        needles.map(n => col("t").contains(lit(n))).reduce(_ || _).as("want"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null divergence: $r")
      if (!r.isNullAt(0)) assert(r.getBoolean(0) == r.getBoolean(1), s"$r")
    }
  }

  test("the (?iu)→ASCII fold table is COMPLETE over ALL of Unicode: exactly ſ→s K→k İ→i ı→i") {
    // every non-ASCII code point (BMP AND supplementary planes -- Java's
    // matcher folds by CODE POINT, not UTF-16 unit) that Java's (?iu)
    // single-char folding equates with an ASCII letter or digit must be in
    // the prefilter's translate table, or the literal screen could drop a
    // matchable post. The supplementary sweep adds NOTHING: Unicode simple
    // folding maps no supplementary code point into ASCII (Deseret, Warang
    // Citi, Adlam and the other cased supplementary scripts fold within
    // their own blocks) -- asserted below, not assumed.
    val expected = Map('ſ' -> 's', 'K' -> 'k',
      'İ' -> 'i', 'ı' -> 'i')
    val found = scala.collection.mutable.Map.empty[Char, Char]
    val foundSupp = scala.collection.mutable.Map.empty[Int, Char]
    for (a <- ('a' to 'z') ++ ('0' to '9')) {
      val p = java.util.regex.Pattern.compile(s"(?iu)$a")
      val m = p.matcher("")
      var c = 0x80
      while (c <= 0x10FFFF) {
        if (c < Character.MIN_SURROGATE || c > Character.MAX_SURROGATE) {
          m.reset(new String(Character.toChars(c)))
          if (m.find()) {
            if (c <= 0xFFFF) found(c.toChar) = a else foundSupp(c) = a
          }
        }
        c += 1
      }
    }
    assert(found.toMap == expected,
      s"fold table incomplete or wrong: found=$found expected=$expected")
    assert(foundSupp.isEmpty, "a supplementary code point folds into ASCII " +
      s"-- the char-based translate screen cannot map it: ${foundSupp.map {
        case (k, v) => f"U+$k%06X->$v" }}")
  }
}
