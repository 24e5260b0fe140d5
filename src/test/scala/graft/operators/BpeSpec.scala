package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BpeCount, BpeEval, BpeTable}

import graft.SparkSpec

/** The merges-table BPE stack, bottom-up: the encoder's merge loop
  * against hand-traced cases, the native expression inside a real plan
  * (codegen + SQL registration + null propagation), the distributed
  * trainer against an INDEPENDENT in-memory reference (sequential-scan
  * merge application vs the trainer's position-parallel rewrite — the
  * two implementations agree exactly when self-merges are excluded,
  * which is the property the exclusion exists to buy), and the
  * committed fixture pinned to the trainer's output over its stated
  * corpus (so the ns78 oracle's VALUES literal is derived, not
  * authored). */
class BpeSpec extends SparkSpec {

  test("merge loop: ranked cascade assembles a word") {
    val t = BpeTable(Seq(("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o")))
    assert(BpeEval.encode("hello", t).toSeq == Seq("hello"))
    assert(BpeEval.encode("hell", t).toSeq == Seq("hell"))
    assert(BpeEval.encode("he", t).toSeq == Seq("he"))
    assert(BpeEval.encode("eh", t).toSeq == Seq("e", "h")) // order matters
    assert(BpeEval.encode("x", t).toSeq == Seq("x"))
  }

  test("merge loop: lowest rank wins over leftmost position") {
    // (l, o) outranks (h, e)? No — (h,e) is rank 0; a word containing
    // both must merge (h,e) first even when (l,o) occurs earlier
    val t = BpeTable(Seq(("h", "e"), ("l", "o")))
    // "lohe": (l,o) at pos 0, (h,e) at pos 2 — rank 0 pair merges first,
    // then (l,o); both end merged, but the trace is rank-ordered
    assert(BpeEval.encode("lohe", t).toSeq == Seq("lo", "he"))
    val t2 = BpeTable(Seq(("o", "h"), ("l", "o")))
    // "loh": (o,h) rank 0 beats (l,o) rank 1 despite position — and
    // merging it DESTROYS the (l,o) occurrence: [l, oh]
    assert(BpeEval.encode("loh", t2).toSeq == Seq("l", "oh"))
  }

  test("merge loop: all occurrences merge in one step, non-overlapping by construction") {
    val t = BpeTable(Seq(("a", "b")))
    assert(BpeEval.encode("ababab", t).toSeq == Seq("ab", "ab", "ab"))
    assert(BpeEval.encode("aabb", t).toSeq == Seq("a", "ab", "b"))
    // self-merges are refused at table construction (the exclusion that
    // makes one step position-parallel)
    val e = intercept[IllegalArgumentException](BpeTable(Seq(("g", "g"))))
    assert(e.getMessage.contains("self-merges"))
  }

  test("count: space tokenization, empties skipped, memo stable") {
    val t = BpeTable(Seq(("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o")))
    def c(s: String) = BpeEval.count(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), t)
    assert(c("hello hello") == 2L)
    assert(c("  hello   x ") == 2L) // runs of spaces collapse
    assert(c("") == 0L)
    assert(c("HELLO") == 1L) // lowercased before encoding
    assert(c("hello") == 1L) // memo hit returns the same answer
  }

  test("expression: codegen plan + SQL registration + null propagation match direct eval") {
    val s = spark
    import s.implicits._
    val df = Seq(Some("hello hell x"), None, Some("eh")).toDF("text")
    val fixture = Seq(("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o"))
    val got = df.select(BpeCount(col("text"), fixture).as("n"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(Some(3L), None, Some(2L)))
    // the registered SQL form binds the committed fixture table
    val viaSql = spark.sql(
      "SELECT bpe_count('hello hello') AS n").as[Long].head()
    val direct = BpeEval.count(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello hello"),
      BpeTable(Bpe.Fixture))
    assert(viaSql == direct)
  }

  /** Independent reference trainer: in-memory maps, SEQUENTIAL-scan
    * merge application — a genuinely different implementation of both
    * halves (count + rewrite) from the trainer's DataFrame pipeline
    * and its position-parallel rewrite. */
  private def naiveTrain(texts: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var vocab: Map[List[String], Long] = texts
      .flatMap(_.toLowerCase.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toList -> ws.size.toLong
      }
    def applySeq(syms: List[String], l: String, r: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toList
    }
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    var done = false
    while (!done && merges.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).filter(p => p._1 != p._2).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        vocab = vocab.map { case (syms, c) =>
          applySeq(syms, best._1, best._2) -> c
        }
      }
    }
    merges.toSeq
  }

  test("trainer: distributed pipeline == independent in-memory reference") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the patter of little feet", "little by little the feet fall",
      "feet the fall the patter", "by the by the little feet",
      "pat the patter pattern", "fall of the little pattern")
    val expected = naiveTrain(texts, 24)
    val got = Bpe.train(texts.toDF("text"), "text", 24)
    assert(got == expected,
      s"trainer diverged from the reference:\n got=$got\n exp=$expected")
    // and encoding under the trained table is loop-consistent: counts
    // from the expression equal symbols from the reference's sequential
    // application of the full merge list in rank order
    val table = BpeTable(got)
    texts.flatMap(_.split(" ")).distinct.foreach { w =>
      val viaLoop = BpeEval.encode(w, table).toSeq
      var ref = w.map(_.toString).toList
      got.foreach { case (l, r) =>
        // reference applies merges in RANK order — equivalent to the
        // loop's lowest-present-rank order for a well-formed table
        // (each merge's parts exist before it in the table or are
        // single chars)
        def applySeq(syms: List[String]): List[String] = {
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.toList
        }
        ref = applySeq(ref)
      }
      assert(viaLoop == ref, s"word '$w': loop=$viaLoop rank-order=$ref")
    }
  }

  test("fixture: the committed table IS the trainer's output over sf0.001 documents") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val trained = Bpe.train(docs, "text", 48)
    assert(trained == Bpe.Fixture,
      "FixtureMerges.table drifted from train(sf0.001, 48) — regenerate " +
        "with `sbt \"runMain graft.operators.FixtureMerges\"`")
  }
}
