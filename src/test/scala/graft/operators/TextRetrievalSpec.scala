package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** sourceOverlap (corpus-pair audit) and bm25Rank (sparse retrieval):
  * value-level checks against independent hand computations, plus the
  * determinism-under-repartitioning guarantee every catalog operator
  * carries. */
class TextRetrievalSpec extends SparkSpec {

  test("sourceOverlap computes pairwise distinct-ngram jaccard; zero-overlap pairs drop") {
    val s = spark
    import s.implicits._
    // a: trigrams {x y z, y z w}; b: {x y z, y z q}; c: {p q r}
    val df = Seq(
      ("a", "x y z w"), ("b", "x y z q"), ("c", "p q r"),
      ("a", "x y z w")) // duplicate doc must not change DISTINCT gram sets
      .toDF("src", "text")
    val got = TextAnalysis.sourceOverlap(df, "src", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // shared(a,b) = {x y z} → 1; union = 3 → jac 1/3; c overlaps nothing
    assert(got.toSeq == Seq(("a", "b", 1L, 1.0 / 3.0)))
  }

  test("sourceOverlap excludes null sources instead of crashing on them") {
    val s = spark
    import s.implicits._
    // the collect_set shape silently skipped null group keys; the bitmask
    // shape must do the same (null gets no bit; its rows' null mask
    // contribution is ignored by bit_or) — regression: the sorted-name
    // bit assignment NPE'd on a null in the distinct source list
    val df = Seq(
      ("a", "x y z w"), ("b", "x y z q"), (null, "x y z w"))
      .toDF("src", "text")
    val got = TextAnalysis.sourceOverlap(df, "src", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(("a", "b", 1L, 1.0 / 3.0)))
  }

  test("bm25Rank matches an independent scalar computation and is partition-invariant") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark join the fast"),
      (2L, "join merge the a big"),
      (3L, "window filter spark slow"),
      (4L, "the a big small slow")) // no probe terms → unranked
    val df = docs.toDF("doc_id", "text")
    val probe = Seq("spark", "join", "window")
    val (k1, b) = (1.2, 0.75)

    // independent scalar BM25 with the same rational idf + sorted fold
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val dl = toks.map { case (id, ws) => id -> ws.size.toLong }.toMap
    val n = dl.size
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val tf = toks.flatMap { case (id, ws) =>
      ws.filter(probe.contains).groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val dfreq = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      val score = rows.sortBy(_._2).foldLeft(0.0) { case (acc, (_, t, f)) =>
        val idf = (n.toDouble - dfreq(t).toDouble + 0.5) / (dfreq(t).toDouble + 0.5)
        acc + idf * ((f.toDouble * (k1 + 1)) /
          (f.toDouble + k1 * (1.0 - b + b * (dl(id).toDouble / avgdl))))
      }
      id -> score
    }

    val got = TextAnalysis.bm25Rank(df, "doc_id", "text", probe, k1, b, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet) // doc 4 absent: no probe terms
    expected.foreach { case (id, sc) =>
      assert(got(id) == sc, s"doc $id: got ${got(id)}, expected $sc (must be bit-identical)")
    }

    // the top-1 is the independent computation's argmax (doc 3 here: its
    // rare probe term "window" has df=1, and BM25's idf weighting beats
    // doc 1's repeated common term — term-frequency saturation at work)
    val ranked = TextAnalysis.bm25Rank(df, "doc_id", "text", probe, k1, b, k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(ranked == Seq(expected.maxBy(e => (e._2, -e._1))._1))
    assert(ranked == Seq(3L))

    // partitioning must not change a single bit of any score
    val again = TextAnalysis.bm25Rank(df.repartition(7), "doc_id", "text", probe, k1, b, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("simhashPairsBanded pigeonhole blocking is lossless vs brute force") {
    val s = spark
    import s.implicits._
    // clusters of near-identical docs (1-2 word edits) plus unrelated ones
    val docs = (0 until 40).map { i =>
      val base = (0 until 30).map(j => s"w${(i / 4) * 100 + j}").mkString(" ")
      (i.toLong, "b0", if (i % 4 == 0) base else base + s" extra$i")
    } :+ ((99L, "b1", "totally different text here"))
    val df = docs.toDF("id", "bkt", "text")

    val banded = Dedup.simhashPairsBanded(df, "id", "text", Seq("bkt"), maxDist = 3, bits = 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // brute force over the SAME 48-bit signatures
    val sig = df.select(col("bkt"), col("id"),
      org.apache.spark.sql.graft.SimHashBits(Dedup.tokenSet(col("text")), 48).as("s"))
    val brute = sig.as("x").join(sig.as("y"),
        col("x.bkt") === col("y.bkt") && col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        bit_count(expr("x.s ^ y.s")).cast("long").as("h"))
      .filter(col("h") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(banded == brute, "blocking must find exactly the all-pairs answer")
    assert(brute.nonEmpty, "fixture must actually contain near-dup pairs")
  }
}
