package graft.functions

import graft.SparkSpec
import graft.operators.{KMeansIvf, Similarity}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CodesToLongs, DotCodes, NearestCells, NearestCellsCodes, SQ8EncodeRaw, SQ8PackRaw}

/** The packed SQ8 code representation (binary, unsigned bytes) must be a
  * pure re-encoding of the array<long> codes: identical values, identical
  * dots, identical cell ranking — only the storage shape differs. Every
  * test here pins packed against unpacked, so any drift between the two
  * code paths (SQ8CodesEval vs SQ8EncodeEval / NearestCellsEval) fails
  * loudly instead of skewing ns61's ranking. */
class SQ8CodesSpec extends SparkSpec {

  private def vecsDf = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 300).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("id", "vec")
  }

  private def boundsOf(df: org.apache.spark.sql.DataFrame): (Seq[Long], Seq[Long]) = {
    val b = df.agg(graft.functions.MinMaxVecAgg.bounds(col("vec")).as("b"))
      .select(col("b._1"), col("b._2")).head()
    def toFp(xs: Seq[Float]): Seq[Long] = xs.map(x => math.floor(x.toDouble * 1000000d).toLong)
    (toFp(b.getSeq[Float](0)), toFp(b.getSeq[Float](1)))
  }

  test("pack → unpack round-trips to exactly the array<long> encode") {
    val df = vecsDf
    val (mn, mx) = boundsOf(df)
    val both = df.select(col("id"),
        CodesToLongs(SQ8PackRaw(col("vec"), typedlit(mn), typedlit(mx))).as("unpacked"),
        SQ8EncodeRaw(col("vec"), typedlit(mn), typedlit(mx)).as("direct"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2), s"id ${r.getLong(0)}")
    }
  }

  test("DotCodes on packed ≡ DotFp on unpacked, for every pair") {
    val df = vecsDf.limit(40)
    val (mn, mx) = boundsOf(df)
    val coded = df.select(col("id"),
      SQ8PackRaw(col("vec"), typedlit(mn), typedlit(mx)).as("q"),
      SQ8EncodeRaw(col("vec"), typedlit(mn), typedlit(mx)).as("qa"))
    val pairs = coded.as("a").crossJoin(coded.as("b"))
      .select(
        DotCodes(col("a.q"), col("b.q")).as("packed"),
        Similarity.dotFp(col("a.qa"), col("b.qa")).as("unpacked"))
      .collect()
    assert(pairs.length == 1600)
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("NearestCellsCodes ranks cells exactly like NearestCells on unpacked codes") {
    val df = vecsDf
    val (mn, mx) = boundsOf(df)
    // centroids in code space, deliberately including ties-by-construction
    // (two identical centroids) to exercise the lowest-cell tie-break
    val cents = Array(
      Array.fill(16)(64L), Array.fill(16)(128L), Array.fill(16)(192L),
      Array.fill(16)(128L), Array.tabulate(16)(i => (i * 16).toLong))
    val both = df.select(
        NearestCellsCodes(SQ8PackRaw(col("vec"), typedlit(mn), typedlit(mx)), cents, 3).as("p"),
        NearestCells(SQ8EncodeRaw(col("vec"), typedlit(mn), typedlit(mx)), cents, 3).as("u"))
      .collect()
    both.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("fitCodes: local and distributed paths produce identical assignments and centroids") {
    val df = vecsDf
    val codes = Similarity.sq8PackedCodes(df, "id", "vec")
    val (aLocal, cLocal) = KMeansIvf.fitCodes(codes, "id", "__q", k = 6, iters = 2)
    val local = aLocal.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    spark.conf.set("spark.graft.kmeans.localThreshold", "0")
    try {
      val (aDist, cDist) = KMeansIvf.fitCodes(codes, "id", "__q", k = 6, iters = 2)
      val dist = aDist.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(local == dist)
      assert(cLocal.map(_.toSeq).toSeq == cDist.map(_.toSeq).toSeq)
    } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
  }

  test("searchSq8MultiProbe with nProbe = nCells ≡ sq8TopK (packed ≡ unpacked, full recall)") {
    // probing every cell removes the IVF restriction, so the multi-probe
    // result must equal the flat quantized top-k — which also pins the
    // packed-code ranking against ns36's array<long> ranking end-to-end
    val t = graft.Tables(spark, sf0001)
    val queries = t.embeddings.filter(col("vec_id") < 5)
    val viaIvf = KMeansIvf.searchSq8MultiProbe(queries, t.embeddings,
        "vec_id", "embedding", k = 5, nCells = 4, nProbe = 4, iters = 2)
      .select("q_id", "cand_id", "qsim", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaFlat = Similarity.sq8TopK(queries, t.embeddings,
        "vec_id", "embedding", k = 5, dim = 64)
      .select("q_id", "cand_id", "qsim", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaIvf == viaFlat)
    assert(viaIvf.nonEmpty)
  }

  test("searchSq8 returns a valid in-cell top-k on the fixture embeddings") {
    val t = graft.Tables(spark, sf0001)
    val queries = t.embeddings.filter(col("vec_id") < 5)
    val res = KMeansIvf.searchSq8(queries, t.embeddings, "vec_id", "embedding",
      k = 5, nCells = 8, iters = 2).collect()
    assert(res.nonEmpty)
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.length <= 5)
      // ranks are 1..n and qsim non-increasing in rank order
      val sorted = rows.sortBy(_.getLong(3))
      assert(sorted.map(_.getLong(3)).toSeq == (1L to rows.length).toSeq)
      val sims = sorted.map(_.getLong(2)).toSeq
      assert(sims == sims.sorted(Ordering[Long].reverse))
      // no self-match
      rows.foreach(r => assert(r.getLong(1) != r.getLong(0)))
    }
  }
}
