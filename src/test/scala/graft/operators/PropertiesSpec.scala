package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2#3): keyset pagination
  * reproduces the full ordered scan for random data / page sizes / tied
  * timestamps; retention survivors are exactly the newest-N; upsert is
  * idempotent under arbitrary batch replays.
  */
class PropertiesSpec extends SparkSpec {

  /** Deterministic generator sampling (the scalatest-scalacheck bridge is
    * not on the offline classpath). */
  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 8)(body: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } body(a, b)
    }

  // (ts, id) rows with deliberately-colliding timestamps
  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 120)
    ts <- Gen.listOfN(n, Gen.choose(0L, 20L))
  } yield ts.zipWithIndex.map { case (t, i) => (t, i.toLong) }

  test("property: pagination walk == full ordered scan, no dup/loss") {
    val s = spark
    import s.implicits._
    forAll(rowsGen, Gen.choose(1, 17)) { (rows, pageSize) =>
      val df = rows.toDF("ts_us", "id").cache()
      val full = rows.sortBy { case (t, i) => (-t, -i) }.map(_._2)
      var out = Vector.empty[Long]
      var cursor: Option[String] = None
      var done = false
      var guard = 0
      while (!done && guard < 200) {
        guard += 1
        val page = Paging.page(df, col("ts_us"), col("id"), pageSize, cursor, _.toLong)
        val got = page.orderBy(col("ts_us").desc, col("id").desc)
          .select("id").collect().map(_.getLong(0)).toVector
        if (got.isEmpty) done = true
        else {
          out ++= got
          cursor = Paging.encodeCursor(page, col("ts_us"), col("id"))
          if (cursor.isEmpty) done = true
        }
      }
      df.unpersist()
      assert(out.toList == full)
    }
  }

  test("property: retention keeps exactly the newest n per key") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(0, 80)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.choose(0L, 10L)
      } yield (k, t))
    } yield rows.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    forAll(gen, Gen.choose(1, 6)) { (rows, keep) =>
      val df = rows.toDF("key", "ts_us", "id")
      val got = Retention.keepNewest(df, Seq(col("key")), col("ts_us"), col("id"), keep)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.groupBy(_._1).values.flatMap(
        _.sortBy(r => (-r._2, -r._3)).take(keep).map(_._3)).toSet
      assert(got == want)
    }
  }

  test("property: driver Lloyd == distributed fit on random corpora (ties, n<k, dups)") {
    val s = spark
    import s.implicits._
    // tiny value domain on purpose: duplicate vectors, distance ties, and
    // k > n corpora all occur, the exact edges where the two paths could
    // diverge (first-min tie-break, empty clusters, short seed lists)
    val corpusGen: Gen[List[(Long, List[Float])]] = for {
      n <- Gen.choose(1, 40)
      dim <- Gen.oneOf(2, 4)
      rows <- Gen.listOfN(n, Gen.listOfN(dim, Gen.choose(-3, 3).map(_ * 0.1f)))
    } yield rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    forAll(corpusGen, Gen.choose(1, 6), n = 6) { (rows, k) =>
      val df = rows.toDF("vec_id", "embedding")
      val (aL, cL) = KMeansIvf.fit(df, "vec_id", "embedding", k, iters = 2)
      val localAssign = aL.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      spark.conf.set("spark.graft.kmeans.localThreshold", "0")
      try {
        val (aD, cD) = KMeansIvf.fit(df, "vec_id", "embedding", k, iters = 2)
        assert(cL.map(_.toSeq).toSeq == cD.map(_.toSeq).toSeq,
          s"centroids diverged for n=${rows.size} k=$k")
        assert(localAssign == aD.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap,
          s"assignments diverged for n=${rows.size} k=$k")
      } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
    }
  }

  test("property: driver union-find == distributed propagation on random corpora") {
    val s = spark
    import s.implicits._
    // tiny vocabulary → heavy shingle overlap → dense, chainy bucket
    // graphs, the hard case for label propagation round counts
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docsGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(2, 25)
      texts <- Gen.listOfN(n, Gen.listOfN(6, Gen.oneOf(vocab)).map(_.mkString(" ")))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    forAll(docsGen, Gen.const(()), n = 4) { (docs, _) =>
      val df = docs.toDF("doc_id", "text")
      val local = Dedup.minhashLshComponents(df, "doc_id", "text", 8, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set("spark.graft.components.localThreshold", "0")
      try {
        val dist = Dedup.minhashLshComponents(df, "doc_id", "text", 8, 2)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(local == dist, s"components diverged for ${docs.size} docs")
      } finally spark.conf.unset("spark.graft.components.localThreshold")
    }
  }

  test("property: upsert idempotence under arbitrary replays") {
    val s = spark
    import s.implicits._
    val batchGen = Gen.listOf(for {
      u <- Gen.choose(0, 25)
      v <- Gen.choose(0, 1000)
    } yield (s"u$u", "k", v))
    forAll(batchGen, batchGen) { (b1, b2) =>
      val empty = Seq.empty[(String, String, Int)].toDF("uri", "key", "v")
      val d1 = b1.toDF("uri", "key", "v")
      val d2 = b2.toDF("uri", "key", "v")
      val once = Upsert.upsert(Upsert.upsert(empty, d1, Seq("uri", "key")), d2, Seq("uri", "key"))
      val replayed = Upsert.upsert(
        Upsert.upsert(once, d1, Seq("uri", "key")), d2, Seq("uri", "key"))
      assert(replayed.count() == once.count())
      assert(once.select("uri").distinct().count() == once.count())
    }
  }

  test("property: batchIds == floor(rank/size) in key order, any keys/size/partitioning") {
    val s = spark
    import s.implicits._
    val keysGen = for {
      n <- Gen.choose(0, 300)
      ks <- Gen.listOfN(n, Gen.choose(0L, 150L)) // duplicates on purpose
    } yield ks
    forAll(keysGen, Gen.choose(1, 40)) { (ks, size) =>
      val parts = 1 + (ks.length % 7)
      val got = Upsert.batchIds(ks.toDF("k").repartition(parts), "k", size)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = ks.distinct.sorted.zipWithIndex
        .map { case (k, i) => k -> (i / size).toLong }.toMap
      assert(got == expected, s"n=${ks.length} size=$size parts=$parts")
    }
  }

  test("property: banded simhash == brute-force pairs on random corpora") {
    val s = spark
    import s.implicits._
    // random docs over a small vocab so hamming-close pairs actually occur
    val docsGen = for {
      n <- Gen.choose(2, 60)
      docs <- Gen.listOfN(n, Gen.listOfN(12, Gen.choose(0, 18)))
    } yield docs.zipWithIndex.map { case (ws, i) =>
      (i.toLong, ws.map(w => s"t$w").mkString(" "))
    }
    forAll(docsGen, Gen.choose(1, 6)) { (docs, maxDist) =>
      val df = docs.toDF("id", "text")
      val banded = Dedup.simhashPairsBanded(df, "id", "text", Nil, maxDist, bits = 48)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sig = df.select(col("id"),
        org.apache.spark.sql.graft.SimHashBits(Dedup.tokenSet(col("text")), 48).as("sh"))
      val brute = sig.as("x").join(sig.as("y"), col("x.id") < col("y.id"))
        .filter(bit_count(expr("x.sh ^ y.sh")) <= maxDist)
        .select(col("x.id"), col("y.id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(banded == brute, s"maxDist=$maxDist n=${docs.size}")
    }
  }

  test("property: source-mix sample honors water-filled quotas for any mix") {
    val s = spark
    import s.implicits._
    val corpusGen = for {
      n <- Gen.choose(1, 200)
      srcs <- Gen.listOfN(n, Gen.choose(0, 4))
    } yield srcs.zipWithIndex.map { case (src, i) => (i.toLong, s"s$src") }
    forAll(corpusGen, Gen.choose(2, 4)) { (rows, nTargets) =>
      // shares sum to 1 over the targeted sources
      val targets = (0 until nTargets).map(i => s"s$i" -> 1.0 / nTargets)
      val counts = rows.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
      val m = targets.map { case (src, share) =>
        math.floor(counts.getOrElse(src, 0L) / share)
      }.min
      val expected = targets.map { case (src, share) =>
        src -> math.floor(m * share).toLong
      }.filter(_._2 > 0).toMap
      val got = TextAnalysis.sampleToMix(rows.toDF("id", "src"), "src", "id", targets)
        .groupBy("src").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"targets=$targets counts=$counts")
    }
  }

  test("property: chunkOverlap == scalar reference for any n/size/stride") {
    val s = spark
    import s.implicits._
    val docGen = for {
      n <- Gen.choose(0, 120)
    } yield (1 to n).map(i => s"t$i").mkString(" ")
    val shapeGen = for {
      size <- Gen.choose(1, 24)
      stride <- Gen.choose(1, 30) // stride > size (gaps) must also hold
    } yield (size, stride)
    forAll(docGen, shapeGen) { case (text, (size, stride)) =>
      val toks = text.toLowerCase.split(" ", -1).toVector // words() semantics: "" → [""]
      val n = toks.size
      val upper = math.max(math.min(n - size + stride, n), 1)
      val expected = (1 to upper by stride).zipWithIndex.map { case (start, ci) =>
        (ci.toLong, start.toLong,
          math.min(size, n - start + 1).toLong,
          toks.slice(start - 1, start - 1 + size).mkString(" "))
      }
      val got = TextAnalysis.chunkOverlap(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", size, stride)
        .orderBy("chunk_id")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSeq
      val expectedHashed = expected.map { case (ci, st, nt, chunk) =>
        (ci, st, nt,
          java.security.MessageDigest.getInstance("MD5").digest(chunk.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString)
      }
      assert(got == expectedHashed, s"n=$n size=$size stride=$stride")
      // formula-independent invariants (the reference above restates the
      // implementation, so these guard the boundary on their own): every
      // chunk starts inside the doc and carries at least one token
      got.foreach { case (_, st, nt, _) =>
        assert(st >= 1 && st <= n && nt >= 1 && nt <= size,
          s"phantom/degenerate chunk (start=$st n_toks=$nt) n=$n size=$size stride=$stride")
      }
      // ends strictly increase → no chunk is contained in another
      val ends = expected.map { case (_, st, nt, _) => st + nt - 1 }
      assert(ends == ends.sorted && ends.distinct == ends)
      // full coverage whenever windows overlap or tile (stride <= size)
      if (stride <= size && n > 0) {
        val covered = expected.flatMap { case (_, st, nt, _) => st until (st + nt) }.toSet
        assert((1L to n.toLong).forall(covered), s"gap at n=$n size=$size stride=$stride")
      }
    }
  }

  test("property: tokenBudgetSelect == scalar greedy fill per source") {
    val s = spark
    import s.implicits._
    val vocab = Vector("the", "a", "x", "yy", "zzz")
    val corpusGen = for {
      n <- Gen.choose(1, 60)
      docs <- Gen.listOfN(n, for {
        src <- Gen.choose(0, 2)
        ws <- Gen.choose(1, 12).flatMap(k => Gen.listOfN(k, Gen.oneOf(vocab)))
      } yield (s"s$src", ws.mkString(" ")))
    } yield docs.zipWithIndex.map { case ((src, t), i) => (src, i.toLong, t) }
    forAll(corpusGen, Gen.choose(3L, 40L)) { (rows, budget) =>
      // scalar reference: per source, sort by (quality desc, id asc), keep
      // while the inclusive running token total fits the budget
      def quality(t: String): Double = {
        val ws = t.toLowerCase.split(" ", -1)
        val stop = ws.count(w => w == "the" || w == "a")
        0.6 * (math.min(ws.length.toDouble, 200.0) / 200.0) +
          0.4 * (stop.toDouble / ws.length.toDouble)
      }
      val expected = rows.groupBy(_._1).flatMap { case (_, docs) =>
        val ordered = docs.map { case (src, id, t) =>
          (src, id, t.split(" ", -1).length.toLong, quality(t))
        }.sortBy { case (_, id, _, q) => (-q, id) }
        val cums = ordered.scanLeft(0L)(_ + _._3).tail
        ordered.zip(cums).takeWhile(_._2 <= budget)
          .map { case ((src, id, nt, _), cum) => (src, id, nt, cum) }
      }.toSet
      val got = TextAnalysis.tokenBudgetSelect(
          rows.toDF("source", "doc_id", "text"), "source", "doc_id", "text", budget)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
        .toSet
      assert(got == expected, s"budget=$budget")
    }
  }
}
