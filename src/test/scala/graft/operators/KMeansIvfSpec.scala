package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KMeansIvfSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001).embeddings

  test("fit is deterministic and partitions every vector into k cells") {
    val (a1, c1) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val (a2, c2) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val m1 = a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val m2 = a2.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m1 == m2)
    assert(m1.size == emb.count())
    assert(m1.values.toSet.subsetOf((0 until 8).toSet))
    assert(c1.length == 8)
  }

  test("centroids move toward their members (objective decreases)") {
    val (a, cents) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 4, iters = 3)
    // every member's assigned centroid is its argmin over the final centroids
    val fp = emb.select(col("vec_id"), Similarity.fixedPoint(col("embedding")).as("fe"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val assignMap = a.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def d2(x: Array[Long], c: Array[Long]): BigInt =
      x.zip(c).map { case (a0, b0) => BigInt(a0 - b0) * BigInt(a0 - b0) }.sum
    assignMap.foreach { case (id, cl) =>
      val dists = cents.map(c => d2(fp(id), c))
      assert(dists(cl) == dists.min)
    }
  }

  test("IVF search returns within-cell top-k with valid ranks") {
    val queries = emb.filter(col("vec_id") < 3)
    val res = KMeansIvf.search(queries, emb, "vec_id", "embedding", k = 5, nCells = 4, iters = 2)
    val rows = res.collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length))
      assert(rs.forall(r => r.getAs[Double]("sim") <= 1.0 + 1e-9))
    }
  }

  test("assertCovered fails loudly on query ids absent from the corpus") {
    val s = spark
    import s.implicits._
    val queries = Seq(999999L, 999998L).toDF("vec_id")
    val e = intercept[IllegalArgumentException](
      KMeansIvf.search(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, iters = 2, assertCovered = true))
    assert(e.getMessage.contains("absent from the candidate corpus"))
    assert(e.getMessage.contains("searchVectors"))
    // covered ids pass the guard and return rows
    val ok = KMeansIvf.search(emb.filter(col("vec_id") < 3), emb, "vec_id",
      "embedding", k = 5, nCells = 4, iters = 2, assertCovered = true)
    assert(ok.count() > 0)
    val e2 = intercept[IllegalArgumentException](
      KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, iters = 2, assertCovered = true))
    assert(e2.getMessage.contains("searchMultiProbe"))
  }

  test("searchVectors accepts external query vectors and keeps id collisions") {
    val s = spark
    import s.implicits._
    // external queries: corpus vectors under FOREIGN ids (one colliding
    // with a corpus id on purpose) — search/searchMultiProbe would return
    // zero rows for the non-corpus ids; searchVectors must rank them all
    val sample = emb.select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < 3).collect()
    val ext = sample.zipWithIndex.map { case (r, i) =>
      // id 0 collides with corpus vec_id 0; the rest are foreign
      (if (i == 0) 0L else 1000000L + i, r.getSeq[Float](1))
    }.toSeq.toDF("vec_id", "embedding")
    val res = KMeansIvf.searchVectors(ext, emb, "vec_id", "embedding",
      k = 5, nCells = 4, nProbe = 4, iters = 2)
    val byQ = res.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == ext.collect().map(_.getLong(0)).toSet,
      "every external query id must produce result rows")
    // the colliding id's top hit is its own corpus twin (sim = 1),
    // NOT excluded — external id namespaces are unrelated
    val collide = byQ(0L).minBy(_.getAs[Long]("rank"))
    assert(collide.getAs[Long]("cand_id") == 0L)
    assert(math.abs(collide.getAs[Double]("sim") - 1.0) < 1e-9)
    // full-probe searchVectors on corpus-drawn vectors ≡ brute force
    // EXCEPT self-hits rank first — drop them and compare the tail
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 4)
      .select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaVec = KMeansIvf.searchVectors(
        emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 4, iters = 2)
      .filter(col("q_id") =!= col("cand_id"))
      .select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.subsetOf(viaVec))
  }

  test("multi-probe with nProbe = nCells recovers the brute-force top-k exactly") {
    val queries = emb.filter(col("vec_id") < 3)
    val all = KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 4, iters = 2)
      .select("q_id", "cand_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select("q_id", "cand_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all == brute)
    // and probing 2 of 4 cells returns a subset of candidates no worse
    // than single-probe (recall is monotone in nProbe)
    val p1 = KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 1, iters = 2)
      .select("q_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, iters = 2)
      .select("q_id", "cand_id", "sim").collect()
    val p2best = p2.groupBy(_.getLong(0)).view.mapValues(_.map(_.getDouble(2)).max)
    assert(p2.map(r => (r.getLong(0), r.getLong(1))).toSet.size >= p1.size)
    p2best // recall widening sanity-checked via candidate-set growth above
  }

  test("PQ: codebooks are deterministic, every candidate encodes, ranks are dense per query") {
    val queries = emb.filter(col("vec_id") < 5)
    val r1 = graft.operators.ProductQuantizer.pqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64).collect()
    val r2 = graft.operators.ProductQuantizer.pqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64).collect()
    assert(r1.map(_.toSeq).toSet == r2.map(_.toSeq).toSet) // deterministic, no RNG
    val byQ = r1.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L)) // dense ranks
      assert(rows.forall(_.getLong(2) >= 0L)) // squared distances
    }
  }

  test("IVF-PQ: nCells=1 equals flat pqTopK; real cells keep every hit in the query's cell") {
    val queries = emb.filter(col("vec_id") < 5)
    // one cell -> the cell predicate is vacuous and the composed index IS
    // the flat ADC ranking
    val flat = graft.operators.ProductQuantizer.pqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64).collect().map(_.toSeq).toSet
    val one = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64, nCells = 1).collect().map(_.toSeq).toSet
    assert(one == flat, "nCells=1 IVF-PQ must equal flat ADC")
    // ... and the scale representation (cells trained/assigned on packed
    // SQ8 codes) changes WHICH cell a vector lands in, never the in-cell
    // ADC ranking — with one cell it must also equal flat ADC exactly
    val oneCodes = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64, nCells = 1, cellsOnCodes = true)
      .collect().map(_.toSeq).toSet
    assert(oneCodes == flat, "nCells=1 code-cell IVF-PQ must equal flat ADC")
    // probing EVERY cell removes the pruning entirely — multiprobe at
    // nProbe=nCells must also equal flat ADC (the ns62 equivalence, on
    // the composed index)
    val allProbes = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64, nCells = 4, nProbe = 4)
      .collect().map(_.toSeq).toSet
    assert(allProbes == flat, "nProbe=nCells IVF-PQ must equal flat ADC")
    // real cells: every (q, cand) pair shares the query's k-means cell,
    // and in-cell ADC order matches the flat ranking restricted to the cell
    val (assign, _) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 4, iters = 2)
    val cellOf = assign.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ivf = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64, nCells = 4).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      assert(cellOf(r.getLong(0)) == cellOf(r.getLong(1)),
        s"hit ${r.getLong(1)} outside query ${r.getLong(0)}'s cell")
    }
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.size)) // dense ranks
    }
  }

  test("IVF-PQ nProbe calibration: recall monotone, full probe ≡ flat ADC recall, pick rules") {
    val queries = emb.filter(col("vec_id") < 5)
    // unreachable target: the pick must degrade to maxProbe, never fail
    val rows = graft.operators.ProductQuantizer.calibrateNProbePq(queries, emb,
        "vec_id", "embedding", k = 5, dim = 64, nCells = 4, maxProbe = 4,
        target = 2.0)
      .orderBy(col("n_probe")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.count(_.getBoolean(2)) == 1 && rows.last.getBoolean(2),
      "an unreachable target must choose maxProbe")
    // probing EVERY cell removes pruning: recall@nCells must equal flat
    // ADC's recall against the same exact integer L2 truth
    val flat = graft.operators.ProductQuantizer.pqTopK(queries, emb,
        "vec_id", "embedding", k = 5, dim = 64)
      .select("q_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000000).toLong).toArray)
      .toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val truth = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(c => (c, l2(vecs(q), vecs(c)))).sortBy { case (c, d) => (d, c) }
        .take(5).map { case (c, _) => (q, c) }
    }.toSet
    val flatRecall = truth.count(flat.contains).toDouble / (5 * 5)
    assert(rows.last.getDouble(1) == flatRecall,
      s"recall@nCells=${rows.last.getDouble(1)} must equal flat ADC recall $flatRecall")
    // the ONE-PASS probe-rank pipeline must reproduce the per-setting
    // search exactly: recall(p) == ivfPqTopK(nProbe = p)'s recall vs the
    // same truth for EVERY setting. (Recall is NOT asserted monotone —
    // ADC is approximate, so a newly probed cell's ADC-closer-but-wrong
    // candidate can displace a true hit; the observed sf0.001 readings
    // do dip: 0.2, 0.24, 0.2, 0.2.)
    (1 to 4).foreach { p =>
      val hits = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
          "vec_id", "embedding", k = 5, dim = 64, nCells = 4, nProbe = p)
        .select("q_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = truth.count(hits.contains).toDouble / (5 * 5)
      assert(rows(p - 1).getDouble(1) == expect,
        s"one-pass recall at p=$p (${rows(p - 1).getDouble(1)}) diverged from " +
          s"the per-setting search ($expect)")
    }
    // a trivially-met target picks the SMALLEST setting
    val easy = graft.operators.ProductQuantizer.calibrateNProbePq(queries, emb,
        "vec_id", "embedding", k = 5, dim = 64, nCells = 4, maxProbe = 4,
        target = 0.0)
      .orderBy(col("n_probe")).collect()
    assert(easy.head.getBoolean(2) && easy.count(_.getBoolean(2)) == 1,
      "a target of 0 must choose n_probe = 1")
  }

  test("PQ leaves no persistent RDDs behind (training cache self-releases)") {
    val queries = emb.filter(col("vec_id") < 3)
    // no SharedCache / Verify sweep involved: run the full query and check
    // the context directly — a library caller must not inherit a leaked
    // MEMORY_AND_DISK cache from the training pass
    val before = spark.sparkContext.getPersistentRDDs.keySet
    graft.operators.ProductQuantizer.pqTopK(queries, emb,
      "vec_id", "embedding", k = 3, dim = 64).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"pqTopK left persistent RDDs: $leaked")
  }

  test("cached fit (SharedCache key) returns the same model as a private fit") {
    val key = Some(s"kmeansfit:spec:${System.identityHashCode(emb)}")
    val queries = emb.filter(col("vec_id") < 3)
    val shared1 = KMeansIvf.search(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, iters = 2, cacheKey = key)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    // second consumer over the same key reuses the pinned fit (multi-probe
    // here, like ns30 after ns20) and must agree with its uncached twin
    val shared2 = KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, iters = 2, cacheKey = key)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    val private1 = KMeansIvf.search(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, iters = 2)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    val private2 = KMeansIvf.searchMultiProbe(queries, emb, "vec_id", "embedding",
        k = 5, nCells = 4, nProbe = 2, iters = 2)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    assert(shared1 == private1)
    assert(shared2 == private2)
    graft.SharedCache.clear(spark)
  }

  test("driver Lloyd fast path equals the distributed fit (centroids + assignments)") {
    // default threshold routes this corpus to the driver; threshold 0
    // forces the distributed assign-join/centroid-agg loop — bit-equal
    // models required, not approximately equal
    val (aLocal, cLocal) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    spark.conf.set("spark.graft.kmeans.localThreshold", "0")
    try {
      val (aDist, cDist) = KMeansIvf.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
      assert(cLocal.map(_.toSeq).toSeq == cDist.map(_.toSeq).toSeq)
      val mLocal = aLocal.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val mDist = aDist.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(mLocal == mDist)
    } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
  }

  test("distributed-fit assignments join back onto an alias-derived input (IvfStore's shape)") {
    // regression: the distributed fit checkpoints its working set reusing
    // the INPUT's attribute ids; before the fitImpl fresh-alias fix,
    // joining the assignments back onto an input whose id column is an
    // alias (here: a cast, IvfStore.publish's shape) threw the analyzer's
    // "conflicting attributes" internal error — but only above the local
    // threshold, so the 300-row lifecycle spec never saw it
    val aliased = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"))
    spark.conf.set("spark.graft.kmeans.localThreshold", "0")
    try {
      val (assignments, _) = KMeansIvf.fit(aliased, "vec_id", "embedding",
        k = 4, iters = 1)
      val joined = aliased.join(assignments, "vec_id")
      assert(joined.count() == aliased.count())
      assert(joined.columns.count(_ == "vec_id") == 1)
    } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
  }

  test("driver PQ training equals the distributed joint Lloyd (codebooks bit-equal)") {
    val local = graft.operators.ProductQuantizer.fitCodebooks(
      emb, "vec_id", "embedding", dim = 64, m = 4, ks = 16, iters = 2)
    spark.conf.set("spark.graft.kmeans.localThreshold", "0")
    try {
      val dist = graft.operators.ProductQuantizer.fitCodebooks(
        emb, "vec_id", "embedding", dim = 64, m = 4, ks = 16, iters = 2)
      assert(local.map(_.map(_.toSeq).toSeq) == dist.map(_.map(_.toSeq).toSeq))
    } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
  }

  test("PQ seeding: a duplicate id straddling the m·ks limit falls back to window init") {
    val s = spark
    import s.implicits._
    // ids (1, 2, 2): the globally-lowest m·ks = 4 (id, ss) rows are
    // (1,0),(1,1),(2,0),(2,0) — init.length == m·ks AND distinct-id count
    // == ks both hold, yet the rows are NOT a bijection onto ks ids × m
    // subspaces. The fast path would double-write cell (0,1) and leave
    // (1,1) empty; the guard must route to window init and every codebook
    // cell must come out non-empty.
    def v(base: Float): Seq[Float] = (0 until 4).map(i => base + i * 0.01f)
    val df = Seq((1L, v(0.1f)), (2L, v(0.2f)), (2L, v(0.3f)), (3L, v(0.4f)),
      (4L, v(-0.2f))).toDF("vec_id", "embedding")
    spark.conf.set("spark.graft.kmeans.localThreshold", "0") // distributed path
    try {
      val books = graft.operators.ProductQuantizer.fitCodebooks(
        df, "vec_id", "embedding", dim = 4, m = 2, ks = 2, iters = 1)
      assert(books.length == 2 && books.forall(_.length == 2))
      assert(books.forall(_.forall(_.nonEmpty)), "empty codebook cell leaked out of seeding")
    } finally spark.conf.unset("spark.graft.kmeans.localThreshold")
  }

  test("PQ: well-separated clusters retrieve their own members first") {
    val s = spark
    import s.implicits._
    // 3 clusters far apart in subspace structure, ids INTERLEAVED (cluster
    // = id % 3) so the lowest-id codebook init sees every cluster — with
    // block-contiguous ids all seeds land in one cluster and 2 Lloyd
    // iterations can leave two clusters sharing a code
    def v(base: Double): Seq[Float] = (0 until 64).map(i => (base + i * 0.001).toFloat)
    val rows = (0 until 12).map { id =>
      (id.toLong, v((id % 3) * 0.3 - 0.45).map(x => x + (id / 3) * 0.0001f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val res = graft.operators.ProductQuantizer.pqTopK(
        df.filter(col("vec_id").isin(0L, 1L, 2L)), df,
        "vec_id", "embedding", k = 3, dim = 64, m = 4, ks = 4, iters = 2)
      .collect()
    res.foreach { r =>
      val (q, cand) = (r.getLong(0), r.getLong(1))
      assert(q % 3 == cand % 3, s"query $q retrieved $cand from another cluster")
    }
  }

  test("composed calibrate→search consumes the calibration's pick (SQ8 and IVF-PQ)") {
    val queries = emb.filter(col("vec_id") < 5)
    // SQ8: the auto-tuned result must BE the manual-knob search at the
    // calibration's chosen setting — same rows, same ranks — with the
    // setting carried on every row, so the pick is provably load-bearing
    val calSq8 = KMeansIvf.calibrateNProbeSq8(queries, emb, "vec_id",
        "embedding", k = 5, nCells = 4, iters = 2, maxProbe = 4, target = 0.95)
      .filter(col("chosen")).collect()
    assert(calSq8.length == 1)
    val pickSq8 = calSq8.head.getLong(0)
    val auto = KMeansIvf.autoTunedSearchSq8(queries, emb, "vec_id",
      "embedding", k = 5, nCells = 4, iters = 2, maxProbe = 4, target = 0.95)
    assert(auto.select("n_probe").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(pickSq8), "n_probe column must carry exactly the chosen setting")
    val manual = KMeansIvf.searchSq8MultiProbe(queries, emb, "vec_id",
        "embedding", k = 5, nCells = 4, nProbe = pickSq8.toInt, iters = 2)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    assert(auto.select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
      == manual, "auto-tuned SQ8 search must equal the manual search at the pick")
    // IVF-PQ: same contract on the composed ADC index
    val calPq = graft.operators.ProductQuantizer.calibrateNProbePq(queries, emb,
        "vec_id", "embedding", k = 5, dim = 64, nCells = 4, maxProbe = 4,
        target = 0.95)
      .filter(col("chosen")).collect()
    assert(calPq.length == 1)
    val pickPq = calPq.head.getLong(0)
    val autoPq = graft.operators.ProductQuantizer.autoTunedIvfPqTopK(queries, emb,
      "vec_id", "embedding", k = 5, dim = 64, nCells = 4, maxProbe = 4,
      target = 0.95)
    assert(autoPq.select("n_probe").distinct().collect().map(_.getLong(0)).toSeq
      == Seq(pickPq))
    val manualPq = graft.operators.ProductQuantizer.ivfPqTopK(queries, emb,
        "vec_id", "embedding", k = 5, dim = 64, nCells = 4, nProbe = pickPq.toInt)
      .select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
    assert(autoPq.select("q_id", "cand_id", "rank").collect().map(_.toSeq).toSet
      == manualPq, "auto-tuned IVF-PQ search must equal the manual search at the pick")
  }
}
