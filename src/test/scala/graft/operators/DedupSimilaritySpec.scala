package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf0001).documents.cache()
  private lazy val emb = Tables(spark, sf0001).embeddings.cache()

  test("exact dedup groups sum back to the table size") {
    val g = Dedup.exact(docs, "doc_id", "text")
    assert(g.agg(sum("n")).head().getLong(0) == docs.count())
  }

  test("identical texts share minhash signature and land in the same LSH bucket") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "x y z w")).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash is order- and duplication-invariant over the word set") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c"), (2L, "c b a a a")).toDF("doc_id", "text")
    val sh = df.select(Dedup.simhash16(Dedup.tokenSet(col("text"))))
      .collect().map(_.getLong(0))
    assert(sh(0) == sh(1))
  }

  test("jaccard of identical word sets is 1.0, disjoint sets absent") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "g", "a b c"), (2L, "g", "c b a"), (3L, "g", "x y z"))
      .toDF("doc_id", "grp", "text")
    val pairs = Dedup.jaccardPairs(df, "doc_id", "text", Seq("grp"), 1, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.size == 1)
  }

  test("shingles produces distinct in-order n-grams") {
    val s = spark
    import s.implicits._
    val df = Seq(Tuple1("a b c d")).toDF("text")
    val sh = df.select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("brute-force top-k self-similarity: nearest neighbor of a duplicated vector is its twin") {
    val s = spark
    import s.implicits._
    val base = emb.limit(8).collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val dup = (100L, base.head._2) // exact copy of vec 0
    val all = (base :+ dup).toSeq.toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
      all.filter(col("vec_id") === 0L), all, "vec_id", "embedding", 1)
    val row = top.head()
    assert(row.getAs[Long]("cand_id") == 100L)
    assert(math.abs(row.getAs[Double]("sim") - 1.0) < 1e-9)
  }

  test("knnGraph: every node ranked, edges stay inside the block, single-block equals brute force") {
    val s = spark
    import s.implicits._
    val df = emb.limit(12).select(col("vec_id"), col("embedding"),
      (col("vec_id") % 2).cast("int").as("blk"))
    // blocked: edges never cross blk, and each node gets min(k, |blk|-1) rows
    val g = Similarity.knnGraph(df, "vec_id", "embedding", Seq("blk"), k = 3, dim = Some(64))
    val byBlk = df.select(col("vec_id"), col("blk")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = g.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(byBlk(r.getAs[Long]("q_id")) == byBlk(r.getAs[Long]("cand_id"))))
    val perQ = rows.groupBy(_.getAs[Long]("q_id")).map { case (q, rs) => q -> rs.length }
    byBlk.keys.foreach { q =>
      val peers = byBlk.count(_._2 == byBlk(q)) - 1
      assert(perQ.getOrElse(q, 0) == math.min(3, peers), s"node $q")
    }
    // one shared block: the graph IS the exact graph
    val one = df.withColumn("blk", lit(0))
    val exact = Similarity.bruteForceTopK(one, one, "vec_id", "embedding", 3, Some(64))
      .select(col("q_id"), col("cand_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val graph = Similarity.knnGraph(one, "vec_id", "embedding", Seq("blk"), 3, Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(graph == exact)
    // and the heap-ranked brute graph is the same set as the window-ranked
    // bruteForceTopK (the harness truth side must agree with the original)
    val brute = Similarity.bruteKnnGraph(one, "vec_id", "embedding", 3, Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute == exact)
    // partition invariance: the heap passes see different row orders under
    // a different layout; the (sim DESC, cand_id) total order must make
    // the output identical anyway
    val re = Similarity.knnGraph(df.repartition(7), "vec_id", "embedding",
        Seq("blk"), 3, Some(64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(re == rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("ivf restricts candidates to the query's cluster") {
    val top = Similarity.ivfTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", "label", 5)
    val byLabel = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    top.collect().foreach { r =>
      assert(byLabel(r.getAs[Long]("q_id")) == byLabel(r.getAs[Long]("cand_id")))
    }
  }

  test("multimodal decode stub emits deterministic metadata; frame sampling partitions the bytes") {
    val meta = Multimodal.metadataFromText(spark, docs.limit(5), "doc_id", "text", "image")
    val rows = meta.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("sha").length == 32)
    }
    val packed = Multimodal.packFromText(docs.limit(3), "doc_id", "text", "image")
    val frames = Multimodal.frameSample(packed, 4)
    val sizes = frames.groupBy("doc_id").agg(
      sum(length(col("frame_bytes"))).as("total")).collect()
    val orig = packed.select(col("doc_id"), length(col("media")).as("len")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    sizes.foreach(r => assert(r.getLong(1) == orig(r.getLong(0)).toLong))
  }

  test("real JDK image decode: exact dims, aspect-preserving resize, undecodable dropped") {
    val s = spark
    import s.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) im.setRGB(x, y, (x * 7 + y * 13) % 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", png(20, 10)),
      Multimodal.MediaRow(2L, "image", png(5, 15)),
      Multimodal.MediaRow(3L, "image", "not an image".getBytes("UTF-8"))).toDS()
    // decode parses ACTUAL pixel dimensions; the junk payload drops
    val meta = Multimodal.decodeImages(ds).collect().sortBy(_.doc_id)
    assert(meta.map(m => (m.doc_id, m.width, m.height)).toSeq ==
      Seq((1L, 20, 10), (2L, 5, 15)))
    // resize scales the longest side to 10, aspect preserved, round-half-up
    val resized = Multimodal.decodeImages(Multimodal.resizeImages(ds, maxSide = 10))
      .collect().sortBy(_.doc_id)
    assert(resized.map(m => (m.doc_id, m.width, m.height)).toSeq ==
      Seq((1L, 10, 5), (2L, 3, 10)))
    // a payload already inside the bound passes through byte-identical
    val small = Multimodal.resizeImages(
      Seq(Multimodal.MediaRow(9L, "image", png(4, 4))).toDS(), maxSide = 10).collect()
    assert(small.head.media.sameElements(png(4, 4)))
  }

  test("real image featurizer: pixel-content embeddings feed cosine near-dup unchanged") {
    val s = spark
    import s.implicits._
    def png(seed: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 16; y <- 0 until 16)
        im.setRGB(x, y, (x * seed * 31 + y * 17) % 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", png(3)),
      Multimodal.MediaRow(2L, "image", png(3)), // same pixels → same embedding
      Multimodal.MediaRow(3L, "image", png(200))).toDS()
    val feats = Multimodal.imageFeatures(ds, grid = 4).toDF()
    assert(feats.head().getSeq[Float](2).length == 16)
    val pairs = Similarity.cosineNearDupPairs(feats, "doc_id", "embedding",
        bucket = Seq("kind"), threshold = 0.9999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"identical images must pair: ${pairs.toSeq}")
  }

  test("multimodal featurizer feeds embedding near-dup: identical payloads pair at sim 1.0") {
    val s = spark
    import s.implicits._
    val texts = Seq((1L, "same payload"), (2L, "same payload"), (3L, "different bytes"))
      .toDF("doc_id", "text")
    val packed = Multimodal.packFromText(texts, "doc_id", "text", "image")
    val feats = Multimodal.featureExtractStub(packed.as[Multimodal.MediaRow]).toDF()
    val pairs = Similarity.cosineNearDupPairs(feats, "doc_id", "embedding",
        bucket = Seq("kind"), threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("sq8 quantized top-k: valid ranks, integer sims, reproducible") {
    val queries = emb.filter(col("vec_id") < 3)
    val a = Similarity.sq8TopK(queries, emb, "vec_id", "embedding", k = 5, dim = 64)
    val rows = a.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rs.length))
    }
    val b = Similarity.sq8TopK(queries, emb, "vec_id", "embedding", k = 5, dim = 64)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("hyperplane LSH: identical vectors share a bucket and find each other at rank 1") {
    val s = spark
    import s.implicits._
    val v1 = Array.tabulate(64)(i => 0.3f - 0.01f * i)
    val v2 = Array.tabulate(64)(i => -0.2f + 0.012f * i)
    val df = Seq((0L, v1), (1L, v1), (2L, v2), (3L, v2.map(-_)))
      .toDF("vec_id", "embedding")
    val res = Similarity.lshBucketTopK(df.filter(col("vec_id") === 0), df,
        "vec_id", "embedding", k = 3, planes = 4, dim = 64)
      .collect().map(r => (r.getAs[Long]("cand_id"), r.getAs[Long]("rank")))
    assert(res.contains((1L, 1L))) // the exact twin is bucket-mate and rank 1
  }

  test("leakage-safe split: a near-dup pair NEVER spans the train/eval boundary") {
    val s = spark
    import s.implicits._
    // 60 docs: ids (i, i+100) share text → guaranteed near-dup pairs
    val df = (1L to 30L).flatMap(i =>
      Seq((i, s"alpha beta gamma delta doc$i"), (i + 100, s"alpha beta gamma delta doc$i")))
      .toDF("doc_id", "text")
    val comps = Dedup.minhashLshComponents(df, "doc_id", "text", 8, bands = 2)
    val split = comps.withColumn("split",
      when(substring(md5(col("component").cast("string")), 1, 1) < "c", "train")
        .otherwise("eval"))
    val byDoc = split.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // SAME banding as the components — the invariant is "no pair OF THE
    // BLOCKING THAT DEFINED THE CLUSTERS spans the boundary"; a different
    // banding is a different near-dup relation
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text", numHashes = 8, bands = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) == byDoc(b), s"pair ($a,$b) split ${byDoc(a)}/${byDoc(b)}")
    }
    // the draw actually splits (both labels occur across the 30+ clusters)
    assert(byDoc.values.toSet == Set("train", "eval"))
  }

  test("langid picks the dominant marker class") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "join merge sort join"), (2L, "the a the fast"), (3L, "spark vector hash"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "sql", 2L -> "en", 3L -> "ml"))
  }

  test("connected components label a chain to its minimum and leave isolates alone") {
    val s = spark
    import s.implicits._
    // chain 5-3-9-7 (diameter 3 forces multiple propagation rounds),
    // pair (2,4), isolate 1
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 7L, 9L).toDF("doc_id")
    val pairs = Seq((3L, 5L), (3L, 9L), (7L, 9L), (2L, 4L)).toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 2L, 4L -> 2L, 3L -> 3L, 5L -> 3L, 9L -> 3L, 7L -> 3L)
    // default: the gated driver union-find fast path
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    // threshold 0: the distributed pointer-jumped propagation loop
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try {
      val dist = Dedup.connectedComponents(nodes, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == want)
    } finally spark.conf.unset("spark.graft.components.localThreshold")
    // empty nodes frame: empty labels, no NPE from the convergence sum
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try assert(Dedup.connectedComponents(
        nodes.filter(lit(false)), "doc_id", pairs).count() == 0)
    finally spark.conf.unset("spark.graft.components.localThreshold")
  }

  test("components match a union-find oracle on random graphs and a 150-node chain") {
    val s = spark
    import s.implicits._
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = Array.tabulate(n.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    }
    val rnd = new scala.util.Random(7)
    val cases = (1 to 4).map { _ =>
      val n = 20 + rnd.nextInt(20)
      val edges = Seq.fill(rnd.nextInt(30))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      (n, edges)
    } :+ (150, (0L until 149L).map(i => (i, i + 1))) // chain: diameter 149
    cases.foreach { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      // force the DISTRIBUTED loop (the driver fast path IS a union-find —
      // comparing it against the oracle would be vacuous)
      spark.conf.set("spark.graft.components.localThreshold", "0")
      val got = try Dedup.connectedComponents(nodes, "doc_id", pairs)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("spark.graft.components.localThreshold")
      assert(got == unionFind(n, edges),
        s"n=$n edges=${edges.size}: pointer-jumped propagation must equal union-find")
      val local = Dedup.connectedComponents(nodes, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == got, s"n=$n: driver fast path diverged from the distributed loop")
    }
  }

  test("collapsing exact duplicates before LSH components preserves the result") {
    val s = spark
    import s.implicits._
    // duplicate every doc's text under new higher ids — at crawl scale this
    // is the dominant shape, and contraction must not change any label
    val base = docs.select(col("doc_id"), col("text"))
    val dupes = base.select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val corpus = base.unionByName(dupes)
    val plain = Dedup.minhashLshComponents(corpus, "doc_id", "text", 8, 2)
    val collapsed = Dedup.minhashLshComponents(corpus, "doc_id", "text", 8, 2,
      collapseExact = true)
    assert(collapsed.count() == corpus.count())
    assert(plain.exceptAll(collapsed).isEmpty && collapsed.exceptAll(plain).isEmpty)
  }

  test("driver union-find fast path equals the distributed fixpoint (same labels)") {
    // default threshold routes this small corpus to the driver union-find;
    // forcing threshold 0 runs the distributed bipartite propagation loop —
    // the two must produce identical (id, component) labels
    val local = Dedup.minhashLshComponents(docs, "doc_id", "text", 8, 2)
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try {
      val dist = Dedup.minhashLshComponents(docs, "doc_id", "text", 8, 2)
      assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty,
        "local and distributed component paths diverged")
    } finally spark.conf.unset("spark.graft.components.localThreshold")
  }

  test("distributed fixpoint on a corpus with NO shared buckets: every doc its own component") {
    // regression: the singleton-bucket filter leaves the active label table
    // EMPTY on a fully-unique corpus, and the loop's convergence sum over
    // an empty frame is null — this NPE'd before the early return (the
    // normal case for a near-dup-free corpus above the local threshold)
    val s = spark
    import s.implicits._
    val unique = Seq((1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"),
      (3L, "kk ll mm nn oo")).toDF("doc_id", "text")
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try {
      val out = Dedup.minhashLshComponents(unique, "doc_id", "text", 8, 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    } finally spark.conf.unset("spark.graft.components.localThreshold")
  }

  test("components of the LSH pair graph partition the corpus and respect pair edges") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2)
    val comp = Dedup.minhashLshComponents(docs, "doc_id", "text", 8, 2).cache()
    assert(comp.count() == docs.count())
    // bucket-bipartite propagation reaches the same fixpoint as edge-wise
    // propagation over the materialized pair set
    val viaPairs = Dedup.connectedComponents(docs, "doc_id", pairs)
    assert(comp.exceptAll(viaPairs).isEmpty && viaPairs.exceptAll(comp).isEmpty)
    // every pair's two endpoints carry the same component label
    val broken = pairs.as("p")
      .join(comp.as("x"), col("p.id_a") === col("x.doc_id"))
      .join(comp.as("y"), col("p.id_b") === col("y.doc_id"))
      .filter(col("x.component") =!= col("y.component"))
    assert(broken.count() == 0)
    // a component's label is a member of the component
    val labelNotMember = comp.as("c").join(comp.as("m"),
        col("c.component") === col("m.doc_id"), "left_anti")
    assert(labelNotMember.count() == 0)
  }

  test("two-phase components converge on an adversarial chain where hash-to-min exhausts its budget") {
    val s = spark
    import s.implicits._
    // skewed fixture: a 3000-node chain (diameter 2999) + one giant star
    // cluster (hub 10000 with 500 spokes) + isolates. Hash-to-min covers at
    // most ~2^k hops in k rounds (one neighbor hop + one pointer jump per
    // round), so 10 rounds cannot traverse the chain — the convergence
    // guard must throw; large-star/small-star collapses the same graph
    // within the default budget.
    val chain = (0L until 2999L).map(i => (i, i + 1))
    val star = (1L to 500L).map(i => (10000L, 10000L + i))
    val nodeIds = (0L until 3000L) ++ (10000L to 10500L) ++ Seq(99999L)
    val nodes = nodeIds.toDF("doc_id")
    val pairs = (chain ++ star).toDF("id_a", "id_b")
    // the budget-exhaustion and convergence contracts are the DISTRIBUTED
    // loops' (the driver fast paths have no rounds to exhaust)
    spark.conf.set("spark.graft.components.localThreshold", "0")
    val got = try {
      intercept[IllegalStateException] {
        Dedup.connectedComponents(nodes, "doc_id", pairs, maxIters = 10)
      }
      Dedup.twoPhaseComponents(nodes, "doc_id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally spark.conf.unset("spark.graft.components.localThreshold")
    val want = ((0L until 3000L).map(_ -> 0L) ++
      (10000L to 10500L).map(_ -> 10000L) ++ Seq(99999L -> 99999L)).toMap
    assert(got == want)
    // the gated contraction-init + driver union-find finish reaches the
    // same fixpoint on the same adversarial graph
    val fast = Dedup.twoPhaseComponents(nodes, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want, "driver-finish path diverged from the distributed contraction")
  }

  test("foreign pair endpoints: conduits for star contraction, inert for hash-to-min — on both paths") {
    val s = spark
    import s.implicits._
    // X = 50 is NOT a node; a-X, X-b bridges a and b in the EDGE-REWRITING
    // contraction (X is a graph vertex there, and its id joins the
    // component min), while label propagation ignores it (labels exist
    // only for nodes — X neither receives nor relays one)
    val nodes = Seq(60L, 70L, 80L).toDF("doc_id")
    val pairs = Seq((60L, 50L), (50L, 70L)).toDF("id_a", "id_b")
    val wantTwoPhase = Map(60L -> 50L, 70L -> 50L, 80L -> 80L)
    val wantHashMin = Map(60L -> 60L, 70L -> 70L, 80L -> 80L)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver fast paths (default gates)
    assert(collect(Dedup.twoPhaseComponents(nodes, "doc_id", pairs)) == wantTwoPhase)
    assert(collect(Dedup.connectedComponents(nodes, "doc_id", pairs)) == wantHashMin)
    // distributed loops (gates closed) — each fast path must mirror ITS loop
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try {
      assert(collect(Dedup.twoPhaseComponents(nodes, "doc_id", pairs)) == wantTwoPhase)
      assert(collect(Dedup.connectedComponents(nodes, "doc_id", pairs)) == wantHashMin)
    } finally spark.conf.unset("spark.graft.components.localThreshold")
  }

  test("two-phase components equal hash-to-min on random graphs and the real LSH pair graph") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val n = 25 + rnd.nextInt(25)
      val edges = Seq.fill(rnd.nextInt(40))((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val nodes = (0L until n.toLong).toDF("doc_id")
      val pairs = edges.toDF("id_a", "id_b")
      // force both DISTRIBUTED loops — with the driver gates open this
      // comparison would be union-find vs union-find, i.e. vacuous
      spark.conf.set("spark.graft.components.localThreshold", "0")
      try {
        val a = Dedup.connectedComponents(nodes, "doc_id", pairs)
        val b = Dedup.twoPhaseComponents(nodes, "doc_id", pairs)
        assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
          s"n=$n edges=${edges.size}: two-phase must equal pointer-jumped propagation")
      } finally spark.conf.unset("spark.graft.components.localThreshold")
    }
    val lshPairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2)
    spark.conf.set("spark.graft.components.localThreshold", "0")
    val (a, b) = try {
      (Dedup.connectedComponents(docs, "doc_id", lshPairs).cache(),
       Dedup.twoPhaseComponents(docs, "doc_id", lshPairs))
    } finally spark.conf.unset("spark.graft.components.localThreshold")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and the default (gated driver-finish) path agrees on the real graph
    val c = Dedup.twoPhaseComponents(docs, "doc_id", lshPairs)
    assert(a.exceptAll(c).isEmpty && c.exceptAll(a).isEmpty)
  }

  test("band-star contraction: components equal the full LSH pair graph's, at membership-bounded size") {
    val lshPairs = Dedup.minhashLshPairs(docs, "doc_id", "text", 8, 2)
    val stars = Dedup.minhashLshBandStars(docs, "doc_id", "text", 8, 2)
    // the whole point of the contraction: star edges are bounded by
    // membership rows (|docs| × bands), never clique-quadratic
    assert(stars.count() <= docs.count() * 2, "star set must be membership-bounded")
    val want = Dedup.twoPhaseComponents(docs, "doc_id", lshPairs).cache()
    // the catalog's ns64 shape — contracted feed, driver-finish open
    val viaStars = Dedup.twoPhaseComponents(docs, "doc_id", stars, contractedPairs = true)
    assert(want.exceptAll(viaStars).isEmpty && viaStars.exceptAll(want).isEmpty,
      "star-fed driver finish diverged from the clique pair graph's components")
    // the distributed contraction loop over the star feed (the 100 TB
    // path — driver gates closed) reaches the same fixpoint
    spark.conf.set("spark.graft.components.localThreshold", "0")
    try {
      val dist = Dedup.twoPhaseComponents(docs, "doc_id", stars, contractedPairs = true)
      assert(want.exceptAll(dist).isEmpty && dist.exceptAll(want).isEmpty,
        "star-fed distributed loop diverged from the clique pair graph's components")
    } finally spark.conf.unset("spark.graft.components.localThreshold")
  }

  test("repetition metrics expose duplicated words and bigrams") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a a a b"),     // 4 words, 2 distinct; top 'a' 3/4; bigrams: "a a","a a","a b" → 3 total 2 distinct
      (2L, "x y z w"),     // no repetition
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) == 4 && m(1L).getLong(2) == 2)
    assert(m(1L).getDouble(3) == 0.5 && m(1L).getDouble(4) == 0.75)
    assert(m(1L).getDouble(5) == 1.0 / 3.0)
    assert(m(2L).getDouble(3) == 0.0 && m(2L).getDouble(5) == 0.0)
  }

  test("repetition metrics keep degenerate-width docs (scan-only form), word stats exact") {
    // the r15 scan-only rewrite's documented divergence from the old
    // explode form: a sub-2-word doc has no bigrams, so its ratio is NULL
    // (nullif guard — ANSI mode would RAISE on the unguarded 0/0, not
    // yield NaN) and the ROW SURVIVES (the explode form's inner join
    // dropped it). The corpus floor is 10 words, so the oracle never sees
    // this; the pin makes the behavior deliberate, not accidental.
    val s = spark
    import s.implicits._
    val df = Seq((1L, "solo"), (2L, "a a")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 2L), "degenerate-width docs must survive")
    assert(m(1L).getLong(1) == 1 && m(1L).getLong(2) == 1)
    assert(m(1L).getDouble(3) == 0.0 && m(1L).getDouble(4) == 1.0)
    assert(m(1L).isNullAt(5), "0 bigrams -> NULL ratio, row kept")
    // 2-word doc: one bigram, duplicated word
    assert(m(2L).getLong(1) == 2 && m(2L).getLong(2) == 1)
    assert(m(2L).getDouble(3) == 0.5 && m(2L).getDouble(5) == 0.0)
  }

  test("repetition metrics drop NULL-text docs (old row-set semantics, oracle parity)") {
    // words(NULL) is a NULL array → a row of all-NULL word stats, which
    // the old explode+inner-join form never emitted and the DuckDB
    // oracle's unnest shape drops; the operator filters NULL text up
    // front so the row set stays the explode form's (ADVICE r15). An
    // EMPTY string is not null — split("") = [""], one "word" — and keeps
    // its row.
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a a b"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 3L), "null-text doc must be dropped, empty-text kept")
    assert(m(1L).getLong(1) == 3 && m(1L).getLong(2) == 2)
  }

  test("contamination screen flags only documents sharing a probe n-gram") {
    val s = spark
    import s.implicits._
    val docsDf = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "nothing in common here at all"),
      (3L, "a quick brown fox appears twice quick brown fox yes"),
    ).toDF("doc_id", "text")
    val probes = Seq("quick brown fox").toDF("ptext")
    val hits = TextAnalysis.contaminationScreen(docsDf, "doc_id", "text", probes, "ptext", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(1L -> 1L, 3L -> 1L))
  }

  test("contamination family: row-local and join paths agree, empty probes are empty/zero") {
    val s = spark
    import s.implicits._
    val docsDf = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "nothing in common here at all"),
      (3L, "a quick brown fox appears twice quick brown fox yes"),
      (4L, "xy"), // shorter than n — drops from the score, never screens
    ).toDF("doc_id", "text")
    val probes = Seq("quick brown fox", "common here at all").toDF("ptext")
    def screen() = TextAnalysis
      .contaminationScreen(docsDf, "doc_id", "text", probes, "ptext", 3)
    def score() = TextAnalysis
      .containmentScore(docsDf, "doc_id", "text", probes, "ptext", 3)
    val (screenLocal, scoreLocal) = (screen().collect().toSet, score().collect().toSet)
    // force the >gate broadcast-join path: identical answers by contract
    spark.conf.set("spark.graft.probes.rowLocalThreshold", "0")
    try {
      assert(screen().collect().toSet == screenLocal,
        "screen: join path diverged from the row-local path")
      assert(score().collect().toSet == scoreLocal,
        "score: join path diverged from the row-local path")
    } finally spark.conf.unset("spark.graft.probes.rowLocalThreshold")
    // and the screen's contains-gate boundary: probes under the walk gate
    // but over containsThreshold route to the join path — same answers
    spark.conf.set("spark.graft.probes.containsThreshold", "0")
    try assert(screen().collect().toSet == screenLocal,
      "screen: the over-containsThreshold route diverged")
    finally spark.conf.unset("spark.graft.probes.containsThreshold")
    // empty probe set: nothing screens, every scored doc has zero hits
    val none = Seq.empty[String].toDF("ptext")
    assert(TextAnalysis.contaminationScreen(
      docsDf, "doc_id", "text", none, "ptext", 3).count() == 0)
    val zs = TextAnalysis.containmentScore(
        docsDf, "doc_id", "text", none, "ptext", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(zs == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("duplicate-span stats count only cross-document spans, exactly once per doc") {
    val s = spark
    import s.implicits._
    val docsDf = Seq(
      (1L, "a b c d"),            // spans: "a b c", "b c d"
      (2L, "x a b c y"),          // spans: "x a b", "a b c", "b c y"
      (3L, "p q r"),              // span: "p q r" — unique to doc 3
      (4L, "a b c a b c d"),      // repeats "a b c" internally: distinct once
      (5L, "zz"),                 // shorter than n: no spans, drops
    ).toDF("doc_id", "text")
    val stats = TextAnalysis.duplicateSpanStats(docsDf, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "a b c" is shared by docs 1, 2, 4; "b c d" by docs 1 and 4
    assert(stats(1L) == ((2L, 2L)))
    assert(stats(2L) == ((3L, 1L)))
    assert(stats(3L) == ((1L, 0L)))
    // doc 4 spans: "a b c"(×2→1), "b c a", "c a b", "b c d"... "b c d" is
    // ALSO in doc 1 → 2 dup spans of 4 distinct
    assert(stats(4L) == ((4L, 2L)))
    assert(!stats.contains(5L))
  }

  test("duplicate-span stats: all plan variants agree (solo ≡ window ≡ join)") {
    // the production (window) plan and both A/B arms (solo-count, join)
    // must stay value-identical — the 20 M-doc race in SCALE.md is a fair
    // race only if every arm computes the same contract, and a semantics
    // fix to one arm must break this spec rather than silently fork them.
    // ScaleSmoke.corpus has no duplicate clusters below ~20 k docs (seed
    // collapse needs doc_id ≥ 4096 on a %20 grid), so duplicates are
    // constructed: full copies of docs 0–499 under new ids, plus partial
    // duplicates (a copied doc's text + a unique doc's text) — all three
    // regimes (all-dup, no-dup, mixed) present by construction
    val base = graft.ScaleSmoke.corpus(spark, 1500)
    val copies = base.filter(col("doc_id") < 500)
      .select((col("doc_id") + 10000).as("doc_id"), col("source"), col("text"))
    val partials = base.filter(col("doc_id") < 100).as("a")
      .join(base.filter(col("doc_id").between(1000, 1099)).as("b"),
        col("a.doc_id") + 1000 === col("b.doc_id"))
      .select((col("a.doc_id") + 20000).as("doc_id"), col("a.source"),
        concat(col("a.text"), lit(" "), col("b.text")).as("text"))
    val docs = base.unionAll(copies).unionAll(partials)
      .withColumnRenamed("doc_id", "id")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    val solo = canon(TextAnalysis.duplicateSpanStatsSolo(docs, "id", "text", 3))
    val window = canon(TextAnalysis.duplicateSpanStatsWindow(docs, "id", "text", 3))
    val join = canon(TextAnalysis.duplicateSpanStatsJoin(docs, "id", "text", 3))
    // the fixture must exercise both regimes: some duplicated spans, some
    // docs not fully duplicated — otherwise agreement proves nothing
    assert(solo.nonEmpty && solo.exists(_._3 > 0) && solo.exists(r => r._3 < r._2))
    assert(solo == window)
    assert(solo == join)
  }

  test("source-mix sample water-fills on the binding source and draws deterministically") {
    val s = spark
    import s.implicits._
    // a: 10 rows, b: 40, c: 100; targets 50/25/25 → binding source is a
    // (10/0.5 = 20), so the feasible corpus is 20: quotas 10/5/5
    val docsDf = (0 until 10).map(i => (s"a$i", "a")) ++
      (0 until 40).map(i => (s"b$i", "b")) ++
      (0 until 100).map(i => (s"c$i", "c"))
    val df = docsDf.toDF("id", "src")
    val mixed = TextAnalysis.sampleToMix(df, "src", "id",
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val bySrc = mixed.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 10L, "b" -> 5L, "c" -> 5L))
    // deterministic: the draw is a function of the ids, not partitioning
    val again = TextAnalysis.sampleToMix(df.repartition(7), "src", "id",
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    assert(mixed.orderBy("src", "id").collect().toSeq ==
      again.orderBy("src", "id").collect().toSeq)
    // a target source absent from the data binds the corpus to zero (its
    // rows "run out" immediately), and the plan carries no driver-side
    // counts action — the quota bound is an in-plan one-row broadcast
    val none = TextAnalysis.sampleToMix(df, "src", "id",
      Seq("a" -> 0.5, "zz" -> 0.5))
    assert(none.count() == 0L)
  }

  test("pii redaction masks typed patterns and reports exact counts") {
    val s = spark
    import s.implicits._
    val docsDf = Seq(
      (1L, "mail alice@example.com and bob@test.org call +12025550147"),
      (2L, "server at 192.168.0.1 backup 10.0.0.254"),
      (3L, "no pii here at all"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docsDf, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("mail <email> and <email> call <phone>", 2L, 0L, 1L)))
    assert(out(2L) == (("server at <ip> backup <ip>", 0L, 2L, 0L)))
    assert(out(3L) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("dedup operators survive null and empty text without crashing") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "g", "a b c"), (2L, "g", ""), (3L, "g", null: String), (4L, "g", "a b c"))
      .toDF("doc_id", "grp", "text")
    assert(Dedup.exact(df, "doc_id", "text").count() >= 2)
    val lsh = Dedup.minhashLshPairs(df, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lsh.contains((1L, 4L))) // identical docs still pair; null/empty don't crash
    Dedup.simhashPairs(df, "doc_id", "text", Seq("grp"), 16).collect()
    Dedup.jaccardPairs(df, "doc_id", "text", Seq("grp"), 1, 0.5).collect()
    assert(Dedup.minhashLshComponents(df, "doc_id", "text").count() == 4)
  }

  test("rolling fingerprint is position-sensitive; set fingerprint is not") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val rh = TextAnalysis.rollingFingerprint(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rh(1L) == rh(3L) && rh(1L) != rh(2L))
    val setfp = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(setfp(1L) == setfp(2L)) // word order folded away by the set hash
  }

  test("resize stub keeps every stride-th byte, distributed") {
    val s = spark
    import s.implicits._
    val packed = Multimodal.packFromText(
      Seq((1L, "abcdefghij")).toDF("doc_id", "text"), "doc_id", "text", "image")
    val out = Multimodal.resizeStub(packed.as[Multimodal.MediaRow], stride = 3).collect()
    assert(new String(out.head.media, "UTF-8") == "adgj")
  }

  test("quality signals: exact counts, one division each") {
    val s = spark
    import s.implicits._
    val m = TextAnalysis.qualitySignals(Seq((1L, "ab cd!")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(m.getLong(1) == 2)
    assert(m.getDouble(2) == 2.5)        // (2 + 3) chars / 2 words
    assert(m.getDouble(3) == 1.0 / 6.0)  // one '!' in six chars
    assert(m.getDouble(4) == 0.5)        // "ab" alphabetic, "cd!" not
  }

  test("stratified sample draws exact per-stratum quotas, reproducibly") {
    val a = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 7)
    val counts = a.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(counts.nonEmpty && counts.forall(_._2 <= 7))
    val b = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 7)
    assert(a.select("lang", "doc_id").exceptAll(b.select("lang", "doc_id")).isEmpty)
  }

  test("stratified sampling is prefix-stable: smaller quotas are prefixes of larger ones") {
    val five = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 5)
      .select("lang", "doc_id")
    val nine = TextAnalysis.stratifiedSample(docs, "lang", "doc_id", 9)
      .select("lang", "doc_id")
    // growing the quota only ADDS rows — earlier draws never change,
    // so a pipeline can extend a sample without invalidating prior work
    assert(five.exceptAll(nine).isEmpty)
    assert(nine.count() > five.count())
  }

  test("sequence packing conserves tokens and keeps offsets under the budget") {
    val packed = TextAnalysis.packSequences(docs, "source", "doc_id",
      TextAnalysis.wsTokenCount(col("text")), budget = 200).cache()
    assert(packed.filter(col("bin_offset") >= 200 || col("bin_offset") < 0).count() == 0)
    // token totals survive packing exactly
    val before = docs.select(sum(TextAnalysis.wsTokenCount(col("text")))).head().getLong(0)
    assert(packed.select(sum(col("tokens"))).head().getLong(0) == before)
    // per group, offset(next) == (offset(prev) + tokens(prev)) mod-carried by bins
    val rows = packed.orderBy("source", "doc_id")
      .select("source", "tokens", "bin", "bin_offset").collect()
    rows.groupBy(_.getString(0)).values.foreach { grp =>
      grp.sliding(2).foreach {
        case Array(a, b) =>
          val cum = a.getLong(2) * 200 + a.getLong(3) + a.getLong(1)
          assert(b.getLong(2) * 200 + b.getLong(3) == cum)
        case _ =>
      }
    }
  }

  test("sequence packing: offsets advance by token counts and wrap at the budget") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "s", "a b c"),          // 3 tokens, bin 0 offset 0
      (2L, "s", "d e f g"),        // 4 tokens, bin 0 offset 3
      (3L, "s", "h i j k l"),      // 5 tokens: cum 7 → bin 0, offset 7 (straddles)
      (4L, "s", "m n"),            // cum 12 → bin 1, offset 2
    ).toDF("doc_id", "src", "text")
    val packed = TextAnalysis.packSequences(df, "src", "doc_id",
        TextAnalysis.wsTokenCount(col("text")), budget = 10)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(packed == Map(1L -> (0L, 0L), 2L -> (0L, 3L), 3L -> (0L, 7L), 4L -> (1L, 2L)))
  }

  test("sequence packing: composite (doc_id, chunk_id) order survives chunk counts " +
      "past any arithmetic-key cliff") {
    val s = spark
    import s.implicits._
    // chunk ids far beyond the 100 000 multiplier the old single-long key
    // used (doc_id*100000+chunk_id would interleave doc 1's high chunks
    // after doc 2's early ones); every chunk is 1 token so the running
    // offset equals the 0-based position in the correct tuple order
    val chunks = Seq(
      (1L, 0L), (1L, 99999L), (1L, 100000L), (1L, 250000L),
      (2L, 0L), (2L, 1L),
    ).map { case (d, c) => (d, c, "s", 1L) }
      .toDF("doc_id", "chunk_id", "src", "n_toks")
    val packed = TextAnalysis.packSequences(chunks, "src",
        Seq("doc_id", "chunk_id"), col("n_toks"), budget = 1000)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "bin_offset").collect()
    val expected = Seq(
      (1L, 0L, 0L), (1L, 99999L, 1L), (1L, 100000L, 2L), (1L, 250000L, 3L),
      (2L, 0L, 4L), (2L, 1L, 5L))
    assert(packed.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq == expected)
  }

  test("tfidf top terms: a term unique to one doc outscores corpus-wide terms") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "shared shared rare"),
      (2L, "shared common"),
      (3L, "shared common"),
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) == "rare") // df=1 beats tf=2 of the ubiquitous term (2*3/3=2 < 1*3/1=3)
    assert(top(2L) == "common" && top(3L) == "common")
  }
}
