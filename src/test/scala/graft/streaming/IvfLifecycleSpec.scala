package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The FULL streaming-IVF lifecycle as one loop — the end-to-end proof
  * the per-stage specs (AnnIngestSpec's stream ≡ batch assignment,
  * StoreLockSpec's swap semantics) compose: offline fit → published v1 →
  * streamed ingest against the live model → versioned refit over
  * batch+streamed codes → atomic pointer flip → search on v2, with the
  * superseded version still on disk for in-flight readers. */
class IvfLifecycleSpec extends SparkSpec {

  test("fit → stream-ingest → versioned refit → pointer-flip → search") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("ivf_store").toString

    val emb = graft.Tables(spark, sf0001).embeddings
    val snapshot = emb.filter(col("vec_id") < 300)

    // ---- publish v1: offline bounds + code-trained cells on the snapshot
    val m1 = IvfStore.publish(spark, dir, snapshot, "vec_id", "embedding", nCells = 8, iters = 2)
    assert(m1.centroids.length == 8 && m1.mn.length == 64)
    assert(IvfStore.codes(spark, dir).count() == 300)
    val v1 = Paths.get(dir).toFile.list().filter(_.matches("_v\\d+")).toSeq
    assert(v1.size == 1)

    // ---- stream-ingest the rest of the corpus against the LIVE model,
    // plus one exact copy of a known vector under a fresh id (the search
    // target); two micro-batches to prove the model is reused across them
    val probe = emb.filter(col("vec_id") === 42)
      .select("embedding").as[Seq[Float]].head()
    val tail = emb.filter(col("vec_id") >= 300)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => Vec(id, v) }
    val stream = MemoryStream[Vec]
    // writerId scopes the epoch-partition idempotence to this writer
    // incarnation, per the ingest contract (production passes the
    // streaming query id: stable across checkpoint-preserving restarts,
    // fresh when the checkpoint is wiped — here a UUID plays that role,
    // fixed before start so even a data-less first trigger sees it)
    val qid = java.util.UUID.randomUUID().toString
    val q = AnnIngest.assignCells(stream.toDF(), "embedding", m1.mn, m1.mx, m1.centroids)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IvfStore.ingest(dir, batch, "vec_id", batchId, qid)
      }
      .start()
    stream.addData(tail.take(100).toIndexedSeq)
    q.processAllAvailable()
    stream.addData(tail.drop(100).toIndexedSeq :+ Vec(9999L, probe))
    q.processAllAvailable()
    q.stop()
    assert(IvfStore.codes(spark, dir).count() == 300 + tail.length + 1)

    // redelivery is idempotent: foreachBatch is at-least-once, so a batch
    // replayed after a mid-write failure arrives again UNDER THE SAME
    // (writer, epoch) — re-ingesting batch 0's exact content must
    // overwrite its own partitions, not append duplicates
    IvfStore.ingest(dir,
      AnnIngest.assignCells(
        spark.createDataset(tail.take(100).toIndexedSeq).toDF(),
        "embedding", m1.mn, m1.mx, m1.centroids),
      "vec_id", batchId = 0L, writerId = qid)
    assert(IvfStore.codes(spark, dir).count() == 300 + tail.length + 1,
      "redelivered micro-batch duplicated rows instead of replacing itself")

    // streamed rows landed with the v1 model's cell assignment
    val storedCells = IvfStore.codes(spark, dir).filter(col("vec_id") >= 300)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expectCells = AnnIngest.assignCells(
        spark.createDataset(tail.toIndexedSeq :+ Vec(9999L, probe)).toDF(),
        "embedding", m1.mn, m1.mx, m1.centroids)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(storedCells == expectCells)

    // ---- search v1: queries are EXTERNAL, so no self-exclusion — the
    // stored vector 42 itself (the query's id-collision twin) and its
    // exact streamed copy 9999 carry identical codes and must rank 1-2 in
    // cand_id tie-break order (identical bounds → identical codes →
    // equal, maximal dot products)
    val queries = emb.filter(col("vec_id") === 42).select("vec_id", "embedding")
    val hits1 = IvfStore.search(spark, dir, queries, "vec_id", "embedding", k = 5)
      .orderBy("rank").collect()
    assert(hits1.length == 5)
    assert(hits1.take(2).map(_.getAs[Long]("cand_id")).toSeq == Seq(42L, 9999L),
      s"expected the stored original then the exact copy, got ${hits1.toSeq}")

    // ---- versioned refit: retrain cells on batch+streamed codes, land as
    // v2 via pointer flip; bounds carry over, data survives, the
    // superseded version stays on disk for in-flight readers
    val m2 = IvfStore.refit(spark, dir, nCells = 8, iters = 2)
    assert(m2.mn.toSeq == m1.mn.toSeq && m2.mx.toSeq == m1.mx.toSeq)
    val after = Paths.get(dir).toFile.list().filter(_.matches("_v\\d+")).toSeq
    assert(after.size == 2, s"expected v1 kept in the grace window, got $after")
    assert(after.map(_.stripPrefix("_v").toLong).max >
      v1.head.stripPrefix("_v").toLong)
    assert(IvfStore.codes(spark, dir).count() == 300 + tail.length + 1)

    // the refit model actually governs the new version: every stored cell
    // is the nearest cell of its code under m2
    val misassigned = IvfStore.codes(spark, dir)
      .withColumn("__expect",
        org.apache.spark.sql.graft.NearestCellsCodes.nearest(col("__q"), m2.centroids))
      .filter(col("cell") =!= col("__expect")).count()
    assert(misassigned == 0)

    // ---- search v2: the identical-code pair still leads, same order
    val hits2 = IvfStore.search(spark, dir, queries, "vec_id", "embedding", k = 5)
      .orderBy("rank").collect()
    assert(hits2.take(2).map(_.getAs[Long]("cand_id")).toSeq == Seq(42L, 9999L))

    // ---- a FRESH writer incarnation (wiped checkpoint: epochs restart
    // at 0) gets its own idempotence scope — its batch 0 must NOT
    // overwrite what any other writer's epoch 0 wrote
    val n2 = IvfStore.codes(spark, dir).count()
    IvfStore.ingest(dir,
      AnnIngest.assignCells(
        spark.createDataset(Seq(Vec(77777L, probe)).toIndexedSeq).toDF(),
        "embedding", m2.mn, m2.mx, m2.centroids),
      "vec_id", batchId = 0L, writerId = qid + "-respawn")
    assert(IvfStore.codes(spark, dir).count() == n2 + 1,
      "a fresh writer's epoch 0 clobbered another incarnation's rows")

    VersionedStore.deleteRecursively(dir)
  }

  test("publish → ingest → refit → search through an explicit file: scheme URI") {
    // the index store's per-epoch tmp-partition commit (list + rename per
    // cell) through FileContext.getFileContext(uri) — the resolution an
    // hdfs:// store takes; the schemeless test above rides the default FS
    val s = spark
    import s.implicits._
    val dir = "file:" + Files.createTempDirectory("ivf_uri").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    val m = IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", nCells = 4, iters = 2)
    val probe = emb.filter(col("vec_id") === 42)
      .select("embedding").as[Seq[Float]].head()
    IvfStore.ingest(dir,
      AnnIngest.assignCells(
        spark.createDataset(Seq(Vec(9999L, probe)).toIndexedSeq).toDF(),
        "embedding", m.mn, m.mx, m.centroids),
      "vec_id", batchId = 0L, writerId = "uri-writer")
    assert(IvfStore.codes(spark, dir).count() == 301)
    // replay of the same epoch replaces, never duplicates — the rename
    // protocol end-to-end over the URI
    IvfStore.ingest(dir,
      AnnIngest.assignCells(
        spark.createDataset(Seq(Vec(9999L, probe)).toIndexedSeq).toDF(),
        "embedding", m.mn, m.mx, m.centroids),
      "vec_id", batchId = 0L, writerId = "uri-writer")
    assert(IvfStore.codes(spark, dir).count() == 301)
    IvfStore.refit(spark, dir, nCells = 4, iters = 2)
    assert(IvfStore.codes(spark, dir).count() == 301,
      "refit over the URI lost or duplicated rows")
    // search end-to-end over the URI: the stored original and its
    // ingested twin surface with IDENTICAL integer dots (same code ⇒
    // same qsim — the property the store must preserve through
    // ingest-commit + refit-consolidation; rank ORDER among different
    // vectors is raw-dot, deliberately not asserted — the all-positive
    // code space lets a larger-norm candidate outrank an exact copy,
    // which is why the near-dup screen is nearDupIds, not top-k)
    val hits = IvfStore.search(spark, dir,
        emb.filter(col("vec_id") === 42), "vec_id", "embedding", k = 5)
      .collect().map(r => r.getAs[Long]("cand_id") -> r.getAs[Long]("qsim")).toMap
    assert(hits.contains(42L) && hits.contains(9999L),
      s"twin pair missing from top-5 over the URI store: ${hits.keySet}")
    assert(hits(42L) == hits(9999L), "identical codes must dot identically")
    VersionedStore.deleteRecursively(dir)
  }

  test("search prunes the code scan to the probed cells — literal partition filter") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("ivf_prune").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    val m = IvfStore.publish(spark, dir, emb, "vec_id", "embedding", nCells = 8, iters = 2)
    val query = emb.filter(col("vec_id") === 7).select("vec_id", "embedding")
    val probedCell = AnnIngest.assignCells(query, "embedding", m.mn, m.mx, m.centroids)
      .select("cell").head().getInt(0)

    // plan level: the codes scan carries a LITERAL cell partition filter
    // (collected from the driver-bounded probe set) — pruning does not
    // depend on DPP planning the equi-join as a dynamic filter
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try IvfStore.search(spark, dir, query, "vec_id", "embedding", k = 3)
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val scans = plan.collectWithSubqueries {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("codes")) => f
    }
    assert(scans.nonEmpty, "no parquet scan over the codes table found")
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "cell"))),
      s"codes scan must carry a cell partition filter, got " +
        scans.map(_.partitionFilters).mkString("; "))

    // in-flight (or crashed) ingest batches are INVISIBLE: a `.tmp`
    // writer partition containing garbage — planted in the PROBED cell,
    // so even a pruned search would die on it if the partition filter
    // ever regressed — is excluded by partition pruning, never read
    val codesRoot = Paths.get(VersionedStore.versionDir(dir), "codes")
    val tmpDir = codesRoot.resolve(s"cell=$probedCell").resolve("__b=crashed-7.tmp")
    Files.createDirectories(tmpDir)
    Files.write(tmpDir.resolve("part-torn.parquet"), "torn write".getBytes)
    assert(IvfStore.codes(spark, dir).count() == emb.count(),
      "a .tmp writer partition leaked into the reader view")
    assert(IvfStore.search(spark, dir, query, "vec_id", "embedding", k = 3)
      .count() == 3)

    // physical level: poison every OTHER cell's partition with a corrupt
    // parquet file — a search that reads ANY unprobed cell dies on it, so
    // a passing search PROVES only the probed cell's files were read
    val cells = Files.list(codesRoot)
    try cells.forEach { c =>
      val name = c.getFileName.toString
      if (name.startsWith("cell=") && name != s"cell=$probedCell") {
        val leaf = Files.list(c)
        val sub = try leaf.findFirst().orElse(c) finally leaf.close()
        Files.write(sub.resolve("part-junk.parquet"),
          "not a parquet file".getBytes)
      }
    } finally cells.close()
    // the poison is potent: an unpruned full-table read fails on it
    intercept[Exception] { IvfStore.codes(spark, dir).count() }
    // ...but the nProbe=1 search never touches those partitions
    val hits = IvfStore.search(spark, dir, query, "vec_id", "embedding", k = 3)
      .orderBy("rank").collect()
    assert(hits.nonEmpty && hits.head.getAs[Long]("cand_id") == 7L)

    VersionedStore.deleteRecursively(dir)
  }

  test("a replay straddling a refit: search stays duplicate-free, next refit restores one row per vector") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("ivf_soak").toString
    val ckpt = Files.createTempDirectory("ivf_soak_ckpt").toString
    val emb = graft.Tables(spark, sf0001).embeddings

    val m1 = IvfStore.publish(spark, dir,
      emb.filter(col("vec_id") < 200), "vec_id", "embedding", nCells = 4, iters = 2)
    val tail = emb.filter(col("vec_id") >= 200 && col("vec_id") < 260)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => Vec(id, v) }

    // a sink that INGESTS then fails — the write is on disk, the epoch is
    // NOT committed to the checkpoint, so the restart must redeliver it
    val stream = MemoryStream[Vec]
    val writerId = "soak-writer" // production: the (restart-stable) query id
    @volatile var injectFailure = true
    val sink = (batch: org.apache.spark.sql.DataFrame, batchId: Long) => {
      IvfStore.ingest(dir, batch, "vec_id", batchId, writerId)
      if (batchId == 1 && injectFailure) {
        injectFailure = false
        throw new RuntimeException("injected post-write pre-commit failure")
      }
    }
    def start() = AnnIngest
      .assignCells(stream.toDF(), "embedding", m1.mn, m1.mx, m1.centroids)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(sink).start()

    val q1 = start()
    stream.addData(tail.take(30).toIndexedSeq)
    q1.processAllAvailable()
    stream.addData(tail.drop(30).toIndexedSeq)
    intercept[Exception] { q1.processAllAvailable() } // batch 1 written, then failed
    q1.stop()
    assert(IvfStore.codes(spark, dir).count() == 260)

    // the refit lands BETWEEN failure and replay: batch 1's first attempt
    // is consolidated under __b=fit in the NEW version — the one
    // redelivery window the per-epoch overwrite cannot cover
    IvfStore.refit(spark, dir, nCells = 4, iters = 2)
    assert(IvfStore.codes(spark, dir).count() == 260)

    // restart from the same checkpoint: batch 1 redelivers and lands as a
    // fresh epoch partition BESIDE its consolidated copy
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val total = IvfStore.codes(spark, dir).count()
    val uniq = IvfStore.codes(spark, dir).select("vec_id").distinct().count()
    assert(uniq == 260 && total == 290,
      s"replay must duplicate exactly its own 30 rows, got total=$total uniq=$uniq")
    // the duplicates are EXACT copies at the code level (same bounds →
    // same __q), which is what makes refit's any-copy dedup correct
    assert(IvfStore.codes(spark, dir).dropDuplicates("vec_id", "__q").count() == 260)

    // in the acknowledged window, search must not spend two top-k slots
    // on one vector (the rankCodes tie-dedup)
    val qdf = emb.filter(col("vec_id") === 235).select("vec_id", "embedding")
    val hits = IvfStore.search(spark, dir, qdf, "vec_id", "embedding", k = 10)
      .collect()
    val cands = hits.map(_.getAs[Long]("cand_id"))
    assert(cands.distinct.length == cands.length,
      s"duplicate cand_ids in top-k: ${cands.toSeq}")
    assert(hits.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to hits.length),
      "ranks must stay contiguous after the tie dedup")

    // the NEXT refit restores the one-row-per-vector invariant
    IvfStore.refit(spark, dir, nCells = 4, iters = 2)
    assert(IvfStore.codes(spark, dir).count() == 260)

    VersionedStore.deleteRecursively(dir)
    VersionedStore.deleteRecursively(ckpt)
  }

  test("ingest refuses a writerId Spark's partition writer would escape") {
    // ':' (and '=', '%', ...) are written as %3A in partition paths, so
    // the commit rename would never find the literal __b dir and the
    // batch would sit invisibly in .tmp forever — silent loss; refuse up
    // front
    val s0 = spark
    import s0.implicits._
    val dir = Files.createTempDirectory("ivf_writerid").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    val m = IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 50),
      "vec_id", "embedding", nCells = 4, iters = 1)
    val assigned = AnnIngest.assignCells(
      emb.filter(col("vec_id") === 60), "embedding", m.mn, m.mx, m.centroids)
    val e = intercept[IllegalArgumentException] {
      IvfStore.ingest(dir, assigned, "vec_id", 0L, writerId = "query:1")
    }
    assert(e.getMessage.contains("writerId"), e.getMessage)
    VersionedStore.deleteRecursively(dir)
  }

  test("ingest fences stale-model assignments across a refit") {
    val s0 = spark
    import s0.implicits._
    val dir = Files.createTempDirectory("ivf_fence").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", nCells = 4, iters = 1)
    val (v1, m1) = IvfStore.versionedModel(spark, dir)
    // a refit lands between the caller's assignment and its ingest
    IvfStore.refit(spark, dir, nCells = 4, iters = 1)
    val assigned = AnnIngest.assignCells(
      emb.filter(col("vec_id") === 150), "embedding", m1.mn, m1.mx, m1.centroids)
    val e = intercept[IllegalStateException] {
      IvfStore.ingest(dir, assigned, "vec_id", 0L, "w", Some(v1))
    }
    assert(e.getMessage.contains("re-assign"), e.getMessage)
    // nothing landed
    assert(IvfStore.codes(spark, dir).filter(col("vec_id") === 150).count() == 0)
    // against the CURRENT version the same ingest goes through
    val (v2, m2) = IvfStore.versionedModel(spark, dir)
    assert(v2 != v1)
    IvfStore.ingest(dir, AnnIngest.assignCells(
        emb.filter(col("vec_id") === 150), "embedding", m2.mn, m2.mx, m2.centroids),
      "vec_id", 0L, "w", Some(v2))
    assert(IvfStore.codes(spark, dir).filter(col("vec_id") === 150).count() == 1)
    VersionedStore.deleteRecursively(dir)
  }

  test("an all-zero stored code never passes the near-dup screen (0 >= 0 degenerate)") {
    val s0 = spark
    import s0.implicits._
    val dir = Files.createTempDirectory("ivf_zerocode").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    val m = IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 100),
      "vec_id", "embedding", nCells = 1, iters = 1) // one cell: every probe hits it
    // a drifted vector saturating the published lower bounds quantizes to
    // the all-zero code; plant it directly as an ingested row
    val zero = Seq((9000L, Array.fill[Byte](m.mn.length)(0), 0))
      .toDF("vec_id", "__q", "cell")
    IvfStore.ingest(dir, zero, "vec_id", 0L, "zerowriter")
    // a query with NO genuine near-dup at an impossible threshold: the
    // unguarded cosine degenerated to 0 >= 0 against the zero code and
    // marked the query a near-duplicate
    val q = emb.filter(col("vec_id") === 50).select("vec_id", "embedding")
    val hits = IvfStore.nearDupIds(spark, dir, q, "vec_id", "embedding",
      threshold = 2.0) // cosine can never reach 2 — only a degenerate passes
    assert(hits.isEmpty, "zero-norm code passed the near-dup screen")
    VersionedStore.deleteRecursively(dir)
  }
}
