package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online semantic dedup: arrivals screened against the published IVF
  * index, near-dups of indexed vectors dropped, novel vectors ingested —
  * and because survivors land in the same index, a duplicate arriving in
  * a LATER batch is screened by its EARLIER twin. */
class SemanticDedupStreamSpec extends SparkSpec {

  test("stream screen drops indexed near-dups, collapses exact in-batch copies, ingests novels") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val dir = Files.createTempDirectory("semdedup_store").toString

    val emb = graft.Tables(spark, sf0001).embeddings
    val snapshot = emb.filter(col("vec_id") < 300)
    IvfStore.publish(spark, dir, snapshot, "vec_id", "embedding", nCells = 4, iters = 2)

    // fixture arrivals, all with fresh ids ≥ 1000:
    //  - 1000: exact copy of indexed vec 42          -> dropped (screen)
    //  - 1001/1002: identical novel vector, twice    -> 1001 kept, 1002 collapsed
    //  - 1003: copy of indexed vec 7                 -> dropped (screen)
    //  - 1004: another novel vector                  -> kept
    val v42 = emb.filter(col("vec_id") === 42).select("embedding").as[Seq[Float]].head()
    val v7 = emb.filter(col("vec_id") === 7).select("embedding").as[Seq[Float]].head()
    val novelA = emb.filter(col("vec_id") === 310).select("embedding").as[Seq[Float]].head()
    val novelB = emb.filter(col("vec_id") === 311).select("embedding").as[Seq[Float]].head()

    val stream = MemoryStream[Vec]
    val ckpt = Files.createTempDirectory("semdedup_ckpt").toString
    val q = SemanticDedupStream.run(stream.toDF(), dir, "vec_id", "embedding",
      threshold = 0.95, checkpointDir = ckpt)
    stream.addData(Vec(1000L, v42), Vec(1001L, novelA), Vec(1002L, novelA),
      Vec(1003L, v7), Vec(1004L, novelB))
    q.processAllAvailable()

    val afterB0 = IvfStore.codes(spark, dir)
      .filter(col("vec_id") >= 1000L).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterB0 == Set(1001L, 1004L),
      s"batch 0 should ingest exactly the two novel vectors, got $afterB0")

    // a LATER batch re-sending novelA under yet another id is now a
    // near-dup of the INDEXED 1001 (ingested by batch 0) — the screen
    // tightens as the stream runs; a genuinely new vector still lands
    val novelC = emb.filter(col("vec_id") === 312).select("embedding").as[Seq[Float]].head()
    stream.addData(Vec(2000L, novelA), Vec(2001L, novelC))
    q.processAllAvailable()
    q.stop()

    val afterB1 = IvfStore.codes(spark, dir)
      .filter(col("vec_id") >= 1000L).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterB1 == Set(1001L, 1004L, 2001L),
      s"batch 1 must drop the twin of the batch-0 survivor, got $afterB1")

    // replayed epoch (at-least-once): same (writer, batch) re-ingests its
    // own partitions, never duplicates — and the screen re-run against
    // the now-larger store still yields the same survivors
    val replay = Seq(Vec(1000L, v42), Vec(1001L, novelA), Vec(1002L, novelA),
      Vec(1003L, v7), Vec(1004L, novelB)).toDF()
    SemanticDedupStream.ingestDeduped(spark, dir, replay, "vec_id", "embedding",
      threshold = 0.95, batchId = 0L, writerId = "semdedup")
    val afterReplay = IvfStore.codes(spark, dir).filter(col("vec_id") >= 1000L).count()
    assert(afterReplay == 3, s"replay must not duplicate rows, got $afterReplay")

    // batch ≡ stream: the pure screen on batch 0's frame returns exactly
    // the stream's survivors (1002 collapsed onto 1001, 1000/1003 dropped)
    // when run against a store WITHOUT batch 0's survivors
    val dir2 = Files.createTempDirectory("semdedup_store2").toString
    IvfStore.publish(spark, dir2, snapshot, "vec_id", "embedding", nCells = 4, iters = 2)
    val surv = SemanticDedupStream.screen(spark, dir2, replay,
        "vec_id", "embedding", threshold = 0.95)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(1001L, 1004L))

    VersionedStore.deleteRecursively(dir)
    VersionedStore.deleteRecursively(dir2)
  }

  test("two concurrent writers + a refit: no lost updates, replay stays idempotent") {
    // the multi-writer contract (SemanticDedupStream.run's writerId doc):
    // two streams with DISTINCT writerIds share one store, their ingests
    // interleave under the store lock, a refit lands mid-soak — and the
    // store must end with every writer's every batch present exactly
    // once. threshold 0.9999 keeps the screen out of the picture (only
    // exact copies screen), so the expected survivor set is deterministic
    // under any interleaving.
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("semdedup_2w").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", nCells = 4, iters = 2)

    // 40 distinct novel vectors (indexed rows carry ids < 300; these are
    // re-keyed), 4 batches of 5 per writer
    val novels = emb.filter(col("vec_id") >= 310 && col("vec_id") < 350)
      .orderBy("vec_id").select("embedding").as[Seq[Float]].collect()
    def batchDf(writerBase: Long, b: Int, off: Int) =
      (0 until 5).map(i => Vec(writerBase + b * 5 + i, novels(off + b * 5 + i))).toDF()

    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def writer(name: String, base: Long, off: Int) = new Thread(() => {
      try (0 until 4).foreach { b =>
        barrier.await(30, java.util.concurrent.TimeUnit.SECONDS) // force interleaving per epoch
        SemanticDedupStream.ingestDeduped(spark, dir, batchDf(base, b, off),
          "vec_id", "embedding", threshold = 0.9999, batchId = b.toLong,
          writerId = name)
        if (name == "wA" && b == 1) // mid-soak refit between epochs
          IvfStore.refit(spark, dir, nCells = 4, iters = 2)
      } catch { case t: Throwable => failures.add(t) }
    })
    val (ta, tb) = (writer("wA", 1000L, 0), writer("wB", 2000L, 20))
    ta.start(); tb.start(); ta.join(300000); tb.join(300000)
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")

    val stored = IvfStore.codes(spark, dir).filter(col("vec_id") >= 1000L)
      .groupBy("vec_id").count().collect()
    assert(stored.forall(_.getLong(1) == 1L),
      s"duplicate rows: ${stored.filter(_.getLong(1) > 1L).mkString(",")}")
    val ids = stored.map(_.getLong(0)).toSet
    val expected = ((1000L until 1020L) ++ (2000L until 2020L)).toSet
    assert(ids == expected,
      s"lost updates: missing ${expected -- ids}, extra ${ids -- expected}")

    // replay both writers' epoch 0 (incl. the one consolidated by the
    // refit): self-screen yields n==0 and the store is unchanged
    SemanticDedupStream.ingestDeduped(spark, dir, batchDf(1000L, 0, 0),
      "vec_id", "embedding", threshold = 0.9999, batchId = 0L, writerId = "wA")
    SemanticDedupStream.ingestDeduped(spark, dir, batchDf(2000L, 0, 20),
      "vec_id", "embedding", threshold = 0.9999, batchId = 0L, writerId = "wB")
    val afterReplay = IvfStore.codes(spark, dir).filter(col("vec_id") >= 1000L)
      .groupBy("vec_id").count().collect()
    assert(afterReplay.length == 40 && afterReplay.forall(_.getLong(1) == 1L),
      "replay after refit duplicated or dropped rows")

    VersionedStore.deleteRecursively(dir)
  }

  test("partial-commit crash: at-least-once-with-dedup — never duplicates, may under-ingest") {
    // the documented residual (ingestDeduped's scaladoc): a crash
    // MID-commit leaves some of the epoch's cell partitions renamed and
    // some still `.tmp`; on redelivery a tmp-cell survivor that is a
    // near-dup of a committed-cell survivor self-screens out while its
    // own tmp copy stays reader-invisible — the row is dropped, not
    // duplicated. This spec constructs that exact on-disk state and pins
    // the contract both ways: no duplicate ever, and the under-ingest is
    // real (not silently papered over).
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("semdedup_crash").toString
    val emb = graft.Tables(spark, sf0001).embeddings
    val m = IvfStore.publish(spark, dir, emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", nCells = 4, iters = 2)
    val novel = emb.filter(col("vec_id") === 310)
      .select("embedding").as[Seq[Float]].head()

    // epoch 0 attempt: V1 (id 5000) committed; V2 (id 5001, an exact copy
    // of V1 under another id) crashed mid-commit — its partition is still
    // `.tmp`, hand-planted in a DIFFERENT cell (the boundary/stale-model
    // shape that puts near-dups in different cells)
    SemanticDedupStream.ingestDeduped(spark, dir, Seq(Vec(5000L, novel)).toDF(),
      "vec_id", "embedding", threshold = 0.9999, batchId = 0L, writerId = "w")
    val v = VersionedStore.versionDir(dir)
    val committedCell = IvfStore.codes(spark, dir)
      .filter(col("vec_id") === 5000L).select("cell").head().getInt(0)
    val otherCell = (0 until 4).find(_ != committedCell).get
    AnnIngest.assignCells(Seq(Vec(5001L, novel)).toDF(),
        "embedding", m.mn, m.mx, m.centroids)
      .select(col("vec_id").cast("long").as("vec_id"), col("__q"))
      .write.parquet(s"$v/codes/cell=$otherCell/__b=w-0.tmp")

    // readers never see the torn half
    val visible = IvfStore.codes(spark, dir).filter(col("vec_id") >= 5000L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(visible == Set(5000L), s"tmp partition leaked to readers: $visible")

    // redelivery of the full epoch: V1 self-screens against its committed
    // copy; V2 screens out as a near-dup of committed V1 (nProbe wide
    // enough to reach the committed cell) — n == 0, ingest skipped, so V2
    // is DROPPED (the under-ingest) and nothing duplicates
    SemanticDedupStream.ingestDeduped(spark, dir,
      Seq(Vec(5000L, novel), Vec(5001L, novel)).toDF(),
      "vec_id", "embedding", threshold = 0.9999, batchId = 0L, writerId = "w",
      nProbe = 4)
    val after = IvfStore.codes(spark, dir).filter(col("vec_id") >= 5000L)
      .groupBy("vec_id").count().collect()
    assert(after.map(_.getLong(0)).toSet == Set(5000L),
      "redelivery either duplicated V1 or resurrected the torn V2")
    assert(after.forall(_.getLong(1) == 1L), "duplicate rows after redelivery")

    // the next refit consolidates and clears the crash leftover for good
    IvfStore.refit(spark, dir, nCells = 4, iters = 2)
    val consolidated = IvfStore.codes(spark, dir).filter(col("vec_id") >= 5000L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(consolidated == Set(5000L))
    VersionedStore.deleteRecursively(dir)
  }
}
