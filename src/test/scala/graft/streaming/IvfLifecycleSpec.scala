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

    VersionedStore.deleteRecursively(Paths.get(dir))
  }
}
