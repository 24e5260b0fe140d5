package graft.streaming

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.Tag

/** Long-running suites a dev loop may exclude (`testOnly -- -l graft.Slow`);
  * CI runs everything. */
object Slow extends Tag("graft.Slow")

/** Crash-injection SOAK over the streaming ingest protocol (50+ epochs,
  * seeded-random faults): the per-stage specs prove each recovery path
  * once (IvfLifecycleSpec's replay, StoreLockSpec's swap leftovers); this
  * suite proves they COMPOSE under repeated, randomly-placed failures —
  * the shape a real deployment's history takes.
  *
  * A unit test cannot kill the JVM, but the protocol's only shared state
  * is the store directory, so every fault is injected as the exact ON-DISK
  * STATE the corresponding kill leaves (the commit is a per-cell
  * delete+rename of `__b=` partition dirs, each atomic, order unspecified
  * — so "killed mid-X" is precisely "some suffix of X's directory ops
  * never happened"):
  *
  *   - mid-WRITE kill: only `.tmp` partitions on disk (a random subset of
  *     the batch's cells — the task set died part-way), nothing committed;
  *   - mid-COMMIT kill: a random subset of the batch's cells committed,
  *     the rest still `.tmp`;
  *   - mid-SWAP kill (refit): an orphan `_vN` version dir (renamed in,
  *     pointer never flipped) and a stale holder-unique `_vN.tmp-` dir
  *     beside the live version.
  *
  * After every fault the epoch REDELIVERS (foreachBatch is at-least-once)
  * and the invariants are asserted:
  *   - readers never see a torn batch (the `.tmp` partition filter);
  *   - raw [[IvfStore.ingest]] is exactly-once per (writer, epoch): after
  *     redelivery, no loss and no duplicate, whatever the fault;
  *   - [[SemanticDedupStream.ingestDeduped]] is exactly-once too (r17):
  *     the staged screen verdict makes every redelivery re-land the
  *     IDENTICAL survivor set — never a duplicate, never a loss, in
  *     every kill state (the r16 mid-commit under-ingest window closed);
  *   - an exact copy of a stored vector always screens out (quantized
  *     cosine is exactly 1 on identical codes);
  *   - refit restores one row per vector, drops every stale tmp, and
  *     recovers from swap leftovers (allocation skips the orphan).
  */
class StreamingCrashSoakSpec extends SparkSpec {

  private val Dim = 16

  /** Deterministic in-bounds vector per id — the soak needs no realism,
    * only diversity and reproducibility. */
  private def vec(id: Long): Seq[Float] =
    (0 until Dim).map(j => (((id * 31 + j * 17) % 101 + 101) % 101 / 101.0f))

  private def batchDf(ids: Seq[Long]) = {
    val s = spark
    import s.implicits._
    spark.createDataset(ids.map(i => Vec(i, vec(i))).toIndexedSeq).toDF()
  }

  /** The per-cell `__b=<b>` partition dirs of the CURRENT version. */
  private def cellBatchDirs(store: String, b: String): Seq[JPath] = {
    val root = Paths.get(VersionedStore.versionDir(store), "codes")
    if (!Files.isDirectory(root)) return Seq.empty
    val cells = Files.list(root)
    try cells.iterator().asScala
      .filter(_.getFileName.toString.startsWith("cell="))
      .flatMap { c =>
        val d = c.resolve(s"__b=$b")
        if (Files.isDirectory(d)) Some(d) else None
      }.toSeq
    finally cells.close()
  }

  /** Turn a COMMITTED epoch into the on-disk state of a kill: rename all
    * of its partition dirs back to `.tmp`, re-commit `commit` of them
    * (the cells whose delete+rename pair had completed), drop `drop` of
    * the rest (cells whose tmp write never ran). */
  private def injectKill(store: String, b: String,
      commit: Seq[JPath] => Seq[JPath], drop: Seq[JPath] => Seq[JPath]): Unit = {
    val dirs = cellBatchDirs(store, b)
    val tmps = dirs.map { d =>
      val t = d.resolveSibling(s"__b=$b.tmp")
      Files.move(d, t); t
    }
    commit(tmps).foreach(t => Files.move(t, t.resolveSibling(s"__b=$b")))
    drop(tmps.filter(Files.isDirectory(_))).foreach { t =>
      VersionedStore.deleteRecursively(t.toString)
    }
  }

  private def storeState(store: String): (Long, Long) = {
    val c = IvfStore.codes(spark, store)
    (c.count(), c.select("vec_id").distinct().count())
  }

  private def noTmpLeaks(store: String): Unit = {
    val root = Paths.get(VersionedStore.versionDir(store), "codes")
    val leaked = Files.walk(root)
    try assert(!leaked.iterator().asScala.exists(
      _.getFileName.toString.endsWith(".tmp")),
      "stale .tmp partition leaked into the CURRENT version")
    finally leaked.close()
  }

  test("raw ingest soak: 30 epochs of randomized kills, exactly-once after every redelivery", Slow) {
    val store = Files.createTempDirectory("soak_raw").toString
    val rng = new scala.util.Random(20260816L)
    val snapshot = batchDf(0L until 100L)
    IvfStore.publish(spark, store, snapshot, "vec_id", "embedding",
      nCells = 4, iters = 2)
    var (v, m) = IvfStore.versionedModel(spark, store)
    var expected = 100L
    val writer = "soakraw"

    for (epoch <- 0 until 30) {
      val ids = (1000L + epoch * 5) until (1000L + epoch * 5 + 5)
      val assigned = AnnIngest.assignCells(batchDf(ids), "embedding",
        m.mn, m.mx, m.centroids)
      def ingest(): Unit =
        IvfStore.ingest(store, assigned, "vec_id", epoch.toLong, writer, Some(v))
      val b = s"$writer-$epoch"
      ingest()
      expected += 5

      rng.nextInt(4) match {
        case 0 => // no fault; a spurious redelivery must still be a no-op
          if (rng.nextBoolean()) ingest()
        case 1 => // mid-WRITE kill: nothing committed, a random cell subset
          // of tmps never even written
          injectKill(store, b, commit = _ => Seq.empty,
            drop = tmps => tmps.filter(_ => rng.nextBoolean()))
          val (midN, midU) = storeState(store)
          assert(midN == expected - 5 && midU == midN,
            s"torn epoch visible to readers: n=$midN uniq=$midU")
          ingest() // redelivery
        case 2 => // mid-COMMIT kill: a random cell subset committed
          injectKill(store, b,
            commit = tmps => tmps.filter(_ => rng.nextBoolean()),
            drop = _ => Seq.empty)
          val (midN, midU) = storeState(store)
          assert(midN <= expected && midU == midN,
            s"partial commit duplicated rows: n=$midN uniq=$midU")
          ingest() // redelivery
        case 3 => // mid-SWAP kill during a refit, then the refit redelivers
          val root = Paths.get(store)
          val maxV = root.toFile.list().filter(_.matches("_v\\d+"))
            .map(_.stripPrefix("_v").toLong).max
          val orphan = root.resolve(f"_v${maxV + 1}%019d")
          Files.createDirectory(orphan)
          Files.write(orphan.resolve("junk"), "not parquet".getBytes)
          val staleTmp = root.resolve(f"_v${maxV + 1}%019d.tmp-cafe01")
          Files.createDirectory(staleTmp)
          Files.write(staleTmp.resolve("part-junk"), Array[Byte](1, 2))
          IvfStore.refit(spark, store, nCells = 4, iters = 1)
          assert(!Files.exists(orphan), "orphan version not GC'd by the swap")
          assert(!Files.exists(staleTmp), "stale swap tmp not GC'd")
          val vm = IvfStore.versionedModel(spark, store)
          v = vm._1; m = vm._2
      }
      val (n, u) = storeState(store)
      assert(n == expected && u == expected,
        s"epoch $epoch: expected $expected unique rows, got n=$n uniq=$u")
    }
    noTmpLeaks(store)
    // the store stayed servable, and a stored vector's exact copy is
    // findable (the existence screen: identical codes cosine to exactly 1;
    // search's raw-dot RANKING is deliberately not asserted — see
    // IvfLifecycleSpec on the all-positive code space)
    assert(IvfStore.search(spark, store, batchDf(Seq(1042L)),
      "vec_id", "embedding", k = 3).count() == 3)
    assert(IvfStore.nearDupIds(spark, store, batchDf(Seq(1042L)),
      "vec_id", "embedding", threshold = 0.9999).count() == 1,
      "a soaked-in vector's exact copy no longer screens as a near-dup")
    VersionedStore.deleteRecursively(store)
  }

  test("staged verdict fences on batch CONTENT: a reused epoch with different data re-screens") {
    // a wiped stream checkpoint (epochs restart at 0) over a surviving
    // store, same writerId: the marker for epoch 0 still exists, but the
    // batch fingerprint differs — the new data must be screened and
    // ingested, never silently substituted by the stale staged survivors
    val store = Files.createTempDirectory("soak_fp").toString
    IvfStore.publish(spark, store, batchDf(0L until 50L), "vec_id", "embedding",
      nCells = 2, iters = 2)
    def ids(): Set[Long] = IvfStore.codes(spark, store).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // one-hot vectors on distinct axes: orthogonal to each other and far
    // from every dense snapshot vector, so nothing screens out and the
    // survivor counts are deterministic
    val s = spark
    import s.implicits._
    def oneHots(idsHots: Seq[(Long, Int)]) = spark.createDataset(
      idsHots.map { case (id, h) =>
        Vec(id, (0 until Dim).map(j => if (j == h) 1f else 0f))
      }.toIndexedSeq).toDF()
    val n1 = SemanticDedupStream.ingestDeduped(spark, store,
      oneHots(Seq(7020L -> 0, 7021L -> 1, 7022L -> 2, 7023L -> 3)),
      "vec_id", "embedding", 0.9999, 0L, "fpw")
    assert(n1 == 4 && (7020L until 7024L).forall(ids().contains), s"n1=$n1 ${ids()}")
    // epoch 0 again, DIFFERENT rows (the reused-epoch misuse): ingest's
    // per-epoch partition replace may evict the first incarnation's rows
    // from shared cells — the fix's contract is that the NEW data lands
    val n2 = SemanticDedupStream.ingestDeduped(spark, store,
      oneHots(Seq(7024L -> 4, 7025L -> 5, 7026L -> 6)),
      "vec_id", "embedding", 0.9999, 0L, "fpw")
    assert(n2 == 3, s"new data was not re-screened: n2=$n2")
    assert((7024L until 7027L).forall(ids().contains),
      s"reused epoch silently replayed the stale staged survivors: ${ids()}")
    VersionedStore.deleteRecursively(store)
  }

  test("staged verdict distinguishes PUBLISH from refit: a new corpus forces a re-screen") {
    // refit = same corpus re-clustered → the staged verdict stands
    // (soak case 4); publish = a NEW snapshot → the verdict must NOT
    // replay, because the new corpus' rows matter for the near-dup
    // decisions (IvfStore.refitDescends is the dispatch)
    val store = Files.createTempDirectory("soak_pub").toString
    val s = spark
    import s.implicits._
    def oneHot(id: Long, h: Int) = Vec(id, (0 until Dim).map(j => if (j == h) 1f else 0f))
    def ids(): Set[Long] = IvfStore.codes(spark, store).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    IvfStore.publish(spark, store, batchDf(0L until 40L), "vec_id", "embedding",
      nCells = 2, iters = 2)
    val batch = spark.createDataset(Seq(
      oneHot(8001, 1), oneHot(8002, 2), oneHot(8003, 3), oneHot(8004, 4))).toDF()
    val n1 = SemanticDedupStream.ingestDeduped(spark, store, batch,
      "vec_id", "embedding", 0.9999, 0L, "pubw")
    assert(n1 == 4, s"fixture: all one-hots must survive the first screen, got $n1")
    // a NEW corpus replaces the store: it contains exact copies of the
    // first two one-hots under different ids
    IvfStore.publish(spark, store,
      spark.createDataset(
        (0L until 20L).map(i => Vec(i, vec(i))) ++ Seq(oneHot(900, 1), oneHot(901, 2))
      ).toDF(), "vec_id", "embedding", nCells = 2, iters = 2)
    // redeliver the SAME epoch (fingerprint matches, version mismatch,
    // NO refit lineage): must re-screen — 8001/8002 are near-dups of the
    // new snapshot's 900/901 and drop; 8003/8004 land
    val n2 = SemanticDedupStream.ingestDeduped(spark, store, batch,
      "vec_id", "embedding", 0.9999, 0L, "pubw")
    assert(n2 == 2, s"publish must force a re-screen, got n2=$n2")
    val after = ids()
    assert(after.contains(8003L) && after.contains(8004L), s"survivors lost: $after")
    assert(!after.contains(8001L) && !after.contains(8002L),
      s"stale verdict replayed across a publish: $after")
    VersionedStore.deleteRecursively(store)
  }

  test("semantic-dedup soak: 25 epochs of randomized kills — never a duplicate, never a loss (staged verdict)", Slow) {
    val store = Files.createTempDirectory("soak_sd").toString
    val rng = new scala.util.Random(816202616L)
    IvfStore.publish(spark, store, batchDf(0L until 100L), "vec_id", "embedding",
      nCells = 4, iters = 2)
    val writer = "soaksd"
    val threshold = 0.9999 // identical codes dot to exactly 1 (integer dots,
    // exact sqrt at Dim×255² scale); the screen must catch every true copy

    def ids(store: String): Set[Long] =
      IvfStore.codes(spark, store).select("vec_id")
        .collect().map(_.getLong(0)).toSet

    for (epoch <- 0 until 25) {
      val fresh = (5000L + epoch * 4) until (5000L + epoch * 4 + 4)
      // one exact copy of an already-stored vector under a new id: the
      // screen must drop it, deterministically, in every epoch
      val copyId = 9000L + epoch
      val copyOf = rng.nextInt(100).toLong
      val s = spark
      import s.implicits._
      val batch = batchDf(fresh) unionByName
        spark.createDataset(Seq(Vec(copyId, vec(copyOf)))).toDF()
      val before = ids(store)
      def deliver(): Long = SemanticDedupStream.ingestDeduped(spark, store,
        batch, "vec_id", "embedding", threshold, epoch.toLong, writer)
      val n1 = deliver()
      val after1 = ids(store)
      assert(!after1.contains(copyId), s"epoch $epoch: exact copy survived the screen")
      assert((after1 -- before).subsetOf(fresh.toSet),
        s"epoch $epoch: foreign rows landed: ${(after1 -- before) -- fresh.toSet}")
      assert((after1 -- before).size.toLong == n1,
        s"epoch $epoch: ingest return $n1 != rows landed ${(after1 -- before).size}")

      val b = s"$writer-$epoch"
      rng.nextInt(5) match {
        case 4 => // the r17-closed interleaving: mid-COMMIT crash, then a
          // REFIT lands BEFORE the redelivery. The staged verdict's model
          // version no longer matches, but the survivor id set stands —
          // the replay re-assigns the staged ids under the new model
          // (re-screening here was the r16 loss window: committed
          // batch-mates would screen out the uncommitted survivors) and
          // drops the ids the refit already consolidated (identity
          // anti-join against presentIds — re-landing them was the r17
          // duplicate window, closed in r18). Zero LOSS and zero
          // DUPLICATES, with NO healing refit: the epoch-end n==u check
          // below sees the store exactly as the redelivery left it.
          injectKill(store, b,
            commit = tmps => tmps.filter(_ => rng.nextBoolean()),
            drop = _ => Seq.empty)
          IvfStore.refit(spark, store, nCells = 4, iters = 1)
          deliver()
          assert(ids(store) == after1,
            s"epoch $epoch: refit-straddling redelivery lost rows: " +
              s"missing=${after1 -- ids(store)}")
          val (nS, uS) = storeState(store)
          assert(nS == uS,
            s"epoch $epoch: straddling redelivery re-landed consolidated " +
              s"rows: n=$nS uniq=$uS")
        case 0 => // clean epoch + a spurious redelivery: the STAGED
          // verdict replays the identical survivor set through the
          // idempotent per-epoch ingest — same count, store unchanged
          val n2 = deliver()
          assert(n2 == n1, s"epoch $epoch: replay count drifted: $n2 != $n1")
          assert(ids(store) == after1, "spurious redelivery changed the store")
        case 1 => // mid-COMMIT kill then redelivery: the r16 under-ingest
          // window, CLOSED by the staged verdict — the replay must restore
          // the FULL survivor set (zero loss), never a duplicate
          injectKill(store, b,
            commit = tmps => tmps.filter(_ => rng.nextBoolean()),
            drop = _ => Seq.empty)
          deliver()
          val afterR = ids(store)
          assert(afterR == after1,
            s"epoch $epoch: mid-commit redelivery lost or invented rows — " +
              s"missing=${after1 -- afterR} extra=${afterR -- after1}")
        case 2 => // refit at a clean point: consolidation must preserve ids
          IvfStore.refit(spark, store, nCells = 4, iters = 1)
          assert(ids(store) == after1, "refit changed the id set")
        case 3 => // mid-WRITE kill: nothing committed, a random tmp subset
          // never written — the staged verdict restores everything
          injectKill(store, b, commit = _ => Seq.empty,
            drop = tmps => tmps.filter(_ => rng.nextBoolean()))
          deliver()
          assert(ids(store) == after1,
            s"epoch $epoch: mid-write redelivery diverged from the survivor set")
      }
      val (n, u) = storeState(store)
      assert(n == u, s"epoch $epoch: store holds duplicates: n=$n uniq=$u")
    }
    // final consolidation: one row per vector, no tmp anywhere, servable
    IvfStore.refit(spark, store, nCells = 4, iters = 1)
    val (n, u) = storeState(store)
    assert(n == u)
    noTmpLeaks(store)
    assert(IvfStore.nearDupIds(spark, store, batchDf(Seq(7L)),
      "vec_id", "embedding", threshold).count() == 1,
      "the consolidated store lost a snapshot vector")
    VersionedStore.deleteRecursively(store)
  }
}
