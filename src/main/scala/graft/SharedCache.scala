package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-query materialization cache: one expensive result (e.g. the
  * near-dup component fixpoint) computed once per run and shared by every
  * catalog query that derives from it — ns26 emits the component table,
  * ns41 derives the verdict table, and only the first one to run pays for
  * the propagation loop.
  *
  * This is the single-session analog of persisting a curated intermediate
  * table: at 100 TB a pipeline writes components to storage once and every
  * downstream job reads it, it does not re-run the fixpoint per consumer.
  *
  * Mechanics: the computed frame is pinned with an eager `localCheckpoint`
  * and its backing RDD ids are recorded as PROTECTED; scratch
  * materializations created *while* computing (per-iteration label
  * checkpoints, signature tables) are released immediately. Verify/Bench
  * free per-query scratch between queries by unpersisting every
  * non-protected RDD ([[unpersistScratch]]) — unpersisting a protected
  * checkpoint would be unrecoverable, since a localCheckpoint truncates
  * lineage. Bench calls [[clear]] at the start of each timing pass so each
  * pass honestly recomputes the shared work exactly once.
  *
  * EXECUTOR-LOSS CONTRACT: `localCheckpoint` blocks live in executor
  * storage and truncate lineage, so a pin does NOT survive losing the
  * executor that holds it — any later reader dies with
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. That is acceptable by design for
  * the two places pins exist: the single-JVM harness (local[n] /
  * local-cluster with stable executors — Verify/Bench runs are minutes
  * long and re-runnable), and a single interactive driver session. A
  * deployment keeps shared intermediates as PERSISTED TABLES instead
  * ([[graft.streaming.IvfStore.publish]] is the ANN form; a curated
  * components/cells table is the batch form). For a cluster session that
  * wants pins to survive executor churn without publishing tables, set
  * `spark.graft.sharedCache.reliableDir` to a fault-tolerant path:
  * pins then use a RELIABLE `checkpoint()` (files under that dir, read
  * back by any executor) at the cost of one write+read of the pinned
  * frame. Checkpoint files are only auto-deleted on GC with
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true`; otherwise
  * sweep the dir when the session ends.
  */
object SharedCache {

  private val entries = scala.collection.mutable.Map[String, DataFrame]()
  private val values = scala.collection.mutable.Map[String, Any]()
  private val protectedRddIds = scala.collection.mutable.Set[Int]()
  /** The (applicationId, reliableDir) pair already pushed to
    * setCheckpointDir (guarded by the object lock like every pin). Keyed to
    * the live context: a dir-only flag survived a SparkContext
    * stop/recreate in the same JVM, so the new context never got
    * setCheckpointDir and checkpoint() threw. */
  private var reliableDirApplied: Option[(String, String)] = None

  /** Memoized compute: `key` must identify the result uniquely (include the
    * data dir and any parameters). The builder may create its own scratch
    * checkpoints; they are released once the final frame is pinned. The
    * builder may also NEST getOrCompute calls (a cached result built from
    * a cached sub-artifact — the components-over-band-frame shape): the
    * inner pin's RDDs land inside the outer call's "new since `before`"
    * set, so the scratch release must SKIP already-protected ids — it
    * unpersisted a live nested pin once, and every later reader of that
    * entry died with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. */
  def getOrCompute(key: String, spark: SparkSession)(build: => DataFrame): DataFrame =
    synchronized {
      entries.getOrElseUpdate(key, {
        val sc = spark.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val computed = build
        val scratchIds = sc.getPersistentRDDs.keySet -- before
        // both forms are EAGER (materialize now); reliable checkpoints
        // leave nothing in getPersistentRDDs, so pinnedIds is empty and
        // unpersistScratch/clear simply have no blocks to manage for them
        val pinned = spark.conf.getOption("spark.graft.sharedCache.reliableDir") match {
          case Some(dir) =>
            // the conf OWNS the checkpoint dir: silently deferring to a
            // pre-existing setCheckpointDir (possibly a driver-local /tmp
            // some user code set) would void the survive-executor-churn
            // contract this conf exists for — checkpoint files would land
            // somewhere non-fault-tolerant with no sign the conf was
            // ignored. Applied once per conf value (getCheckpointDir
            // returns the QUALIFIED path, so it can't be the idempotence
            // check), loudly when it overrides someone else's dir.
            if (!reliableDirApplied.contains((sc.applicationId, dir))) {
              sc.getCheckpointDir.foreach(prev => System.err.println(
                s"[graft] sharedCache.reliableDir=$dir overrides the " +
                  s"session checkpoint dir '$prev' for pin checkpoints"))
              sc.setCheckpointDir(dir)
              reliableDirApplied = Some((sc.applicationId, dir))
            }
            computed.checkpoint()
          case None => computed.localCheckpoint()
        }
        val pinnedIds = sc.getPersistentRDDs.keySet -- before -- scratchIds
        sc.getPersistentRDDs.foreach { case (id, rdd) =>
          if (scratchIds.contains(id) && !protectedRddIds.contains(id))
            rdd.unpersist(blocking = false)
        }
        protectedRddIds ++= pinnedIds
        pinned
      })
    }

  /** Memoized DRIVER-SIDE value (fitted centroids, PQ codebooks, corpus
    * bounds — anything small enough to collect). Same key discipline and
    * lifecycle as [[getOrCompute]]: cleared by [[clear]] so each benchmark
    * pass honestly recomputes the training once. The builder typically also
    * pins a companion frame via [[getOrCompute]] — the lock is reentrant,
    * so nesting the two is safe. */
  def getOrComputeValue[T](key: String)(build: => T): T = synchronized {
    values.getOrElseUpdate(key, build).asInstanceOf[T]
  }

  /** Release every persistent RDD EXCEPT pinned cache entries — the
    * between-queries scratch sweep for Verify/Bench. */
  def unpersistScratch(spark: SparkSession): Unit = synchronized {
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!protectedRddIds.contains(id)) rdd.unpersist(blocking = false)
    }
  }

  /** Drop all cache entries and their pinned blocks (start of a fresh
    * benchmark pass). */
  def clear(spark: SparkSession): Unit = synchronized {
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (protectedRddIds.contains(id)) rdd.unpersist(blocking = false)
    }
    protectedRddIds.clear()
    entries.clear()
    values.clear()
  }
}
