package graft.model

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-feed cycle bookkeeping (S12/F9 — the reference's `lastExecTime` /
  * `recordCount` columns on the conditions row,
  * /root/reference/src/subscription.ts:210,370-378, db/schema.ts:35-36):
  * after every ingest cycle the reference persists how long the cycle
  * took (as a `"<ms>ms"` varchar, wire shape kept here) and the feed's
  * accumulated row count clamped to its cap.
  *
  * The reference runs one fetch job per feed and times each; our cascade
  * fans all feeds out in one dataflow, so every condition processed in a
  * cycle records that cycle's wall time. Driver-side state only — a
  * handful of feeds, never a data path.
  */
final class ConditionMetrics {

  final case class FeedMetrics(lastExecTime: String, recordCount: Long)

  private val m = TrieMap.empty[String, FeedMetrics]

  /** Per-feed landed-batch counters — bumped only for feeds a recorded
    * micro-batch actually landed rows for. The serving head cache folds
    * a feed's counter into its version token, so a drain invalidates
    * ONLY the feeds it touched (appends don't flip the store pointer;
    * only compaction/delete swaps do) — a global counter would force a
    * full head rebuild per drain per active feed, degenerating to
    * worse-than-uncached whenever a feed's request rate is below the
    * drain rate. */
  /** One generation's counters. The generation and its map travel as a
    * SINGLE immutable pair behind one volatile reference, so a reader
    * always sees a (gen, count) that actually existed: with gen and map
    * stored separately, a [[keyCycle]] racing a reset could read the
    * post-bump generation but the pre-clear count — "newGen:oldCount" —
    * and once the fresh counter re-climbed to oldCount the head cache
    * would serve that stale head as current until the feed's next
    * landed batch. */
  private final class KeyCycles(val gen: Long) {
    val m = TrieMap.empty[String, Long]
  }
  @volatile private var keyCycles = new KeyCycles(0L)
  private val KeyCyclesMax = 8192
  def keyCycle(key: String): String = {
    val c = keyCycles // one volatile read: gen and counts are the same snapshot
    s"${c.gen}:${c.m.getOrElse(key, 0L)}"
  }

  /** (generation, per-feed landed-batch counts) as one consistent pair —
    * what the persist hook publishes for serving replicas. */
  def keyCyclesSnapshot: (Long, Map[String, Long]) = {
    val c = keyCycles
    (c.gen, c.m.readOnlySnapshot().toMap)
  }

  /** Persist hook ([[graft.streaming.CycleManifest.Writer]] in the
    * durable deployment): called at the END of every [[record]] — after
    * the batch's rows are visible AND the in-process counters are bumped
    * — so a store-routed reader can never observe a fresher token than
    * the drain process itself. */
  @volatile private var persist: Option[(Long, Map[String, Long]) => Unit] = None
  def persistWith(f: (Long, Map[String, Long]) => Unit): Unit = persist = Some(f)

  /** Record one completed cycle: every condition gets the cycle wall time
    * (subscription.ts:374 `(endTime - startTime) + 'ms'`); counts
    * accumulate by the new rows captured for that feed and clamp to the
    * feed's cap the way the reference's post-cycle delete leaves them
    * (subscription.ts:378-393). */
  def record(conditions: Seq[Condition], newRowsByKey: Map[String, Long],
      execMs: Long): Unit = synchronized {
    // serialized: every production caller already records under a store/
    // pipeline lock, but the class must not depend on that — two
    // unserialized record()s racing the bounded-map reset could both
    // install gen+1 over the same base (re-minting issued tokens over a
    // fresh map), and their end-of-record persists could publish
    // snapshots out of order, regressing the manifest's counters so a
    // replica's older cached token re-validates. record() is per-drain
    // driver-side work; the lock costs nothing.
    conditions.foreach { c =>
      val prev = m.get(c.key).map(_.recordCount).getOrElse(0L)
      val total = math.min(prev + newRowsByKey.getOrElse(c.key, 0L), c.limitCount.toLong)
      m.put(c.key, FeedMetrics(s"${execMs}ms", total))
    }
    // bounded against admin key churn: past the cap a FRESH (gen+1, map)
    // pair replaces the reference in one volatile write, so a re-climbing
    // counter can never collide with a token cached before the reset (a
    // bare clear would eventually re-produce "ptr:5" and serve a stale
    // head as current; a reset only ever forces rebuilds). The method
    // lock serializes reset vs bump; concurrent keyCycle READERS see
    // either whole pair, never a torn one.
    if (keyCycles.m.size > KeyCyclesMax)
      keyCycles = new KeyCycles(keyCycles.gen + 1)
    val kc = keyCycles
    newRowsByKey.foreach { case (k, n) =>
      if (n > 0) kc.m.updateWith(k)(c => Some(c.getOrElse(0L) + 1L))
    }
    attached.foreach(publishTo)
    persist.foreach { f =>
      val (g, counts) = keyCyclesSnapshot
      f(g, counts)
    }
  }

  def lastExecTime(key: String): Option[String] = m.get(key).map(_.lastExecTime)
  def recordCount(key: String): Option[Long] = m.get(key).map(_.recordCount)
  def snapshot: Map[String, FeedMetrics] = m.toMap

  /** Push the current metrics onto a serving-tier [[ControlPlane]] so its
    * getQuery reports them — the reference's ingest-loop UPDATE of the
    * conditions row (subscription.ts:370-378). */
  def publishTo(cp: ControlPlane): Unit = m.foreach { case (k, fm) =>
    cp.setLastExecTime(k, fm.lastExecTime)
    cp.setRecordCount(k, fm.recordCount)
  }

  /** Attach a control plane: every subsequent [[record]] publishes to it
    * automatically — the deployment wiring, so getQuery always reports
    * the latest cycle without a manual publish step. */
  def attach(cp: ControlPlane): Unit = { attached = Some(cp); publishTo(cp) }

  @volatile private var attached: Option[ControlPlane] = None

  /** The conditions-metrics frame — the reference's conditions row
    * projected to its metric columns (schema.ts:35-36). */
  def toDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    m.toSeq.map { case (k, fm) => (k, fm.lastExecTime, fm.recordCount) }
      .toDF("key", "lastExecTime", "recordCount")
  }
}
