package graft.serving

import graft.model.Condition
import graft.operators.{FeedPage, Paging}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-feed HEAD-BLOCK cache for the serving plane — the answer to the
  * ~100 ms per-request Catalyst planning floor SCALE.md measured: every
  * getFeedSkeleton request used to build, analyze, optimize and codegen
  * a fresh page query whose plan differs from the previous request's
  * only in the cursor literals. Instead, ONE Spark job per (feed, store
  * version) collects the feed's newest `headSize` rows — the same
  * partition-pruned scan + bounded-heap top-k, just deeper — and every
  * page whose rows lie inside that block (the overwhelming majority:
  * real skeleton traffic reads the first few pages) is sliced
  * DRIVER-SIDE with zero Spark actions. The slice reproduces
  * [[FeedPage.pageCollected]] EXACTLY: same (ts DESC nulls-last,
  * cid DESC UTF-8) order, same keyset predicate (null-ts rows are
  * excluded from cursored pages, as the Spark-side predicate
  * null-drops them), same pinned prepend and cursor emit
  * ([[FeedPage.assembleCollected]] is shared code, and
  * FeedHeadCacheSpec pins full-walk parity).
  *
  * Correctness of the truncation boundary: the head holds the feed's
  * TOP-headSize rows, so every row beyond it ranks strictly below
  * `rows.last`. A cursored request answered from the head is therefore
  * exact whenever the in-head remainder covers the page
  * (`remainder.size >= limit`) or the head is COMPLETE (the feed has
  * fewer than headSize rows). Anything else — a walk past a truncated
  * head, or a limit above headSize — falls back to the per-request
  * Spark query, unchanged semantics.
  *
  * Invalidation: `version(feedKey)` is a PER-FEED token — the versioned
  * store's current pointer ([[graft.streaming.VersionedStore
  * .currentVersion]], which retention/compaction/delete swaps flip),
  * composed by the durable pipeline with the feed's landed-batch
  * counter ([[graft.model.ConditionMetrics.keyCycle]]) because
  * streaming appends do NOT flip the pointer. Per-feed matters: a
  * global drain counter would invalidate every feed's head on every
  * drain, forcing a full rebuild per request whenever a feed's request
  * rate is below the drain rate — worse than the uncached path. `None`
  * (no version source wired in) disables caching outright — every
  * request takes the fallback path. A token flip between the `version`
  * read and the head build labels a newer snapshot with the older
  * token; the head is still internally consistent (one snapshot, one
  * sort), and the next request under the new token rebuilds — the same
  * read-your-writes bound two back-to-back uncached requests already
  * have.
  *
  * Memory: headSize=400 × ~120 B × maxFeeds=4096 ≈ 200 MB worst case on
  * the driver; the map clears wholesale past `maxFeeds` (condition-set
  * churn is admin-CRUD-rare). At 100 TB this cache is per serving
  * replica and scales with feed count, not corpus size. */
final class FeedHeadCache(spark: SparkSession, store: () => DataFrame,
    version: String => Option[String], headSize: Int = 400, maxFeeds: Int = 4096) {

  require(headSize > 0 && maxFeeds > 0, "headSize and maxFeeds must be positive")

  private final case class Head(version: String,
      rows: Vector[(String, Option[Long], String)]) {
    def complete: Boolean = rows.length < headSize
  }

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Head]()
  private val hitsN = new java.util.concurrent.atomic.AtomicLong
  private val buildsN = new java.util.concurrent.atomic.AtomicLong
  private val fallbacksN = new java.util.concurrent.atomic.AtomicLong

  /** (head hits, head builds, Spark fallbacks) — for specs and smokes. */
  def stats: (Long, Long, Long) = (hitsN.get, buildsN.get, fallbacksN.get)

  /** Drop every cached head (tests; production relies on `version()`). */
  def invalidateAll(): Unit = cache.clear()

  /** One page, [[FeedPage.pageCollected]]-equivalent. */
  def page(c: Condition, limit: Int, cursor: Option[String],
      requesterDid: Option[String] = None)
      : (Seq[(Long, String)], Option[String]) = {
    if (!FeedPage.allowed(c, requesterDid)) return (Nil, None)
    version(c.key) match {
      case Some(v) if limit <= headSize =>
        serveFromHead(headFor(c, v), c, limit, cursor).getOrElse {
          // the walk ran past a truncated head: per-request Spark query
          fallbacksN.incrementAndGet()
          FeedPage.pageCollected(spark, store(), c, limit, cursor, requesterDid)
        }
      case _ =>
        fallbacksN.incrementAndGet()
        FeedPage.pageCollected(spark, store(), c, limit, cursor, requesterDid)
    }
  }

  private def headFor(c: Condition, v: String): Head = {
    val cur = cache.get(c.key)
    if (cur != null && cur.version == v) { hitsN.incrementAndGet(); cur }
    else {
      // build OUTSIDE any map lock (it runs a Spark job); a racing
      // request for the same feed builds a duplicate head — harmless,
      // last write wins, both are snapshots of the same version
      buildsN.incrementAndGet()
      if (cache.size > maxFeeds) cache.clear()
      val head = Head(v, FeedPage.collectSorted(store(), c, headSize, None))
      cache.put(c.key, head)
      head
    }
  }

  private def serveFromHead(head: Head, c: Condition, limit: Int,
      cursor: Option[String]): Option[(Seq[(Long, String)], Option[String])] = {
    val remainder = cursor match {
      case None => head.rows
      case Some(cur) =>
        val (ct, ccid) = Paging.decodeCursor(cur)
        // keyset: strictly after the cursor in (ts DESC, cid DESC)
        // order; null-ts rows are EXCLUDED on cursored pages — the
        // Spark-side predicate null-drops them
        head.rows.filter {
          case (_, Some(t), cid) =>
            t < ct || (t == ct && FeedPage.cidUtf8Gt(ccid, cid))
          case _ => false
        }
    }
    if (remainder.length >= limit || head.complete)
      Some(FeedPage.assembleCollected(c, firstPage = cursor.isEmpty,
        remainder.take(limit)))
    else None
  }
}
