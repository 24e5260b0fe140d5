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
  * TOP rows in contiguous blocks, so every row beyond it ranks strictly
  * below `rows.last`. A cursored request answered from the head is
  * therefore exact whenever the in-head remainder covers the page
  * (`remainder.size >= limit`) or the head is COMPLETE (the chain
  * reached the feed's end). A walk that runs past the cached chain
  * EXTENDS it — one Spark job collects the NEXT `headSize` rows keyed
  * on the chain's last (ts, cid) boundary (exactly the fallback query,
  * but its result is cached, so one job serves the next ~headSize/limit
  * deep pages instead of one) — up to `maxBlocks` blocks per feed.
  * What a chain guarantees: every block is strictly after the previous
  * block's (ts, cid) boundary, so a walk never duplicates or loses a
  * row, and every cursored page it serves is keyset-exact. It does NOT
  * guarantee one store snapshot across blocks: extend() queries the
  * CURRENT store under the earlier token, so a late-arriving older-ts
  * row that lands mid-walk (its drain's token flip invalidates the
  * chain for the NEXT request) can appear in a later block that
  * block 0's scan never saw — the same bounded read-your-writes
  * staleness two back-to-back uncached requests already have.
  * Past maxBlocks, or for a limit above headSize, requests
  * fall back to the per-request Spark query, unchanged semantics. A
  * chain whose last row has a null ts is complete for cursored
  * purposes: null-ts rows sort last and cursored pages exclude them.
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
  * Memory: block 0 only (the overwhelming case — chains grow only for
  * feeds actually deep-walked) is headSize=400 × ~120 B × maxFeeds=4096
  * ≈ 200 MB worst case on the driver; a fully-extended chain is
  * maxBlocks=8 × that per walked feed (every-feed-fully-walked worst
  * case ≈ 1.6 GB — cap maxBlocks or headSize down if a tenant's
  * traffic is all deep scrolls). Past `maxFeeds` ONE least-recently-used
  * entry is evicted
  * per insert (an O(size) scan over ≤4097 driver-side entries, only on
  * the already-Spark-job-paying build path) — a wholesale clear() would
  * stampede every hot feed into a ~70 ms rebuild whenever a tenant
  * crosses the bound. At 100 TB this cache is per serving replica and
  * scales with feed count, not corpus size.
  *
  * Replicas: a serving process that does NOT run the drain wires
  * `version` to [[graft.streaming.CycleManifest.replicaVersion]], which
  * reads the drain's persisted per-feed landed-batch counters from the
  * store — same per-feed invalidation, no shared process state. */
final class FeedHeadCache(spark: SparkSession, store: String => DataFrame,
    version: String => Option[String], headSize: Int = 400, maxFeeds: Int = 4096,
    maxBlocks: Int = 8) {

  require(headSize > 0 && maxFeeds > 0 && maxBlocks > 0,
    "headSize, maxFeeds and maxBlocks must be positive")

  private final case class Head(version: String,
      rows: Vector[(String, Option[Long], String)], complete: Boolean) {
    // eviction recency — mutable on purpose: touching it must not copy
    // the row vector, and it carries no page semantics
    val lastAccess = new java.util.concurrent.atomic.AtomicLong(tick.incrementAndGet())
    def touch(): Unit = lastAccess.set(tick.incrementAndGet())
  }

  // a logical clock, not wall time: System.nanoTime ties under burst
  // traffic would make LRU victim choice nondeterministic in specs
  private val tick = new java.util.concurrent.atomic.AtomicLong
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Head]()
  private val hitsN = new java.util.concurrent.atomic.AtomicLong
  private val buildsN = new java.util.concurrent.atomic.AtomicLong
  private val fallbacksN = new java.util.concurrent.atomic.AtomicLong
  private val evictionsN = new java.util.concurrent.atomic.AtomicLong

  /** (head hits, head builds, Spark fallbacks) — for specs and smokes. */
  def stats: (Long, Long, Long) = (hitsN.get, buildsN.get, fallbacksN.get)

  /** LRU evictions performed past `maxFeeds` — each one is O(1) entries
    * dropped, never a wholesale clear. */
  def evictions: Long = evictionsN.get

  private val extensionsN = new java.util.concurrent.atomic.AtomicLong

  /** Chain extensions: deep-walk block builds past block 0 — each is one
    * Spark job amortized over the next ~headSize/limit deep pages. */
  def extensions: Long = extensionsN.get

  private val coalescedN = new java.util.concurrent.atomic.AtomicLong

  /** Requests that WAITED on another request's in-flight build of the
    * same head instead of duplicating its Spark job (the cold-feed
    * thundering herd: ServeSmoke's 4-client phase measured ~3.2 builds
    * per cold feed before single-flight). */
  def coalesced: Long = coalescedN.get

  /** Drop every cached head (tests; production relies on `version()`). */
  def invalidateAll(): Unit = cache.clear()

  /** One page, [[FeedPage.pageCollected]]-equivalent. */
  def page(c: Condition, limit: Int, cursor: Option[String],
      requesterDid: Option[String] = None)
      : (Seq[(Long, String)], Option[String]) = {
    if (!FeedPage.allowed(c, requesterDid)) return (Nil, None)
    version(c.key) match {
      case Some(v) if limit <= headSize =>
        var head = headFor(c, v)
        var served = serveFromHead(head, c, limit, cursor)
        // deep walk past the cached chain: EXTEND block by block (each
        // extension is the fallback query, cached) until the page is
        // covered, the feed ends, or the maxBlocks memory bound
        while (served.isEmpty && !head.complete &&
            head.rows.length < headSize.toLong * maxBlocks) {
          head = extend(c, head)
          served = serveFromHead(head, c, limit, cursor)
        }
        served.getOrElse {
          // past the maxBlocks bound: per-request Spark query
          fallbacksN.incrementAndGet()
          FeedPage.pageCollected(spark, store(c.key), c, limit, cursor, requesterDid)
        }
      case _ =>
        fallbacksN.incrementAndGet()
        FeedPage.pageCollected(spark, store(c.key), c, limit, cursor, requesterDid)
    }
  }

  // single-flight registry: at most one in-flight build per feed —
  // concurrent cold requests WAIT on the winner's future instead of
  // duplicating its Spark job
  private val building =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.CompletableFuture[Head]]()

  /** `join()` wraps the builder's exception in CompletionException, so a
    * request that coalesced onto a FAILED build would see a different
    * exception type than the winning builder (which throws raw) — unwrap,
    * so the error surface is identical on both sides of the race. */
  private def joinUnwrapped(
      f: java.util.concurrent.CompletableFuture[Head]): Head =
    try f.join()
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }

  private def headFor(c: Condition, v: String): Head = {
    var waits = 0
    while (true) {
      val cur = cache.get(c.key)
      if (cur != null && cur.version == v) {
        hitsN.incrementAndGet(); cur.touch(); return cur
      }
      val fut = new java.util.concurrent.CompletableFuture[Head]()
      // "b\u0000" purpose prefix: build and extension slots share one
      // registry, and feed keys are unvalidated admin strings — a bare
      // key could collide with another feed's extension slot
      val prior = if (waits >= 2) null
        else building.putIfAbsent("b\u0000" + c.key, fut)
      if (prior == null) {
        // we own the build (or gave up coalescing after repeated
        // version-mismatched waits — the tiny race where tokens flip
        // faster than builds complete must not spin forever). The future
        // MUST be completed on every path, exceptionally included, or
        // waiters would hang forever.
        try {
          val h = try build(c, v, cur == null) catch {
            case t: Throwable => fut.completeExceptionally(t); throw t
          }
          fut.complete(h)
          return h
        } finally building.remove("b\u0000" + c.key, fut)
      } else {
        // another request is building this feed's head: wait for it
        // (a failed build rethrows here — same error a direct build
        // would have surfaced)
        val h = joinUnwrapped(prior)
        if (h.version == v) {
          coalescedN.incrementAndGet(); h.touch(); return h
        }
        waits += 1 // builder raced an older token; retry the cache/build
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def build(c: Condition, v: String, insert: Boolean): Head = {
    buildsN.incrementAndGet()
    // past the bound: evict the LEAST-RECENTLY-USED entry, one per
    // insert — hot feeds keep their heads (a wholesale clear()
    // stampeded ~70 ms rebuilds of EVERY hot head whenever a tenant
    // crossed maxFeeds). The O(size) min-scan is driver-local over
    // ≤ maxFeeds+1 entries, on a path already paying a Spark job.
    // insert=false means we REPLACE our own stale entry — no growth,
    // no eviction needed.
    if (insert && cache.size >= maxFeeds) {
      var victim: java.util.Map.Entry[String, Head] = null
      val it = cache.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (victim == null ||
            e.getValue.lastAccess.get < victim.getValue.lastAccess.get)
          victim = e
      }
      if (victim != null && cache.remove(victim.getKey, victim.getValue))
        evictionsN.incrementAndGet()
    }
    val rows = FeedPage.collectSorted(store(c.key), c, headSize, None)
    val head = Head(v, rows, complete = rows.length < headSize)
    cache.put(c.key, head)
    head
  }

  /** Grow a feed's chain by one block: the next `headSize` rows strictly
    * after the chain's last (ts, cid) boundary — the fallback query, but
    * cached under the same version token. A short block means the feed
    * is exhausted; a null-ts tail row means everything beyond is null-ts
    * too (they sort last) and cursored pages exclude those, so the chain
    * is complete for every page a cursor can reach. */
  private def extend(c: Condition, head: Head): Head = {
    // single-flight per (feed, version, boundary): concurrent deep walks
    // of one feed coalesce onto one block job, like cold builds do
    val slot = "x\u0000" + c.key + "\u0000" + head.version +
      "\u0000" + head.rows.length
    val fut = new java.util.concurrent.CompletableFuture[Head]()
    val prior = building.putIfAbsent(slot, fut)
    if (prior != null) {
      // waited on another request's block job: count it, like headFor's
      // cold-build waits — the coalesced stat is the single-flight
      // savings ledger
      val h = joinUnwrapped(prior)
      coalescedN.incrementAndGet()
      return h
    }
    try {
      val grown = try {
        extensionsN.incrementAndGet()
        head.rows.lastOption match {
          case Some((_, Some(t), cid)) =>
            val block = FeedPage.collectSorted(store(c.key), c, headSize,
              Some(s"$t${Paging.CursorSep}$cid"))
            Head(head.version, head.rows ++ block,
              complete = block.length < headSize)
          case _ => // empty head is already complete at build; null-ts tail
            Head(head.version, head.rows, complete = true)
        }
      } catch { case t: Throwable => fut.completeExceptionally(t); throw t }
      // publish with a CAS, not a put: a racing request may have
      // installed a NEWER-token head while this block built — clobbering
      // it with our older chain would force a redundant rebuild. On CAS
      // failure we still serve `grown` (a correct snapshot for OUR
      // token), just without caching it.
      cache.replace(c.key, head, grown)
      fut.complete(grown)
      grown
    } finally building.remove(slot, fut)
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
