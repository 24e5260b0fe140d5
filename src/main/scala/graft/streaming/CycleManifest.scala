package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path

/** The per-feed landed-batch counters, persisted NEXT TO the versioned
  * store's `_current` pointer — the piece that makes head-block-cache
  * invalidation visible to serving replicas that do NOT run the drain.
  *
  * Why it exists: [[graft.serving.FeedHeadCache]]'s invalidation token
  * composes the store pointer (flipped only by compaction/deletes) with
  * the feed's landed-batch counter, because streaming appends do not
  * flip the pointer. In-process that counter is
  * [[graft.model.ConditionMetrics.keyCycle]] — but the stated
  * deployment form is N stateless serving replicas over one store, and
  * a replica that isn't the drain process never sees the in-process
  * bumps, so it had to run with caching disabled and pay the ~70–130 ms
  * per-request planning floor. The manifest routes the same counters
  * through the store: the drain persists them after every recorded
  * micro-batch (temp + atomic rename, same publish discipline as the
  * pointer), and replicas fold the persisted (gen, count) into their
  * version tokens.
  *
  * Ordering: the drain records metrics AFTER a batch's rows are visible
  * (the r18 token-ordering rule), and the manifest write happens inside
  * that record — so a replica can at worst serve the previous head for
  * the instant between rows-visible and manifest-landed, the same
  * read-your-writes bound two back-to-back uncached requests already
  * have. It can never serve a token-fresh head built from pre-drain
  * rows.
  *
  * Restart safety: tokens must stay unique across drain-process
  * incarnations — a fresh process's in-memory counters restart at
  * (gen 0, count 0), and a replica still holds tokens from the previous
  * incarnation, so a re-climbing counter would collide ("0:5" naming
  * two different stores). [[Writer]] therefore resumes generations
  * MONOTONE across restarts: baseGen = previous manifest's gen + 1.
  *
  * Scale: one tiny driver-side file per drain (≤ the metrics map's
  * 8192-key bound, ~300 KB worst case, typically bytes); replicas stat
  * it per request and re-parse only when (mtime, length) changes.
  */
object CycleManifest {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val Name = "_graft_cycles"

  def manifestPath(storeDir: String): Path = StoreFs.path(storeDir, Name)

  private def parse(s: String): (Long, Map[String, Long]) = {
    val node = new ObjectMapper().readTree(s)
    val counts = Map.newBuilder[String, Long]
    val it = node.get("counts").fields()
    while (it.hasNext) {
      val e = it.next()
      counts += e.getKey -> e.getValue.asLong()
    }
    (node.get("gen").asLong(), counts.result())
  }

  /** Missing / Corrupt / Parsed — a corrupt manifest must degrade like a
    * missing one (replica serves uncached, drain keeps draining), not
    * take down Writer construction or every replica request, the way
    * persist() failures already degrade to a WARN. */
  private sealed trait Manifest
  private case object Missing extends Manifest
  private case object Corrupt extends Manifest
  private final case class Parsed(gen: Long, counts: Map[String, Long])
      extends Manifest

  private def readManifest(storeDir: String): Manifest = {
    val p = manifestPath(storeDir)
    if (!StoreFs.exists(p)) Missing
    else
      try { val (g, c) = parse(StoreFs.readString(p)); Parsed(g, c) }
      catch {
        case scala.util.control.NonFatal(t) =>
          log.warn(s"cycle manifest at '$p' is unreadable (corrupt or " +
            s"truncated) — treating it as absent until the next drain " +
            s"persists a fresh one: $t")
          Corrupt
      }
  }

  /** Current persisted (generation, per-feed landed-batch counts), or
    * None when no drain has ever persisted one — or when the file is
    * corrupt (WARNed; callers degrade exactly as if it were absent). */
  def read(storeDir: String): Option[(Long, Map[String, Long])] =
    readManifest(storeDir) match {
      case Parsed(g, c) => Some((g, c))
      case _ => None
    }

  /** Drain-side writer: wire it as the [[graft.model.ConditionMetrics]]
    * persist hook so every recorded micro-batch publishes its counters.
    * One instance per drain process — construction reads the previous
    * incarnation's manifest to resume generations monotone. */
  final class Writer(storeDir: String) {
    // Monotone resume: prior gen + 1. A CORRUPT prior manifest hides the
    // value to resume above, so take a conservative bump far beyond any
    // count-derived gen (gens count bounded-map resets — reaching epoch-ms
    // magnitude organically would take millennia): the successor's tokens
    // can never collide with any token the unreadable history issued.
    private val baseGen: Long = readManifest(storeDir) match {
      case Parsed(g, _) => g + 1L
      case Missing => 0L
      case Corrupt => System.currentTimeMillis()
    }

    // Unique per-incarnation staging name. It must NOT contain ".tmp":
    // VersionedStore.swap's GC deletes any store-root `*.tmp*` name as a
    // crash leftover, so a persist racing a compaction would lose its
    // staging file between write and rename. Per-incarnation uniqueness
    // also keeps a split-brain restart from interleaving writes into one
    // staging file. Construction sweeps previous incarnations' crash
    // leftovers (≤1 per crash); a DEPOSED still-alive writer can lose
    // the one persist in flight during that sweep — benign, its counters
    // are monotone and re-persist on its next record (and deposed drains
    // are fenced by the store lease anyway).
    private val staging =
      Name + ".staging." + java.util.UUID.randomUUID().toString
    StoreFs.listNames(StoreFs.path(storeDir))
      .filter(_.startsWith(Name + ".staging."))
      .foreach(n => StoreFs.deleteRecursively(StoreFs.path(storeDir, n)))

    def persist(gen: Long, counts: Map[String, Long]): Unit =
      try {
        val om = new ObjectMapper()
        val root = om.createObjectNode()
        root.put("gen", baseGen + gen)
        val c = root.putObject("counts")
        counts.foreach { case (k, v) => c.put(k, v) }
        // readers see the whole old manifest or the whole new one
        StoreFs.publishString(manifestPath(storeDir),
          om.writeValueAsString(root), staging)
      } catch {
        case scala.util.control.NonFatal(t) =>
          // a lost persist must actually BE benign, not fail the drain's
          // micro-batch: counters are monotone and re-persist on the next
          // record, and the concrete loss cases are losses we accept — a
          // successor incarnation's constructor sweep deleting a deposed
          // writer's in-flight staging file, or FS hiccups a replica just
          // rides out on the previous manifest. Persistent failure = one
          // WARN per drain, impossible to miss.
          log.warn(s"cycle-manifest persist failed for '$storeDir' " +
            "(replicas keep serving the previous manifest until the next " +
            s"drain persists): $t")
      }
  }

  /** Asynchronous single-flight latest-wins wrapper around a persist
    * hook — the drain-side wiring that takes the manifest write OFF the
    * [[graft.model.ConditionMetrics.record]] lock. record() used to run
    * the FS write + rename inline (ordering was the point: out-of-order
    * persists would regress the replica counters), which meant a slow
    * store — object-store latency spikes, an NFS hiccup — stalled the
    * drain's NEXT micro-batch behind a metadata write.
    *
    * This preserves exactly the property the inline call bought, without
    * the blocking: `submit` replaces a single pending slot and returns
    * (never waits on the FS); ONE worker thread drains the slot,
    * persisting the newest snapshot. Because submits arrive in record()
    * order (record is synchronized) and the worker takes the latest slot
    * value serially, the published sequence is a SUBSEQUENCE of the
    * submitted sequence — monotone (gen, count) publication, skipping
    * intermediates under load (latest-wins: replicas only ever want the
    * newest counters anyway).
    *
    * Loss bound: a crash loses at most the pending + in-flight snapshots
    * — the same "last persist in flight" loss the synchronous form had,
    * already proven benign (counters re-persist on the next record;
    * [[Writer.persist]] WARNs on failure instead of throwing). `close`
    * flushes on an orderly drain stop. */
  final class AsyncPublisher(underlying: (Long, Map[String, Long]) => Unit,
      threadName: String = "graft-cycle-manifest-publisher") {
    private val lock = new Object
    private var latest: (Long, Map[String, Long]) = null
    private var inFlight = false
    private var closed = false
    private val publishedN = new java.util.concurrent.atomic.AtomicLong
    private val worker = new Thread(() => run(), threadName)
    worker.setDaemon(true)
    worker.start()

    /** Snapshots actually persisted (≤ submits under load — the
      * latest-wins savings ledger, for specs and smokes). */
    def published: Long = publishedN.get

    /** Replace the pending snapshot; never blocks on the filesystem. */
    def submit(gen: Long, counts: Map[String, Long]): Unit =
      lock.synchronized {
        if (!closed) { latest = (gen, counts); lock.notifyAll() }
      }

    private def run(): Unit = {
      while (true) {
        val next = lock.synchronized {
          while (latest == null && !closed) lock.wait()
          if (latest == null) return // closed and drained
          val n = latest; latest = null; inFlight = true; n
        }
        // underlying is Writer.persist in production, which WARNs
        // instead of throwing; the guard keeps a foreign hook's failure
        // from killing the worker (the loop must outlive any one write)
        try underlying(next._1, next._2)
        catch { case scala.util.control.NonFatal(_) => () }
        publishedN.incrementAndGet()
        lock.synchronized { inFlight = false; lock.notifyAll() }
      }
    }

    /** Wait until nothing is pending or in flight (true) or the timeout
      * passes (false) — the orderly-shutdown and spec barrier. */
    def flush(timeoutMs: Long = 10000L): Boolean = lock.synchronized {
      val deadline = System.currentTimeMillis() + timeoutMs
      while ((latest != null || inFlight) &&
          System.currentTimeMillis() < deadline)
        lock.wait(math.max(1L, deadline - System.currentTimeMillis()))
      latest == null && !inFlight
    }

    /** Orderly stop: flush the last snapshot, then end the worker. With
      * `flushPending = false` (the hard-kill path) any pending snapshot
      * is DISCARDED — the documented benign loss a real kill has. */
    def close(flushPending: Boolean = true): Unit = {
      if (flushPending) flush()
      lock.synchronized {
        if (!flushPending) latest = null
        closed = true
        lock.notifyAll()
      }
      worker.join(10000L)
    }
  }

  /** Replica-side reader: per call it STATS the manifest and re-parses
    * only when (mtime, length) changed — a namespace op, not a read, on
    * the head-cache hot path. Caveat: two manifests landing within the
    * same millisecond with identical byte length are indistinguishable
    * to the stat; drains are seconds apart in production and the next
    * drain heals a missed one, so the exposure is the same
    * read-your-writes bound the token already carries. `statIntervalMs`
    * throttles the stat itself: within the interval the cached snapshot
    * is served with NO filesystem call, so a drain's counters become
    * visible at most `statIntervalMs` later than its rename — the
    * staleness bound. 0 = stat every call (exact, right when the store
    * is a local FS/HDFS where a stat is ~µs; on object storage a
    * per-request ~10–30 ms RPC re-adds the very floor the head cache
    * exists to kill — see [[DefaultStatIntervalMs]] for the measured
    * default the deployment entry point uses). `statFn` is the
    * simulation hook the cadence A/B injects latency through. */
  final class Reader(storeDir: String, statIntervalMs: Long = 0L,
      statFn: Path => Option[(Long, Long)] = StoreFs.statOf) {
    private final case class Cached(mtime: Long, len: Long, gen: Long,
        counts: Map[String, Long])
    // sentinel gen marking "this (mtime, len) failed to parse" — lets the
    // corrupt-file answer (None, serve uncached) be cached per CHANGE
    // instead of re-parsing the bad bytes on every request
    private val CorruptGen = Long.MinValue
    @volatile private var cached: Cached = _
    @volatile private var lastStat = 0L

    private def cachedResult(c: Cached): Option[(Long, Map[String, Long])] =
      if (c.gen == CorruptGen) None else Some((c.gen, c.counts))

    def snapshot(): Option[(Long, Map[String, Long])] = {
      val c = cached
      if (c != null && statIntervalMs > 0 &&
          System.currentTimeMillis() - lastStat < statIntervalMs)
        return cachedResult(c)
      val p = manifestPath(storeDir)
      statFn(p) match {
        case None => None // no manifest yet: replica cannot cache
        case Some((mtime, len)) =>
          lastStat = System.currentTimeMillis()
          if (c != null && c.mtime == mtime && c.len == len)
            cachedResult(c)
          else {
            // a concurrent rename between the stat and this read just
            // means we parse the NEWER manifest under the older stat;
            // the next change re-parses (counters are monotone)
            val parsed =
              try Some(parse(StoreFs.readString(p)))
              catch {
                case scala.util.control.NonFatal(t) =>
                  log.warn(s"cycle manifest at '$p' is unreadable — " +
                    s"replica serves uncached until a drain persists a " +
                    s"fresh one: $t")
                  None
              }
            val next = parsed match {
              case None =>
                // corrupt: remember the (mtime, len) so the bad file is
                // parsed once per change, not once per request
                Cached(mtime, len, CorruptGen, Map.empty)
              case Some((gen, _))
                  if c != null && c.gen != CorruptGen && gen < c.gen =>
                // monotone-gen fence (belt and suspenders for a deposed
                // writer's late rename landing after its successor's):
                // keep the newer counters, adopt the stat so the stale
                // file is not re-parsed per request — the live writer's
                // next persist moves the stat again and wins
                log.warn(s"cycle manifest at '$p' regressed gen $gen < " +
                  s"${c.gen} (late write from a deposed drain?) — keeping " +
                  "the newer generation")
                Cached(mtime, len, c.gen, c.counts)
              case Some((gen, counts)) => Cached(mtime, len, gen, counts)
            }
            cached = next
            cachedResult(next)
          }
      }
    }

    /** The replica's equivalent of [[graft.model.ConditionMetrics
      * .keyCycle]], from the persisted counters. None = no manifest. */
    def keyCycle(key: String): Option[String] =
      snapshot().map { case (g, m) => s"$g:${m.getOrElse(key, 0L)}" }
  }

  /** Default version-source cadence for serving replicas, picked from
    * the measured A/B in SCALE.md (§replica stat cadence): an uncached
    * version read costs THREE namespace ops (manifest stat + pointer
    * exists + pointer read) — ~µs on a local FS, but ~10–30 ms EACH on
    * object storage, which would quietly re-add the per-request floor
    * the head cache exists to kill. At 250 ms the FS cost amortizes to
    * ~zero per request while a drain's counters (and a compaction's
    * pointer flip) become visible at most 250 ms late — well inside the
    * seconds-apart drain cadence, and the same read-your-writes
    * staleness class the token already carries. Pass 0 for
    * stat-per-request exactness (local-FS deployments, specs that
    * assert immediate visibility). */
  val DefaultStatIntervalMs = 250L

  /** The complete replica-side version source for a
    * [[graft.serving.FeedHeadCache]] over `storeDir`: store pointer +
    * persisted per-feed landed-batch counter — token-compatible in
    * STRUCTURE with the drain process's in-process source (pointer +
    * keyCycle), but routed entirely through the store. Returns None
    * (caching disabled) until the first drain persists a manifest, so a
    * replica over a store whose drain predates the manifest never
    * serves a stale head. Both the manifest stat AND the pointer read
    * ride the same `statIntervalMs` throttle ([[DefaultStatIntervalMs]])
    * — the pointer is the other per-request namespace op, and it flips
    * only on compaction/delete swaps, so a ≤interval-late flip is the
    * same bounded staleness. */
  def replicaVersion(storeDir: String,
      statIntervalMs: Long = DefaultStatIntervalMs)
      : String => Option[String] = {
    val reader = new Reader(storeDir, statIntervalMs)
    val root = new Path(storeDir)
    @volatile var ptrCache: (Long, String) = null // (readAtMs, pointer)
    def pointer(): String = {
      val c = ptrCache
      val now = System.currentTimeMillis()
      if (c != null && statIntervalMs > 0 && now - c._1 < statIntervalMs) c._2
      else {
        val p = VersionedStore.currentVersion(root).getOrElse("_root")
        ptrCache = (now, p)
        p
      }
    }
    key => reader.keyCycle(key).map(kc => pointer() + ":" + kc)
  }
}
