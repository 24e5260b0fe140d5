package graft.model

/** Mutable standing-query control plane — the in-process analog of the
  * reference's `conditions` sqlite table as seen by the admin CRUD
  * endpoints (/root/reference/src/databaseUtil.ts:9-192). The engine
  * reads an immutable snapshot per query ([[conditions]]); the serving
  * tier mutates through the three reference verbs.
  *
  * `recordCount` is the STORED per-feed counter the reference keeps on
  * the conditions row (schema.ts) and the ingest loop advances — it is
  * deliberately not derived from the post store, because the reference's
  * full-replace path resets it to 0 while the key's posts are retained
  * (databaseUtil.ts:77-108): after a `setQuery` the counter and the store
  * disagree until the next refresh cycle, and `getQuery` reports the
  * stale 0. That quirk is kept bit-for-bit here.
  *
  * At scale this object is one row-per-feed of metadata behind an
  * ordinary database — the Spark side only ever sees the broadcast
  * conditions snapshot, so N serving replicas sharing a real control
  * store behave identically.
  */
final class ControlPlane(initial: Seq[Condition] = Nil) {

  private var conds: Vector[Condition] = initial.toVector
  private val counts = scala.collection.mutable.Map[String, Long]()
  private val execTimes = scala.collection.mutable.Map[String, String]()
  // display-only passthrough fields (feedName/feedAvatar/feedDescription):
  // stored verbatim for getQuery, never consulted by the engine
  private val metas = scala.collection.mutable.Map[String, Map[String, String]]()

  /** Immutable snapshot for query planning / serving. */
  def conditions: Seq[Condition] = synchronized(conds)

  def get(key: String): Option[Condition] = synchronized(conds.find(_.key == key))

  def recordCount(key: String): Long = synchronized(counts.getOrElse(key, 0L))

  /** Ingest-side counter advance (subscription loop's UPDATE). */
  def setRecordCount(key: String, n: Long): Unit = synchronized { counts(key) = n }

  /** The reference's `lastExecTime` varchar on the conditions row
    * (db/schema.ts:36): None until the first ingest cycle writes it
    * (subscription.ts:374) — getQuery reports null then, like a fresh
    * SQLite row. */
  def lastExecTime(key: String): Option[String] = synchronized(execTimes.get(key))

  def setLastExecTime(key: String, t: String): Unit = synchronized { execTimes(key) = t }

  def meta(key: String): Map[String, String] = synchronized(metas.getOrElse(key, Map.empty))

  def setMeta(key: String, m: Map[String, String]): Unit = synchronized { metas(key) = m }

  /** Full-replace upsert (databaseUtil.ts:77-108): delete + insert, the
    * fresh row starting at recordCount 0 — posts for the key are NOT
    * touched, so the counter goes stale on purpose (reference parity). */
  def setQuery(c: Condition): Unit = synchronized {
    conds = conds.filterNot(_.key == c.key) :+ c
    counts(c.key) = 0L
    execTimes.remove(c.key) // fresh row: no cycle has timed it yet
  }

  /** Remove the condition row; the caller deletes the key's posts
    * (databaseUtil.ts:169-192 deletes from both tables). */
  def delete(key: String): Unit = synchronized {
    conds = conds.filterNot(_.key == key)
    counts.remove(key)
    execTimes.remove(key)
    metas.remove(key)
  }
}
