package graft.operators

import graft.model.Condition
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving plane: one feed page over the stored post table —
  * private-feed gate, pinned-post prepend, keyset pagination, cursor
  * encode (/root/reference/src/algos/starrysky.ts:10-84).
  *
  * Output schema: (ord bigint, post string) — ord is the explicit page
  * position (unions have no order guarantee), post is the at-uri.
  */
object FeedPage {

  /** P11 — DID allowlist gate (starrysky.ts:26-40): empty allowlist means
    * public; otherwise the (JWT-verified, upstream) requester DID must be
    * listed. */
  def allowed(c: Condition, requesterDid: Option[String]): Boolean =
    c.privateFeed.isEmpty || requesterDid.exists(c.privateFeed.contains)

  private def emptyPage(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("ord", "post")
  }

  /** Serve one page; also returns the next cursor (None at end). The
    * cursor encode is a separate driver-side single-row action, so callers
    * that don't need a cursor must use [[page]] — going through here would
    * compute the page pipeline twice. */
  def pageWithCursor(spark: SparkSession, store: DataFrame, c: Condition,
      limit: Int, cursor: Option[String], requesterDid: Option[String] = None)
      : (DataFrame, Option[String]) = {
    if (!allowed(c, requesterDid)) return (emptyPage(spark), None)
    val pg = pageRows(store, c, limit, cursor)
    (assemble(spark, pg, c, firstPage = cursor.isEmpty),
      Paging.encodeCursor(pg, col("__ts_us"), col("cid")))
  }

  /** One page, no cursor: a single lazy dataflow with NO eager encode
    * action hidden inside. */
  def page(spark: SparkSession, store: DataFrame, c: Condition, limit: Int,
      cursor: Option[String], requesterDid: Option[String] = None): DataFrame =
    if (!allowed(c, requesterDid)) emptyPage(spark)
    else assemble(spark, pageRows(store, c, limit, cursor), c,
      firstPage = cursor.isEmpty)

  /** The serving HOT PATH: one page in ONE Spark action. Collects the
    * page's ≤limit (uri, ts, cid) rows — already top-k'd by
    * [[Paging.page]]'s TakeOrderedAndProject/TopKPerKey over the
    * partition-pruned scan — and derives the ordinals, the pinned
    * prepend, AND the keyset cursor DRIVER-SIDE from the collected rows.
    * [[pageWithCursor]] pays a second action for the cursor encode (plus
    * a ≤k-row ordinal window); at serving latency those are pure
    * overhead — ServeSmoke measured the two-action path at ~2× the
    * per-request wall. Ordering and cursor are identical by
    * construction: rows sort by the same (ts DESC, cid DESC) key, and
    * the cursor is the last (smallest-ranked) row's `<ts>::<cid>` —
    * equivalence with the DataFrame path is spec-pinned
    * (FeedServerSpec). */
  def pageCollected(spark: SparkSession, store: DataFrame, c: Condition,
      limit: Int, cursor: Option[String], requesterDid: Option[String] = None)
      : (Seq[(Long, String)], Option[String]) = {
    if (!allowed(c, requesterDid)) return (Nil, None)
    assembleCollected(c, firstPage = cursor.isEmpty,
      collectSorted(store, c, limit, cursor))
  }

  /** cid comparator shared by the driver-side sorts and the head cache's
    * keyset slice: UTF-8 BYTE order (UTF8String.compareTo), the same
    * comparator the Spark-side top-k sort and the keyset-cursor
    * predicate use — Java's String '>' (UTF-16 code units) disagrees
    * with it when U+E000–U+FFFF chars mix with supplementary code
    * points, which would emit a cursor inconsistent with the filter. */
  private[graft] def cidUtf8Gt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) > 0

  /** The collected, driver-sorted (uri, tsUs, cid) rows of one page
    * query — ≤ limit rows, (ts DESC nulls-last, cid DESC UTF-8) order.
    * Shared by [[pageCollected]] (per request) and
    * [[graft.serving.FeedHeadCache]] (once per feed per store version,
    * with `limit` = the head size). */
  private[graft] def collectSorted(store: DataFrame, c: Condition, limit: Int,
      cursor: Option[String]): Vector[(String, Option[Long], String)] = {
    val rows = pageRows(store, c, limit, cursor)
      .select(col("uri"), col("__ts_us"), col("cid")).collect()
    def ts(r: org.apache.spark.sql.Row): Long =
      if (r.isNullAt(1)) Long.MinValue else r.getLong(1)
    rows.sortWith { (a, b) =>
      ts(a) > ts(b) || (ts(a) == ts(b) && cidUtf8Gt(a.getString(2), b.getString(2)))
    }.iterator.map { r =>
      (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2))
    }.toVector
  }

  /** Driver-side page assembly — pinned prepend, ordinals, cursor emit —
    * over rows already capped and sorted ([[collectSorted]] order).
    * Null-ts rows sort last and never produce a cursor (the
    * encodeCursor contract). */
  private[graft] def assembleCollected(c: Condition, firstPage: Boolean,
      sorted: Seq[(String, Option[Long], String)])
      : (Seq[(Long, String)], Option[String]) = {
    val startAt = if (firstPage) c.pinnedPost.size.toLong else 0L
    val pinned =
      if (firstPage) c.pinnedPost.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      else Nil
    val paged = sorted.zipWithIndex.map { case ((uri, _, _), i) =>
      (startAt + i, uri)
    }
    val next = sorted.lastOption.collect { case (_, Some(t), cid) =>
      s"$t${Paging.CursorSep}$cid"
    }
    (pinned ++ paged, next)
  }

  private def pageRows(store: DataFrame, c: Condition, limit: Int,
      cursor: Option[String]): DataFrame =
    Paging.page(
      store.filter(col("key") === c.key)
        .withColumn("__ts_us", unix_micros(col("indexedAt"))),
      col("__ts_us"), col("cid"), limit, cursor)

  private def assemble(spark: SparkSession, pg: DataFrame, c: Condition,
      firstPage: Boolean): DataFrame = {
    val startAt = if (firstPage) c.pinnedPost.size.toLong else 0L
    val rows = Paging.withOrdinal(pg, col("__ts_us"), col("cid"), startAt)
      .select(col("ord"), col("uri").as("post"))
    val out =
      if (firstPage && c.pinnedPost.nonEmpty) {
        import spark.implicits._
        val pinned = c.pinnedPost.zipWithIndex
          .map { case (uri, i) => (i.toLong, uri) }.toDF("ord", "post")
        pinned.unionByName(rows)
      } else rows
    out.orderBy(col("ord"))
  }

  /** describeFeedGenerator (describe-generator.ts:5-27): all feed at-uris. */
  def describe(spark: SparkSession, conditions: Seq[Condition], publisherDid: String): DataFrame = {
    import spark.implicits._
    conditions.map(c => s"at://$publisherDid/app.bsky.feed.generator/${c.recordName}")
      .toDF("uri")
  }
}
