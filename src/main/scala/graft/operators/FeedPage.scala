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
