package graft.model

import java.sql.Timestamp

/** Engine-domain data model, normalized per SURVEY.md §1.3 from the
  * reference's schemas (/root/reference/src/db/schema.ts:7-44 and the
  * lexicon post/profile documents, /root/reference/src/subscription.ts:13-31).
  * Timestamps are real TimestampType (UTC), not ISO strings; flags are real
  * Booleans, not 'true' strings; delimited strings are arrays/structs.
  */

final case class StrongRef(uri: String, cid: String)

final case class Reply(root: StrongRef, parent: StrongRef)

final case class AspectRatio(width: Int, height: Int)

final case class Image(alt: Option[String], aspectRatio: Option[AspectRatio],
    fullsize: Option[String], thumb: Option[String])

final case class Embed(images: Option[Seq[Image]])

final case class Author(did: String, displayName: Option[String],
    description: Option[String])

final case class LabelRef(src: String, uri: String, `val`: String, cts: String)

final case class PostRecord(text: Option[String], createdAt: String,
    langs: Option[Seq[String]], reply: Option[Reply], embed: Option[Embed])

/** One inbound search hit / firehose create (the PostView wire shape). */
final case class PostView(uri: String, cid: String, author: Author,
    record: PostRecord, labels: Option[Seq[LabelRef]])

/** One stored feed row — PK (uri, key); indexedAt = record.createdAt
  * (event time, subscription.ts:355-361). */
final case class Post(uri: String, key: String, cid: String,
    replyParent: Option[String], replyRoot: Option[String], indexedAt: Timestamp)

/** Profile dimension row (getProfiles result, subscription.ts:257-263). */
final case class Profile(did: String, displayName: String, description: String) {
  def profileText: String = s"$displayName $description"
}

/** Firehose op row (util/subscription.ts:124-145). */
final case class RepoOp(action: String, collection: String, uri: String,
    cid: String, author: String, record: Option[PostRecord], seq: Long)
