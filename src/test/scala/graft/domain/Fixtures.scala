package graft.domain

import graft.model._

/** Engine-domain fixtures per FIXTURES.md §B2/B3: rows covering every
  * cascade branch — include/exclude hits, images with/without alt, labels
  * null/empty/present, replies, langs, profile-only matches.
  */
object Fixtures {

  def img(alt: String): Image = Image(Some(alt), Some(AspectRatio(640, 480)),
    Some("https://cdn/full.jpg"), Some("https://cdn/thumb.jpg"))

  def pv(uri: String, cid: String, text: String, createdAt: String,
      did: String = "did:plc:alice",
      langs: Seq[String] = Seq("en"),
      images: Seq[Image] = Nil,
      reply: Option[Reply] = None,
      labels: Option[Seq[LabelRef]] = None,
      displayName: String = "Alice",
      description: String = "engineer"): PostView =
    PostView(uri, cid, Author(did, Some(displayName), Some(description)),
      PostRecord(Some(text), createdAt, Some(langs),
        reply,
        if (images.isEmpty) None else Some(Embed(Some(images)))),
      labels)

  val reply1: Reply = Reply(StrongRef("at://r/root", "cr"), StrongRef("at://r/parent", "cp"))

  val posts: Seq[PostView] = Seq(
    pv("at://a/1", "c01", "spark makes light work", "2024-03-01T10:00:00.000Z"),
    pv("at://a/2", "c02", "nothing relevant here", "2024-03-01T10:01:00.000Z"),
    pv("at://a/3", "c03", "SPARK in caps", "2024-03-01T10:02:00.000Z"),
    pv("at://a/4", "c04", "spark but excluded word banana", "2024-03-01T10:03:00.000Z"),
    pv("at://a/5", "c05", "plain text", "2024-03-01T10:04:00.000Z",
      images = Seq(img("a spark in the alt text"))),
    pv("at://a/6", "c06", "spark with image", "2024-03-01T10:05:00.000Z",
      images = Seq(img("scenery"))),
    pv("at://a/7", "c07", "spark as a reply", "2024-03-01T10:06:00.000Z",
      reply = Some(reply1)),
    pv("at://a/8", "c08", "spark labeled", "2024-03-01T10:07:00.000Z",
      labels = Some(Seq(LabelRef("did:plc:mod", "at://a/8", "nsfw", "2024-03-01T10:07:01.000Z")))),
    pv("at://a/9", "c09", "spark labeled empty", "2024-03-01T10:08:00.000Z",
      labels = Some(Nil)),
    pv("at://a/10", "c10", "spark en español", "2024-03-01T10:09:00.000Z",
      langs = Seq("es")),
    // out-of-order late arrival (event time before all others)
    pv("at://a/11", "c11", "late spark", "2024-02-29T23:59:00.000Z"),
    // profile-only match: text hits ONLY the narrow term
    pv("at://a/12", "c12", "vector all alone", "2024-03-01T10:10:00.000Z",
      did = "did:plc:bob", displayName = "Bob", description = "loves spark infra"),
    pv("at://a/13", "c13", "vector all alone too", "2024-03-01T10:11:00.000Z",
      did = "did:plc:carol", displayName = "Carol", description = "gardening"),
  )

  val profiles: Seq[Profile] = Seq(
    Profile("did:plc:alice", "Alice", "engineer"),
    Profile("did:plc:bob", "Bob", "loves spark infra"),
    Profile("did:plc:carol", "Carol", "gardening"),
  )

  def cond(key: String = "feed1",
      inputRegex: String = "spark|vector",
      invertRegex: String = "",
      lang: Option[String] = None,
      labelDisable: Boolean = false,
      replyDisable: Boolean = false,
      imageOnly: String = "",
      includeAltText: Boolean = false,
      profileMatch: Option[ProfileMatch] = None,
      pinnedPost: Seq[String] = Nil,
      privateFeed: Seq[String] = Nil,
      limitCount: Int = 2000,
      refresh: Int = 0,
      initPost: Int = 100): Condition =
    Condition(key, key, "spark", inputRegex, invertRegex, refresh, lang,
      labelDisable, replyDisable, imageOnly, includeAltText, initPost, limitCount,
      pinnedPost, privateFeed, profileMatch)
}
