package graft.model

import java.util.regex.Pattern

import scala.util.Try

/** One standing query (= one feed). Raw wire form keeps the reference's
  * type quirks (string booleans, comma-joined lists, '::' pairs —
  * /root/reference/src/db/schema.ts:22-44); `Condition` is the normalized
  * engine form. Defaults mirror the restore path
  * (/root/reference/src/subscription.ts:73-92): initPost→100,
  * limitCount→2000, missing strings→''.
  */
final case class ProfileMatch(textTerm: String, profileRegex: String)

final case class ConditionRaw(
    key: String, recordName: String, query: String, inputRegex: String,
    invertRegex: Option[String], refresh: Option[Int], lang: Option[String],
    labelDisable: Option[String], replyDisable: Option[String],
    imageOnly: Option[String], includeAltText: Option[String],
    initPost: Option[Int], pinnedPost: Option[String],
    limitCount: Option[Int], privateFeed: Option[String],
    profileMatch: Option[String])

final case class Condition(
    key: String, recordName: String, query: String, inputRegex: String,
    invertRegex: String, refresh: Int, lang: Option[String],
    labelDisable: Boolean, replyDisable: Boolean, imageOnly: String,
    includeAltText: Boolean, initPost: Int, limitCount: Int,
    pinnedPost: Seq[String], privateFeed: Seq[String],
    profileMatch: Option[ProfileMatch])

object Condition {

  /** String-bool per the reference: only the literal 'true' is true
    * (subscription.ts:284,310,315). */
  private def sbool(v: Option[String]): Boolean = v.contains("true")

  private def csv(v: Option[String]): Seq[String] =
    v.filter(_.nonEmpty).map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Nil)

  def normalize(raw: ConditionRaw): Condition = Condition(
    key = raw.key,
    recordName = raw.recordName,
    query = raw.query,
    inputRegex = raw.inputRegex,
    invertRegex = raw.invertRegex.getOrElse(""),
    refresh = raw.refresh.getOrElse(0),
    lang = raw.lang.filter(_.nonEmpty),
    labelDisable = sbool(raw.labelDisable),
    replyDisable = sbool(raw.replyDisable),
    imageOnly = raw.imageOnly.getOrElse(""),
    includeAltText = sbool(raw.includeAltText),
    initPost = raw.initPost.filter(_ > 0).getOrElse(100),
    limitCount = raw.limitCount.filter(_ > 0).getOrElse(2000),
    pinnedPost = csv(raw.pinnedPost),
    privateFeed = csv(raw.privateFeed),
    profileMatch = raw.profileMatch.filter(_.contains("::")).map { s =>
      val Array(term, re) = s.split("::", 2)
      ProfileMatch(term, re)
    },
  )

  /** CRUD-boundary validation (P13, /root/reference/src/databaseUtil.ts:17-75):
    * record-name shape, regex compilability, non-negative ints. */
  def validate(raw: ConditionRaw): Either[String, ConditionRaw] = {
    def compiles(p: String): Boolean =
      p.isEmpty || Try(Pattern.compile(p, Pattern.CASE_INSENSITIVE)).isSuccess
    if (!raw.recordName.matches("^[a-z0-9-]{1,15}$"))
      Left(s"invalid recordName: ${raw.recordName}")
    else if (raw.inputRegex.isEmpty || !compiles(raw.inputRegex))
      Left(s"invalid inputRegex: ${raw.inputRegex}")
    else if (!compiles(raw.invertRegex.getOrElse("")))
      Left(s"invalid invertRegex")
    else if (raw.initPost.exists(_ < 0) || raw.limitCount.exists(_ < 0))
      Left("negative count")
    else Right(raw)
  }
}
