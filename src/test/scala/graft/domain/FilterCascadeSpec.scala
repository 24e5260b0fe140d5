package graft.domain

import graft.SparkSpec
import graft.model.ProfileMatch
import graft.operators.FilterCascade
import org.apache.spark.sql.DataFrame

class FilterCascadeSpec extends SparkSpec {

  import Fixtures._

  private lazy val postsDf: DataFrame = {
    val s = spark
    import s.implicits._
    posts.toDF().cache()
  }
  private lazy val profilesDf: DataFrame = {
    val s = spark
    import s.implicits._
    profiles.toDF().cache()
  }

  private def urisFor(c: graft.model.Condition): Set[String] =
    FilterCascade(postsDf, c, Some(profilesDf))
      .select("uri").collect().map(_.getString(0)).toSet

  test("include regex is case-insensitive and counts matches (P3)") {
    val got = urisFor(cond())
    assert(got.contains("at://a/1"))
    assert(got.contains("at://a/3")) // SPARK uppercase
    assert(!got.contains("at://a/2"))
    assert(!got.contains("at://a/5")) // alt text NOT searched by default
  }

  test("exclude regex drops matches; empty pattern disables (P4)") {
    val got = urisFor(cond(invertRegex = "banana"))
    assert(!got.contains("at://a/4"))
    assert(got.contains("at://a/1"))
  }

  test("includeAltText extends the searched text with image ALTs (P5)") {
    val got = urisFor(cond(includeAltText = true))
    assert(got.contains("at://a/5"))
  }

  test("imageOnly / textOnly 3-state enum (P6)") {
    val withImg = urisFor(cond(imageOnly = "imageOnly"))
    assert(withImg == Set("at://a/6")) // only image post matching 'spark' in text
    val textOnly = urisFor(cond(imageOnly = "textOnly"))
    assert(!textOnly.contains("at://a/6"))
    assert(textOnly.contains("at://a/1"))
  }

  test("labelDisable drops labeled posts, keeps empty/missing labels (P7, divergence §7.4#3)") {
    val got = urisFor(cond(labelDisable = true))
    assert(!got.contains("at://a/8"))
    assert(got.contains("at://a/9")) // labels = [] kept
    assert(got.contains("at://a/1")) // labels missing kept (divergence)
  }

  test("replyDisable drops replies (P8)") {
    val got = urisFor(cond(replyDisable = true))
    assert(!got.contains("at://a/7"))
    assert(got.contains("at://a/1"))
  }

  test("lang filter (P10)") {
    val got = urisFor(cond(lang = Some("es")))
    assert(got == Set("at://a/10"))
  }

  test("profileMatch: term-only posts require a profile-regex hit (P9)") {
    val got = urisFor(cond(profileMatch = Some(ProfileMatch("vector", "spark"))))
    assert(got.contains("at://a/12")) // Bob's profile mentions spark
    assert(!got.contains("at://a/13")) // Carol's doesn't
    assert(got.contains("at://a/1")) // text matches more than the term → no profile gate
  }

  test("stored rows carry event time and reply refs (schema)") {
    val rows = FilterCascade(postsDf, cond(), Some(profilesDf))
      .orderBy("uri").collect()
    val r7 = rows.find(_.getString(0) == "at://a/7").get
    assert(r7.getAs[String]("replyParent") == "at://r/parent")
    assert(r7.getAs[String]("replyRoot") == "at://r/root")
    assert(r7.getAs[java.sql.Timestamp]("indexedAt") != null)
    assert(rows.forall(_.getAs[String]("key") == "feed1"))
  }

  test("fanOut over all conditions equals per-condition application") {
    val cs = Seq(
      cond(key = "f1"),
      cond(key = "f2", invertRegex = "banana", replyDisable = true),
      cond(key = "f3", lang = Some("es")),
      cond(key = "f4", profileMatch = Some(ProfileMatch("vector", "spark"))),
      cond(key = "f5", imageOnly = "imageOnly", includeAltText = true),
    )
    val fanned = FilterCascade.fanOut(postsDf,
        FilterCascade.conditionsDf(spark, cs), Some(profilesDf))
      .select("key", "uri").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val perCond = cs.flatMap(c =>
      FilterCascade(postsDf, c, Some(profilesDf))
        .select("uri").collect().map(r => (c.key, r.getString(0)))).toSet
    assert(fanned == perCond)
    assert(fanned.nonEmpty)
  }
}
