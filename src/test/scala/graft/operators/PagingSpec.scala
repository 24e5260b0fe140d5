package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PagingSpec extends SparkSpec {

  private lazy val base = Tables(spark, sf0001).events
    .filter(col("event_type") === "purchase")
    .withColumn("ts_us", unix_micros(col("ts")))
    .select("event_id", "ts_us")
    .cache()

  test("cursor encode/decode round-trips") {
    val page = Paging.page(base, col("ts_us"), col("event_id"), 10, None)
    val cur = Paging.encodeCursor(page, col("ts_us"), col("event_id"))
    assert(cur.isDefined)
    val (ts, id) = Paging.decodeCursor(cur.get)
    assert(cur.get == s"$ts::$id")
  }

  test("malformed cursor raises") {
    intercept[IllegalArgumentException](Paging.decodeCursor("garbage"))
    intercept[IllegalArgumentException](Paging.decodeCursor("12x::3"))
  }

  test("empty page yields no cursor") {
    val empty = Paging.page(base.filter(lit(false)), col("ts_us"), col("event_id"), 10, None)
    assert(Paging.encodeCursor(empty, col("ts_us"), col("event_id")).isEmpty)
  }

  test("walking all pages reproduces the full ordered scan, no dup/loss") {
    val full = base.orderBy(col("ts_us").desc, col("event_id").desc)
      .select("event_id").collect().map(_.getLong(0)).toSeq
    var out = Vector.empty[Long]
    var cursor: Option[String] = None
    var done = false
    var guard = 0
    while (!done && guard < 1000) {
      guard += 1
      val page = Paging.page(base, col("ts_us"), col("event_id"), 37, cursor)
      val rows = page.orderBy(col("ts_us").desc, col("event_id").desc)
        .select("event_id").collect().map(_.getLong(0)).toSeq
      if (rows.isEmpty) done = true
      else {
        out ++= rows
        cursor = Paging.encodeCursor(page, col("ts_us"), col("event_id"))
        if (cursor.isEmpty) done = true
      }
    }
    assert(out == full)
  }

  test("page with tied timestamps uses the tiebreak deterministically") {
    val s = spark
    import s.implicits._
    val tied = Seq((100L, 1L), (100L, 2L), (100L, 3L), (99L, 4L))
      .toDF("ts_us", "event_id")
    val p1 = Paging.page(tied, col("ts_us"), col("event_id"), 2, None)
    assert(p1.orderBy(col("event_id")).select("event_id").collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val cur = Paging.encodeCursor(p1, col("ts_us"), col("event_id"))
    val p2 = Paging.page(tied, col("ts_us"), col("event_id"), 2, cur)
    assert(p2.orderBy(col("event_id")).select("event_id").collect().map(_.getLong(0)).toSeq == Seq(1L, 4L))
  }
}
