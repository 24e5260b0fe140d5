package graft.functions

import graft.{SparkSpec, Tables}
import graft.operators.Retention
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  test("bounded top-k aggregator equals the window retention formulation") {
    val t = Tables(spark, sf0001)
    val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
    val viaWindow = Retention.keepNewest(
        e, Seq(col("user_id")), col("ts_us"), col("event_id"), 5)
      .select(col("user_id"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val viaAgg = e.groupBy(col("user_id"))
      .agg(TopKAgg.topK(col("ts_us"), col("event_id"),
        col("event_id").cast("string"), 5).as("top"))
      .select(col("user_id"), explode(col("top")).as("t"))
      .select(col("user_id"), col("t._2").as("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
  }

  test("aggregator carries at most k rows per group and orders newest-first") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (1L, i.toLong, i.toLong, s"p$i"))
      .toDF("key", "ts", "id", "payload")
    val rows = df.groupBy(col("key"))
      .agg(TopKAgg.topK(col("ts"), col("id"), col("payload"), 3).as("top"))
      .select(explode(col("top")).as("t")).select(col("t._1"), col("t._3"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq == Seq((100L, "p100"), (99L, "p99"), (98L, "p98")))
  }
}
