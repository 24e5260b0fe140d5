package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join and spreads keys over salt buckets") {
    val t = Tables(spark, sf0001)
    val events = t.events
    val customer = t.customer
    val plain = events.join(customer, events("user_id") === customer("c_custkey"))
      .select("event_id", "c_name")
    val salted = Skew.saltedJoin(
      events.withColumnRenamed("user_id", "k"),
      customer.withColumnRenamed("c_custkey", "k"),
      key = "k", saltBy = col("event_id"), n = 8)
      .select("event_id", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("same-bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed2")
    // a crashed prior run can leave the managed location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("ev_bucketed", "ev_bucketed2").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) d.listFiles().foreach(_.delete())
      d.delete()
    }
    val t = Tables(spark, sf0001)
    Skew.writeBucketed(t.events.select("event_id", "user_id", "value"),
      "ev_bucketed", "user_id", buckets = 8, sortBy = Some("user_id"))
    Skew.writeBucketed(t.events.select("event_id", "user_id"),
      "ev_bucketed2", "user_id", buckets = 8, sortBy = Some("user_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: the point is the co-located SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Skew.bucketedTable(spark, "ev_bucketed")
      val b = Skew.bucketedTable(spark, "ev_bucketed2")
        .withColumnRenamed("event_id", "event_id2")
      val joined = a.join(b, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
