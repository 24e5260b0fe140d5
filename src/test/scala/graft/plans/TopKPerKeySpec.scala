package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

class TopKPerKeySpec extends SparkSpec {

  test("bounded-heap top-k equals the window formulation under a total order") {
    val s = spark
    import s.implicits._
    // colliding timestamps force tie-breaking through the second sort key
    val rows = for (k <- 0L until 7L; i <- 0L until 40L) yield (k, i % 11, i)
    val df = rows.toDF("key", "ts", "id")
    val custom = TopKPerKey(df, Seq("key"), Seq("ts" -> true, "id" -> true), 5)
      .orderBy("key", "id")
    val window = df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("ts").desc, col("id").desc)))
      .filter(col("rn") <= 5).drop("rn")
      .orderBy("key", "id")
    assert(custom.collect().toSeq == window.collect().toSeq)
  }

  test("physical plan is TopKPerKeyExec after one clustered exchange, no sort") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i % 5, i)).toDF("key", "id")
    val plan = TopKPerKey(df, Seq("key"), Seq("id" -> true), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan) // node name (Spark strips the Exec suffix)
    assert(plan.contains("Exchange hashpartitioning(key"), plan)
    assert(!plan.contains("Sort") && !plan.toLowerCase.contains("window"), plan)
  }

  test("k beyond group size returns whole groups; k = 1 returns exactly the per-key extreme") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("key", "v")
    assert(TopKPerKey(df, Seq("key"), Seq("v" -> true), 100).count() == 3)
    val tops = TopKPerKey(df, Seq("key"), Seq("v" -> true), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tops == Map(1L -> 20L, 2L -> 5L))
  }

  test("partial-pass flushes under high key cardinality still yield exact top-k") {
    val s = spark
    import s.implicits._
    // 5000 distinct keys funneled through ONE partition with the flush
    // threshold at its 1024-key floor: the partial pass must flush ~5
    // times mid-stream (the bounded-memory path that replaced the map
    // that OOMed at 2M keys per partition), and keys STRADDLE flushes
    // (each key's rows are spread across the input), so the final pass
    // must merge multiple partial groups per key
    val rows = for (i <- 0L until 25000L) yield (i % 5000, i)
    val df = rows.toDF("key", "v").repartition(1)
    spark.conf.set("spark.graft.topk.partialBufferRows", "1024")
    val got = try TopKPerKey(df, Seq("key"), Seq("v" -> true), 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.unset("spark.graft.topk.partialBufferRows")
    // top-2 v per key: i = key + 5000*j, so the two largest are j=4, j=3
    val want = (0L until 5000L).flatMap(k => Seq((k, k + 20000L), (k, k + 15000L))).toSet
    assert(got == want)
  }

  test("retention via the custom operator matches the window formulation on real data") {
    val t = Tables(spark, sf0001)
    val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
    val custom = TopKPerKey(e, Seq("user_id"), Seq("ts_us" -> true, "event_id" -> true), 5)
      .select("user_id", "event_id").orderBy("user_id", "event_id")
    // flag off → keepNewest takes the independent row_number path
    spark.conf.set(graft.operators.NativeTopK.Flag, "false")
    val builtin =
      try graft.operators.Retention.keepNewest(
          e, Seq(col("user_id")), col("ts_us"), col("event_id"), 5)
        .select("user_id", "event_id").orderBy("user_id", "event_id").collect().toSeq
      finally spark.conf.unset(graft.operators.NativeTopK.Flag)
    assert(custom.collect().toSeq == builtin)
  }

  test("keepNewest routes through the native heap by default; flag restores the window plan") {
    val t = Tables(spark, sf0001)
    val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
    def planOf(): String = graft.operators.Retention.keepNewest(
      e, Seq(col("user_id")), col("ts_us"), col("event_id"), 5)
      .queryExecution.executedPlan.toString
    val native = planOf()
    assert(native.contains("TopKPerKey "), native)
    assert(!native.toLowerCase.contains("window"), native)
    spark.conf.set(graft.operators.NativeTopK.Flag, "false")
    try {
      val fallback = planOf()
      assert(!fallback.contains("TopKPerKey "), fallback)
      assert(fallback.toLowerCase.contains("window"), fallback)
    } finally spark.conf.unset(graft.operators.NativeTopK.Flag)
  }

  test("planner emits a map-side partial heap below the exchange (shuffle sees survivors only)") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i % 5, i)).toDF("key", "id")
    val plan = TopKPerKey(df, Seq("key"), Seq("id" -> true), 3)
      .queryExecution.executedPlan.toString
    // two heap passes: partial above the scan, final above the exchange
    assert("TopKPerKey ".r.findAllIn(plan).size == 2, plan)
    val exchangeAt = plan.indexOf("Exchange hashpartitioning(key")
    assert(exchangeAt >= 0, plan)
    assert(plan.indexOf("TopKPerKey ") < exchangeAt, plan)
    assert(plan.indexOf("TopKPerKey ", exchangeAt) > exchangeAt, plan)
  }

  test("keyless global top-k: partial heaps + single-partition merge equals orderBy.limit") {
    val t = Tables(spark, sf0001)
    val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
      .select("event_id", "ts_us")
    val native = graft.operators.Paging.topK(e, col("ts_us"), col("event_id"), 40)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey "), plan)
    val got = native.orderBy(col("ts_us").desc, col("event_id").desc).collect().toSeq
    val want = e.orderBy(col("ts_us").desc, col("event_id").desc).limit(40).collect().toSeq
    assert(got == want)
  }
}
