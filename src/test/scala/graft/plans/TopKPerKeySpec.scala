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

  test("retention via the custom operator matches Retention.keepNewest on real data") {
    val t = Tables(spark, sf0001)
    val e = t.events.withColumn("ts_us", unix_micros(col("ts")))
    val custom = TopKPerKey(e, Seq("user_id"), Seq("ts_us" -> true, "event_id" -> true), 5)
      .select("user_id", "event_id").orderBy("user_id", "event_id")
    val builtin = graft.operators.Retention.keepNewest(
        e, Seq(col("user_id")), col("ts_us"), col("event_id"), 5)
      .select("user_id", "event_id").orderBy("user_id", "event_id")
    assert(custom.collect().toSeq == builtin.collect().toSeq)
  }
}
