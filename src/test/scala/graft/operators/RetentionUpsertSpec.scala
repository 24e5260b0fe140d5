package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetentionUpsertSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // (key, ts_us, id) with ties and out-of-order event times
    Seq(
      ("a", 10L, 1L), ("a", 20L, 2L), ("a", 20L, 3L), ("a", 5L, 4L),
      ("b", 1L, 5L), ("b", 2L, 6L),
    ).toDF("key", "ts_us", "id")
  }

  test("keepNewest keeps exactly the newest n per key by (ts, tiebreak)") {
    val kept = Retention.keepNewest(fixture, Seq(col("key")), col("ts_us"), col("id"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 5L, 6L))
  }

  test("dropNewest drops exactly the newest n per key") {
    val left = Retention.dropNewest(fixture, Seq(col("key")), col("ts_us"), col("id"), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(left == Set(1L, 4L))
  }

  test("retention count never exceeds the cap") {
    for (n <- 1 to 4) {
      val counts = Retention.keepNewest(fixture, Seq(col("key")), col("ts_us"), col("id"), n)
        .groupBy("key").count().collect().map(_.getLong(1))
      assert(counts.forall(_ <= n))
    }
  }

  test("upsert is idempotent: re-applying any batch changes nothing") {
    val s = spark
    import s.implicits._
    val existing = Seq(("u1", "k", 1), ("u2", "k", 2)).toDF("uri", "key", "v")
    val batch = Seq(("u2", "k", 99), ("u3", "k", 3)).toDF("uri", "key", "v")
    val once = Upsert.upsert(existing, batch, Seq("uri", "key")).cache()
    assert(once.count() == 3)
    // conflicting row keeps the stored version (on-conflict-do-nothing)
    assert(once.filter(col("uri") === "u2").select("v").head().getInt(0) == 2)
    val twice = Upsert.upsert(once, batch, Seq("uri", "key"))
    assert(twice.count() == 3)
    assert(twice.exceptAll(once).isEmpty)
  }

  test("merge updates matched keys, keeps unmatched, inserts new, idempotently") {
    val s = spark
    import s.implicits._
    val existing = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
    val incoming = Seq((2L, "new2"), (2L, "new2dup"), (4L, "new4")).toDF("k", "v")
    val merged = Upsert.merge(existing, incoming, Seq("k"))
    val got = merged.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // in-batch dup on k=2 collapses to the min-struct row ("new2" < "new2dup")
    assert(got == Map(1L -> "old1", 2L -> "new2", 3L -> "old3", 4L -> "new4"))
    // re-merging the same batch changes nothing
    val again = Upsert.merge(merged, incoming, Seq("k"))
    assert(again.exceptAll(merged).isEmpty && merged.exceptAll(again).isEmpty)
  }

  test("batchIds assigns ceil(n/size) batches over distinct keys") {
    val s = spark
    import s.implicits._
    val df = (1 to 107).map(i => (i % 53).toLong).toDF("k") // 53 distinct
    val batches = Upsert.batchIds(df, "k", 25)
    assert(batches.count() == 53)
    val sizes = batches.groupBy("batch_id").count()
      .orderBy("batch_id").collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq(25L, 25L, 3L))

    // sequential-flush semantics: batch_id is floor(rank/size) in key order
    val got = batches.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = (0L until 53L).sorted.zipWithIndex
      .map { case (k, i) => k -> (i / 25).toLong }.toMap
    assert(got == expected)

    // and the plan funnels nothing through a single-partition window: the
    // global rank comes from range partitions + local ids + a one-row
    // broadcast rebase, so there must be NO WindowExec at all
    val plan = batches.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"batchIds plan regressed to a window:\n$plan")
  }
}
