package graft.operators

import graft.SparkSpec

/** [[Parallelism.widen]]'s contract: a narrower-than-cores SCAN gains
  * core-count partitions (the compute-follows-parallelism fix for
  * one-split harness tables); an already-wide input passes through
  * UNTOUCHED (the gate that makes the helper a no-op at data scale,
  * where adding an exchange would be pure cost); and a non-scan-shaped
  * input — a caller's own repartition, a join, an aggregate — is NEVER
  * touched, both because the caller's width must win and because the
  * `.rdd` partition probe on a plan containing exchanges would execute
  * those stages eagerly under AQE. */
class ParallelismSpec extends SparkSpec {

  private def oneSplitScan() = {
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    val s = spark
    import s.implicits._
    (1 to 100).toDF("x").coalesce(1).write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("widen repartitions a narrow one-split scan to the session's core count") {
    val s = spark
    import s.implicits._
    // on a 1-core host a one-split scan IS already at defaultParallelism
    // (1 < 1 is false) and the contract under test is vacuous — cancel,
    // don't fail, so minimal CI hosts skip rather than misreport
    assume(spark.sparkContext.defaultParallelism > 1,
      "widen's narrow-scan contract needs a multi-core session")
    val narrow = oneSplitScan()
    assert(narrow.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
    val widened = Parallelism.widen(narrow)
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // row set untouched, and projections/filters stay scan-shaped
    assert(widened.as[Int].collect().sorted.toSeq == (1 to 100))
    val filtered = Parallelism.widen(narrow.filter($"x" > 10).select($"x"))
    assert(filtered.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("widen is identity on a caller-partitioned or exchange-bearing input") {
    val s = spark
    import s.implicits._
    val scan = oneSplitScan()
    // a caller's explicit repartition must win — even a NARROW one
    val callerChose = scan.repartition(2)
    assert(Parallelism.widen(callerChose) eq callerChose)
    // aggregate/join outputs already carry shuffle-partition width, and
    // probing their .rdd would execute the exchange stages under AQE
    val agg = scan.groupBy($"x").count()
    assert(Parallelism.widen(agg) eq agg)
  }
}
