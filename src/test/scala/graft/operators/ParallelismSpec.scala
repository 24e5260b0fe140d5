package graft.operators

import graft.SparkSpec

/** [[Parallelism.widen]]'s contract: a narrower-than-cores input gains
  * core-count partitions (the compute-follows-parallelism fix for
  * one-split harness tables), an already-wide input passes through
  * UNTOUCHED — the gate that makes the helper a no-op at data scale,
  * where adding an exchange would be pure cost. */
class ParallelismSpec extends SparkSpec {

  test("widen repartitions a narrow frame to the session's core count") {
    val s = spark
    import s.implicits._
    val narrow = (1 to 100).toDF("x").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val widened = Parallelism.widen(narrow)
    assert(widened.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    // row set untouched
    assert(widened.as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("widen is identity on an input already at or above core count") {
    val s = spark
    import s.implicits._
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(target + 3)
    // same object back — no exchange inserted at data scale
    assert(Parallelism.widen(wide) eq wide)
  }
}
