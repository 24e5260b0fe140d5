package graft

import org.apache.spark.sql.functions._

/** Pins the SharedCache lifecycle contracts: the reliable-checkpoint
  * fallback for executor-churn sessions, and clear() dropping entries so
  * a fresh bench pass honestly recomputes. */
class SharedCacheSpec extends SparkSpec {

  test("reliableDir conf pins via reliable checkpoint files that survive unpersist-all") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.conf.set("spark.graft.sharedCache.reliableDir", dir)
    try {
      val pinned = SharedCache.getOrCompute("spec:reliable-pin", spark)(
        Seq(1L, 2L, 3L).toDF("v").withColumn("sq", col("v") * col("v")))
      assert(pinned.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 4L, 9L))
      // the pin is FILES, not executor blocks: checkpoint data must exist
      // under the conf'd dir...
      def files(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
        val st = java.nio.file.Files.walk(p)
        try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(java.nio.file.Files.isRegularFile(_)).toList
        } finally st.close()
      }
      assert(files(java.nio.file.Paths.get(dir)).nonEmpty,
        "reliable pin must write checkpoint files under the conf'd dir")
      // ...so blowing away EVERY persistent RDD (the hazard that kills a
      // localCheckpoint pin — the executor-loss stand-in a single JVM can
      // stage) leaves the pinned frame readable
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      assert(pinned.count() == 3,
        "reliable pin must survive losing all in-memory blocks")
    } finally {
      spark.conf.unset("spark.graft.sharedCache.reliableDir")
      SharedCache.clear(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("default localCheckpoint pin memoizes per key and clear() forgets it") {
    val s = spark
    import s.implicits._
    var builds = 0
    def build = { builds += 1; Seq(1L).toDF("v") }
    val a = SharedCache.getOrCompute("spec:memo", spark)(build)
    val b = SharedCache.getOrCompute("spec:memo", spark)(build)
    assert(builds == 1 && (a eq b), "second call must return the memoized frame")
    SharedCache.clear(spark)
    SharedCache.getOrCompute("spec:memo", spark)(build)
    assert(builds == 2, "clear() must force an honest recompute")
    SharedCache.clear(spark)
  }
}
