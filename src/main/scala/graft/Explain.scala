package graft

/** Plan-inspection tool: prints the formatted physical plan of a named
  * query and times `count()` over N repeats (default 3). Usage:
  *   runMain graft.Explain <queryName> [sfDir] [repeats]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    // count jobs + per-job wall time per run, so "which job is the floor"
    // is measurable rather than guessed
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobTimes.put(js.jobId, (js.time, 0L))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobTimes.computeIfPresent(je.jobId, (_, v) => (v._1, je.time))
    })
    (1 to repeats).foreach { i =>
      jobTimes.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let listener events drain
      import scala.jdk.CollectionConverters._
      val jobs = jobTimes.asScala.toSeq.sortBy(_._1)
        .map { case (id, (s, e)) =>
          // end==0 means the job outlived the drain sleep — mark it
          // running instead of printing a bogus negative duration
          if (e == 0L) s"j$id=running" else f"j$id=${(e - s) / 1e3}%.2fs"
        }.mkString(" ")
      println(f"[explain] run $i: $n rows in $dt%.2f s  [${jobTimes.size} jobs: $jobs]")
    }
    spark.stop()
  }
}
