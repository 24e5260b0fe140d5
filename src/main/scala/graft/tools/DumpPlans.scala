package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.{GraftSession, SharedCache, SparkEntry}

/** Optimization-round evidence dump: writes the `explain("formatted")` plan
  * of every catalog query to `<outDir>/<query>_<suffix>.txt` — the
  * before/after plan files the round deliverables require. Unlike Plans
  * (which builds the curated PLANS.md at sf0.001), this dumps the raw
  * formatted plan at the bench scale for every query, one file each.
  *
  * Usage: runMain graft.tools.DumpPlans <outDir> <suffix> [sfDir] [names...]
  *   e.g. runMain graft.tools.DumpPlans plans/r20 before /root/testdata/sf0.1
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args.drop(3).toSet) else None
    Files.createDirectories(outDir)
    val spark = GraftSession.local(
      threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val names = only.fold(SparkEntry.all.map(_.name))(f =>
      SparkEntry.all.map(_.name).filter(f))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      SharedCache.unpersistScratch(spark)
    }
    println(s"[dumpplans] wrote ${names.size} plans to $outDir (suffix=$suffix, sf=$sfDir)")
    spark.stop()
  }
}
