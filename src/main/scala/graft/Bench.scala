package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every registered query at the given scale
  * factor and prints ONE JSON line. A warmup pass (table scans + one tiny
  * query) runs first so JVM/codegen/parquet-footer startup cost isn't
  * charged to whichever query happens to run first.
  *
  * Timing runs as N whole-suite passes (SPARK_GRAFT_BENCH_PASSES, default
  * 3) rather than back-to-back repeats of each query: the benchmark box is
  * noisy (±50% run-to-run under external load), so per-query spread across
  * passes is reported alongside the best — a "regression" whose spread
  * straddles it is noise, not a plan change. "queries" stays the best-of-N
  * (steady-state: pass 1 pays per-query codegen compilation; production
  * standing queries run compiled); "queries_median"/"queries_max" carry
  * the distribution. SharedCache is cleared at each pass start, so shared
  * intermediates (the ns26/ns41 component fixpoint) are honestly computed
  * exactly once per pass by whichever consumer runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    // dev knobs for floor experiments (task-count overhead vs parallelism,
    // AQE's per-stage re-optimization cost at the bench scale); the driver
    // contract defaults stay `cpus` / AQE on
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val aqe = sys.env.getOrElse("SPARK_GRAFT_BENCH_AQE", "true")
    val spark = GraftSession.withMaster(
      SparkSession.builder().withExtensions(new GraftExtensions),
      s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: touch every table + exercise codegen/shuffle machinery once.
    // The ENTIRE block is guarded — a broken table or warmup query must
    // cost its own queries their timings, never the whole bench run
    // (BENCH_r09 was rc=1/no-data because this warmup threw unguarded).
    try {
      val t = Tables(spark, sfDir)
      Seq(t.region, t.nation, t.customer, t.supplier, t.part, t.orders,
        t.lineitem, t.events, t.documents, t.embeddings).foreach { df =>
        try df.count() catch { case e: Throwable =>
          System.err.println(s"[bench] warmup table failed: ${e.getMessage}") }
      }
      SparkEntry.queries("dq01_filter_scan")(spark, sfDir).count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }

    // A failed query returns a NEGATIVE sentinel (and records its message)
    // so time-to-exception can never masquerade as a valid fast timing.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // dev knob: SPARK_GRAFT_BENCH_JOBS=true prints each query's Spark
    // job/stage/task inventory to stderr — the scheduling-floor audit
    // (how many of a 0.5 s entry's milliseconds are distinct job
    // round-trips vs work). Never affects the JSON contract or archive.
    val profileJobs = sys.env.get("SPARK_GRAFT_BENCH_JOBS").contains("true")
    val tracker = spark.sparkContext.statusTracker
    def timeOnce(e: QueryEntry): Double = {
      // track by MAX id, not count: the status store evicts old jobs past
      // spark.ui.retainedJobs, so a count-based drop() silently discards
      // this query's own jobs once eviction starts mid-suite
      val maxJobBefore =
        if (profileJobs) tracker.getJobIdsForGroup(null).maxOption.getOrElse(-1) else -1
      val t0 = System.nanoTime()
      val ok =
        try { e.run(spark, sfDir).count(); true }
        catch { case ex: Throwable =>
          errors.getOrElseUpdate(e.name, Option(ex.getMessage).getOrElse(ex.getClass.getName).take(300))
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      if (profileJobs) {
        val ids = tracker.getJobIdsForGroup(null).filter(_ > maxJobBefore).sorted
        val infos = ids.flatMap(id => tracker.getJobInfo(id))
        val stages = infos.map(_.stageIds.length).sum
        val tasks = infos.flatMap(_.stageIds).flatMap(sid =>
          tracker.getStageInfo(sid)).map(_.numTasks).sum
        System.err.println(f"[bench-jobs] ${e.name}%-28s ${dt}%8.3f s  jobs=${ids.length}%-3d stages=$stages%-3d tasks=$tasks")
      }
      // release intermediate materializations (localCheckpoint RDDs) so one
      // query's scratch state doesn't GC-pressure the next; SharedCache
      // pins survive until the pass ends
      SharedCache.unpersistScratch(spark)
      if (ok) dt else -1.0
    }

    // Dev-loop filter: SPARK_GRAFT_BENCH_ONLY=ns64,...  restricts the run
    // to the named queries (comma-separated). Unset = the full catalog
    // (the driver's contract).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val entries = only.fold(SparkEntry.all)(f => SparkEntry.all.filter(e => f(e.name)))
    val names = entries.map(_.name)
    // machine load as a JSON [1min,5min,15min] triple — sampled around
    // every pass (not just once at the end) so the artifact itself shows
    // whether a slow pass ran under ambient load, without needing SCALE.md
    // prose to reconcile the numbers
    def loadNow(): String = try {
      val parts = java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ")
      s"[${parts(0)},${parts(1)},${parts(2)}]"
    } catch { case _: Throwable => "null" }
    val passLoads = scala.collection.mutable.ArrayBuffer.empty[String]
    val samples: Seq[Map[String, Double]] = (1 to passes).map { _ =>
      SharedCache.clear(spark)
      val before = loadNow()
      val r = entries.map(e => e.name -> timeOnce(e)).toMap
      passLoads += s"""{"start":$before,"end":${loadNow()}}"""
      r
    }
    // Failed passes carry the -1 sentinel; aggregate over VALID samples
    // only, and a query with zero valid samples stays -1 (explicit failure)
    // in every emitted map rather than polluting min/median/max.
    def valid(n: String): Seq[Double] = samples.map(_(n)).filter(_ >= 0)
    def fmt(f: Seq[Double] => Double): String =
      names.map { n =>
        val v = valid(n)
        "\"" + n + "\":" + (if (v.isEmpty) -1.0 else f(v))
      }.mkString("{", ",", "}")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val best = names.map(n => n -> valid(n).minOption.getOrElse(-1.0)).toMap
    val total = names.map(best).filter(_ >= 0).sum
    // "queries" (best-of-N) is emitted LAST: the driver archives only the
    // tail of this line, and a tail that lands on queries_max reads as a
    // fleet-wide regression when compared against an earlier best-of-N map.
    val errJson = errors.map { case (k, v) => Json.quote(k) + ":" + Json.quote(v) }
      .mkString("{", ",", "}")
    // hard failure = no valid timing in ANY pass (the query contributes
    // nothing to the totals); a transient failure (failed some passes,
    // timed in others) keeps its message in "errors" but the totals stay
    // comparable. "complete":false marks a total that is missing at least
    // one query — cross-round comparisons of "value" must check it, or a
    // newly-broken query reads as a fleet-wide speedup.
    val hardFailed = names.filter(n => valid(n).isEmpty)
    val complete = hardFailed.isEmpty
    val bigLine = s"""{"metric":"total","value":$total,"unit":"sec","passes":$passes,""" +
      s""""complete":$complete,"queries_median":${fmt(median)},"queries_max":${fmt(_.max)},""" +
      s""""errors":$errJson,"sf":"$sfDir","queries":${fmt(_.min)}}"""
    println(bigLine)
    // the full per-pass record also lands in a FILE: the driver's
    // fixed-size tail capture truncated 35 of 90 per-query times in r8,
    // so the archived artifact must not be the only copy. Guarded — a
    // read-only CWD must not cost the summary line below. Only FULL runs
    // at the driver's bench scale update the record: a filtered
    // (BENCH_ONLY) or small-sf smoke run overwriting the sf0.1 archive
    // silently destroys the round's comparison baseline (it did, r12).
    // (path-normalized: a trailing slash or `..` spelling of the same sf0.1
    // dir must not silently skip archiving; a skipped write says why)
    val benchScale = java.nio.file.Paths.get(sfDir).normalize match {
      case p if p.getFileName != null => p.getFileName.toString
      case _ => sfDir
    }
    // ...and only under the CONTRACT config: a dev-knob run (SHUFFLE/AQE
    // overrides) must never clobber the archive with wrong-config numbers
    // (an AQE-off experiment did exactly that once)
    val contractConfig = shufflePartitions == cpus && aqe == "true"
    if (only.isEmpty && benchScale == "sf0.1" && contractConfig)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_perquery.json"), bigLine + "\n")
      catch { case e: java.io.IOException =>
        System.err.println(s"bench_perquery.json not written: $e") }
    else System.err.println(
      s"bench_perquery.json not updated: only=${only.mkString(",")} scale=$benchScale " +
        s"contractConfig=$contractConfig (full sf0.1 contract-config runs only)")
    // compact summary AFTER the big line: the driver archives only the
    // tail of the output, and a truncated big line loses the headline
    // totals at its head — this line always survives whole. It carries
    // the slowest-10 best-of-N times (the plan-audit shortlist) and the
    // machine load (/proc/loadavg 1/5/15-min) so cross-round comparisons
    // can tell environment shifts from real regressions.
    // slowest-10 is BEST-of-passes (same stat as "queries"/"total"), named
    // so in the key — r15's artifact was ambiguous about whether it was a
    // best or a median and disagreed with queries_median on the same query
    val slowest = names.sortBy(n => -best(n)).take(10)
      .map(n => "\"" + n + "\":" + best(n)).mkString("{", ",", "}")
    val load = loadNow()
    println(s"""{"metric":"summary","total_sec":$total,"n_queries":${names.size},""" +
      s""""complete":$complete,"n_failed":${hardFailed.size},""" +
      s""""n_transient":${errors.size - hardFailed.size},"errors":$errJson,""" +
      // same inclusion rule as "total": hard-failed queries (zero valid
      // samples) are EXCLUDED from the sum, so the two totals agree about
      // what a failed query contributes (nothing) and a newly-broken query
      // moves n_failed/complete, never the median total
      s""""median_total_sec":${names.map(n => valid(n)).filter(_.nonEmpty).map(median).sum},""" +
      s""""passes":$passes,"sf":"$sfDir","load":$load,""" +
      s""""load_per_pass":${passLoads.mkString("[", ",", "]")},""" +
      s""""slowest10_best_of_passes":$slowest}""")
    spark.stop()
  }
}
