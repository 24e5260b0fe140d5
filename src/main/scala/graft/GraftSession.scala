package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes everywhere:
  * UTC session time zone (oracle parity), AQE on (runtime coalesce + skew
  * handling — the local[32] stand-in for a 1000-executor cluster), and a
  * shuffle-partition count sized for the local harness rather than the
  * 200-partition default.
  */
object GraftSession {
  def local(threads: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    // every main honors SPARK_GRAFT_MASTER (e.g. local-cluster[4,8,4096]
    // for multi-executor sittings) — the smokes used to pin local[n] and
    // needed their own plumbing for the multi-JVM proofs
    val b0 = SparkSession
      .builder()
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.driver.host", "127.0.0.1")
    withMaster(b0, s"local[$threads]").getOrCreate()
  }

  /** Resolve the harness master and apply the executor-side config a
    * multi-executor master needs. `SPARK_GRAFT_MASTER` overrides the
    * caller's default (the driver contract stays `local[n]`); setting it
    * to e.g. `local-cluster[4,8,4096]` runs the same mains with four
    * separate executor JVMs — the closest single-box stand-in for a real
    * cluster, exercising task/closure serialization, remote block fetch,
    * and executor-side class loading that `local[n]` never touches.
    *
    * For local-cluster masters the worker launches executor JVMs from a
    * Spark home, and those JVMs need (a) the app classes — shipped via
    * `spark.executor.extraClassPath` from the driver's own classpath,
    * since standalone workers don't stage sbt-built classes — and (b) the
    * same JDK-17 `--add-opens` flags build.sbt gives the driver JVM.
    */
  def withMaster(b: SparkSession.Builder, default: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", default)
    if (!master.startsWith("local-cluster")) b.master(master)
    else {
      // LocalSparkCluster's in-process Worker resolves the executor launch
      // scripts from spark.test.home (falling back to SPARK_HOME env)
      if (!sys.props.contains("spark.test.home") && !sys.env.contains("SPARK_HOME"))
        sys.props("spark.test.home") = "/opt/spark"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar",
      ).map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")
      b.master(master)
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", addOpens)
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXECUTOR_MEM", "3g"))
        .config("spark.driver.host", "127.0.0.1")
    }
  }

  /** Apply the engine's expected runtime confs to an externally-created
    * session (Verify/Bench own their builder per the driver contract). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark
  }
}
