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
    val b = SparkSession
      .builder()
      .master(s"local[$threads]")
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
    b.getOrCreate()
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
