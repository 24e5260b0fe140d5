package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional third arg: comma-separated name-substring filter (focused
    // local re-checks; the driver always runs the full catalog)
    val only = args.lift(2).map(_.split(',').toSeq)
    def selected(name: String): Boolean =
      only.forall(_.exists(name.contains))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.withMaster(
      SparkSession.builder().withExtensions(new GraftExtensions),
      s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    new java.io.File(outDir).mkdirs()
    // per-query verdict (name → "ok" | error message), written to
    // status.json so a failed query surfaces to the driver as an explicit
    // `err` row instead of silently vanishing from CORRECTNESS. The file is
    // REWRITTEN after every query: if the JVM dies mid-run (OOM, kill), the
    // completed prefix survives instead of the whole record vanishing — the
    // failure mode that hid round 9's 22 events errors.
    val status = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def q(s: String): String = Json.quote(s)
    // atomic replace (tmp + move): a kill mid-write must leave the PREVIOUS
    // complete file, never a truncated unparseable one — the whole point of
    // flushing per query is surviving exactly that kind of death
    def flushStatus(): Unit = {
      val tmp = Paths.get(s"$outDir/status.json.tmp")
      Files.writeString(tmp,
        status.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
      Files.move(tmp, Paths.get(s"$outDir/status.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // oracle SQL depends only on the catalog, not on query execution — write
    // it BEFORE the loop so a mid-run death leaves the surviving status
    // prefix usable (status without oracle SQL can't be DuckDB-compared)
    val json = SparkEntry.oracleSql.filter(e => selected(e._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    flushStatus() // an empty-selection run still yields a parseable {}
    SparkEntry.queries.filter(e => selected(e._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        status(name) = "ok"
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
        status(name) = s"error: $msg"
        System.err.println(s"[verify] $name failed: $msg")
      }
      flushStatus()
      // free per-query materializations (localCheckpoint RDDs) so a 50+
      // query run doesn't accumulate storage memory; SharedCache pins
      // survive — later queries derive from them instead of recomputing
      SharedCache.unpersistScratch(spark)
    }
    spark.stop()
  }
}
