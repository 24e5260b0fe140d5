package graft
import org.apache.spark.sql.SparkSession
/** Time one catalog query (3 passes, prints each) — builder diagnostic. */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      SharedCache.clear(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(args(0))(spark, dir).collect()
      println(f"[qtime] pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
  }
}
