package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.01")
    df.collect()
    println(df.queryExecution.executedPlan.toString.take(6000))
  }
}
