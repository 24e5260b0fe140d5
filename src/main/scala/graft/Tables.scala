package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet test tables (TESTDATA.md). Columns are
  * never pre-projected here — Catalyst prunes the parquet `ReadSchema` from
  * the query itself, which is the behavior we want at 100 TB too.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
    * rejects; read it as raw nanos and truncate to a microsecond
    * TimestampType — exactly DuckDB's CAST(ts_ns AS TIMESTAMP) semantics,
    * so event-time ordering agrees with the oracle.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
