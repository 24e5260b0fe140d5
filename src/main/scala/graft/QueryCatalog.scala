package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (when SQL-expressible)
  * the ANSI SQL the DuckDB oracle runs over the same parquet tables.
  *
  * Both sides must emit identical column NAMES (the driver sorts columns by
  * name before hashing) and a fully-deterministic row order (every query
  * ends in an ORDER BY over a unique key on both sides).
  */
final case class QueryEntry(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in the Bench headline set */
    headline: Boolean = false,
)

trait QueryModule {
  def entries: Seq[QueryEntry]
}
