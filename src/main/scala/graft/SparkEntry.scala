package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers one QueryEntry (Spark impl + DuckDB
  * oracle SQL) through a QueryModule; this object is just the aggregation
  * point the driver calls into.
  */
object SparkEntry {

  val modules: Seq[QueryModule] = Seq(
    CoreQueries,
    ScalarQueries,
    JoinQueries,
    WindowQueries,
    PagingQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    PipelineQueries,
    AnalyticsQueries,
    TemporalQueries,
  )

  lazy val all: Seq[QueryEntry] = {
    val es = modules.flatMap(_.entries)
    val dups = es.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(",")}")
    es
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full engine slice: wire-shaped posts → filter cascade → dedup upsert →
    * serving page with ordinals. */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.firstPage(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(e => e.name -> e.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(e => e.oracle.map(sql => e.name -> sql)).toMap

  /** Subset benchmarked by Bench per round. */
  def headline: Seq[QueryEntry] = all.filter(_.headline)
}
