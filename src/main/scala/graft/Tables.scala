package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the shared parquet test tables (TESTDATA.md). Columns are
  * never pre-projected here — Catalyst prunes the parquet `ReadSchema` from
  * the query itself, which is the behavior we want at 100 TB too.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    Tables.cached(spark, s"$dir/$name.parquet")

  /** events.ts has shipped as two physical parquet types over the life of
    * this testdata — INT64 TIMESTAMP(NANOS) originally, TIMESTAMP_MICROS
    * after a regeneration — so this loader dispatches on the schema it
    * actually reads instead of hard-coding either. The contract downstream
    * is a single shape: `ts` is a session-TZ (UTC) TimestampType at
    * microsecond precision, matching DuckDB's `CAST(ts AS TIMESTAMP)` /
    * `epoch_us` oracle semantics, so event-time ordering and `unix_micros`
    * agree with the oracle regardless of the file's vintage. Schema-on-read
    * tolerance at the ingest boundary mirrors the reference
    * (/root/reference/src/util/subscription.ts:24-33).
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try t("events")
      catch {
        // TIMESTAMP(NANOS) files are rejected at schema inference unless the
        // legacy flag is on — enable it only when that SPECIFIC rejection
        // happened (the message names the NANOS parquet type), never for an
        // unrelated AnalysisException (missing path, corrupt footer), and
        // only as long as the retry succeeds: on a second failure the prior
        // conf value is restored, so a failed load can't leave a
        // session-wide change to how other nanos columns read.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null && e.getMessage.contains("NANOS") &&
              spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true" =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try t("events")
          catch { case retryFailure: Throwable =>
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
            throw retryFailure
          }
      }
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType =>
        // naive micros; session TZ is UTC everywhere, so this cast is
        // value-preserving and epoch_us-compatible with DuckDB
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType =>
        // nanosAsLong path (or a raw INT64 export): values are epoch-nanos
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other — extend Tables.events dispatch")
    }
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

object Tables {
  // (session, path) -> loaded frame. `spark.read.parquet` lists the
  // directory and reads a footer for schema EVERY call — a fixed
  // ~10-30 ms tax per table per query that a 95-query bench pass pays
  // hundreds of times over. The loaded DataFrame is immutable and its
  // FileIndex snapshot is exactly what we want for a static test corpus;
  // anything that rewrites a table mid-session (nothing under /root/
  // testdata — it is read-only) must call [[invalidate]]. Keyed on the
  // session so a restarted SparkSession never serves frames bound to a
  // stopped context; entries are few (sessions × tables).
  private val frames = scala.collection.mutable.Map[(SparkSession, String), DataFrame]()

  private def cached(spark: SparkSession, path: String): DataFrame = {
    val key = (spark, path)
    // Fast path + stopped-session eviction under the lock; the actual
    // spark.read.parquet (directory listing + footer read, the slow part)
    // runs OUTSIDE it so one slow load never serializes other sessions'
    // table loads. Two racers may both load the same path — the loads are
    // idempotent reads of an immutable directory, and the first insert wins.
    frames.synchronized {
      frames.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
      frames.get(key)
    } match {
      case Some(df) => df
      case None =>
        val df = spark.read.parquet(path)
        frames.synchronized { frames.getOrElseUpdate(key, df) }
    }
  }

  /** Drop cached frames (all of them, or one session's). */
  def invalidate(spark: SparkSession = null): Unit = frames.synchronized {
    if (spark == null) frames.clear()
    else frames.filterInPlace { case ((s, _), _) => s != spark }
  }
}
