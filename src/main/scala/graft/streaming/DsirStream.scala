package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** ONLINE importance screening — ns71/ns72's DSIR weights applied at
  * ingest time: bucket stats are FIT OFFLINE on a resting corpus
  * ([[TextAnalysis.dsirStats]]), PUBLISHED through a [[VersionedStore]]
  * pointer flip, and every arriving document is scored and importance-sampled
  * STATELESSLY — the score is a literal-stats in-row expression
  * ([[TextAnalysis.dsirScore]]), so the streaming plan carries no state
  * store, no watermark, and no shuffle; exactly-once falls out of the
  * file sink's transaction log rather than any operator state. The same
  * train-offline/apply-online split as [[AnnIngest]] (offline centroids,
  * online assignment): a refit publishes a new version and in-flight
  * readers keep the superseded one through the store's grace window.
  *
  * At 100 TB: the published model is 2×buckets longs (tiny, version-swapped
  * atomically); each micro-batch pays one scan of itself and nothing else —
  * screening throughput is the stream's own read bandwidth.
  */
object DsirStream {

  /** Published stats: per-bucket (raw, target) token masses. */
  final case class Model(raw: Seq[Long], tgt: Seq[Long]) {
    require(raw.size == tgt.size && raw.nonEmpty, "malformed dsir model")
    def buckets: Int = raw.size
  }

  /** Fit on a resting corpus and land as the store's next version (one
    * parquet row of two long arrays; same swap protocol as [[IvfStore]] —
    * crash mid-write leaves only a .tmp the next swap clears). */
  def publish(spark: SparkSession, storeDir: String, corpus: DataFrame,
      textCol: String, isTarget: org.apache.spark.sql.Column,
      buckets: Int): Model = {
    val (raw, tgt) = TextAnalysis.dsirStats(corpus, textCol, isTarget, buckets)
    val m = Model(raw, tgt)
    VersionedStore.withStoreLock(storeDir) {
      VersionedStore.swap(storeDir, tmp => {
        import spark.implicits._
        Seq((m.raw, m.tgt)).toDF("raw", "tgt")
          .coalesce(1).write.parquet(
            new org.apache.hadoop.fs.Path(tmp, "stats").toString)
      })
    }
    m
  }

  /** Read the CURRENT version's stats (the one-row model). */
  def model(spark: SparkSession, storeDir: String): Model = {
    val v = VersionedStore.versionDir(storeDir)
    require(v != storeDir || StoreFs.exists(StoreFs.path(storeDir, "stats")),
      s"no published DSIR stats under $storeDir — run publish() first")
    val r = spark.read.parquet(s"$v/stats").head()
    Model(r.getSeq[Long](0), r.getSeq[Long](1))
  }

  /** Score one (streaming or batch) frame against a model — stateless,
    * scan-only; output adds (num, den, weight) to the id column. */
  def score(batch: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame =
    TextAnalysis.dsirScore(batch, idCol, textCol, m.raw, m.tgt)

  /** The importance screen: keep arrivals drawn by the ns72 rule
    * (probability = weight, deterministic per id) AND clearing
    * `minWeight` (set 0.0 for the pure DSIR draw; a positive floor turns
    * it into draw-plus-quality-gate). A null-text arrival scores null and
    * is DROPPED — unscorable rows do not pass a screen whose job is to
    * admit rows by score; route them aside upstream if they must be
    * kept. */
  def screen(batch: DataFrame, idCol: String, textCol: String, m: Model,
      minWeight: Double = 0.0): DataFrame =
    score(batch, idCol, textCol, m)
      .filter(TextAnalysis.dsirDraw(idCol) &&
        col("weight") >= lit(minWeight))

  /** Wire a streaming frame of (id, text) rows through the screen into a
    * parquet sink. The model is resolved ONCE at wiring time (literal
    * stats inside the plan — a published refit applies on restart, the
    * documented semantics; resolving per-batch would re-read the store
    * inside every trigger for a model that changes only on refit).
    * Survivors append exactly-once via the file sink's own commit log. */
  def run(stream: DataFrame, storeDir: String, idCol: String,
      textCol: String, outDir: String, checkpointDir: String,
      minWeight: Double = 0.0): org.apache.spark.sql.streaming.StreamingQuery = {
    val m = model(stream.sparkSession, storeDir)
    screen(stream, idCol, textCol, m, minWeight)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
