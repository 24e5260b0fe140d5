package graft.streaming

import graft.SparkSpec
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class CurDoc(doc_id: Long, text: String)

/** The curation scans are STATELESS Column expressions / per-row fan-outs,
  * so they must compose with Structured Streaming unchanged — the 100 TB
  * deployment chunks and normalizes documents as they arrive, not in a
  * nightly batch. This spec runs them over MemoryStream micro-batches and
  * checks batch/stream parity row-for-row; the stateful tail (dedup,
  * packing) stays in DedupStream / the batch catalog. */
class CurationStreamSpec extends SparkSpec {

  test("chunkOverlap and normalizeText stream: micro-batch output == batch output") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      CurDoc(1L, (1 to 50).map(i => s"tok$i").mkString(" ")),
      CurDoc(2L, "Short Doc!"),
      CurDoc(3L, ""),
      CurDoc(4L, (1 to 25).map(i => s"w$i").mkString(" ")))

    val stream = MemoryStream[CurDoc]
    val q = TextAnalysis.chunkOverlap(stream.toDF(), "doc_id", "text", 8, 6)
      .withColumn("norm_h", org.apache.spark.sql.functions.md5(
        Dedup.normalizeText(org.apache.spark.sql.functions.col("chunk_h"))))
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("append").start()
    // two micro-batches to prove the fan-out is batch-boundary-agnostic
    stream.addData(docs.take(2): _*)
    q.processAllAvailable()
    stream.addData(docs.drop(2): _*)
    q.processAllAvailable()
    val streamed = spark.table("curation_stream")
      .orderBy("doc_id", "chunk_id").collect().toSeq
    q.stop()

    val batch = TextAnalysis.chunkOverlap(docs.toDF(), "doc_id", "text", 8, 6)
      .withColumn("norm_h", org.apache.spark.sql.functions.md5(
        Dedup.normalizeText(org.apache.spark.sql.functions.col("chunk_h"))))
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty && batch.size ==
      TextAnalysis.chunkOverlap(docs.toDF(), "doc_id", "text", 8, 6).count())
  }
}
