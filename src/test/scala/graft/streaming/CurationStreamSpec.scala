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

  test("stateful chunk dedup stream: first occurrence per chunk_h wins, " +
      "state evicts past the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    def at(minute: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")
    // size 8 / stride 4 ⇒ doc 1 (12 toks) = chunks t1..t8, t5..t12; doc 2
    // repeats doc 1 exactly (every chunk duplicated); doc 3 starts with
    // doc 1's full body then diverges (chunks 0,1 duplicated, chunk 2
    // fresh)
    val bodyA = (1 to 12).map(i => s"t$i").mkString(" ")
    val bodyC = bodyA + " " + (1 to 4).map(i => s"u$i").mkString(" ")
    val stream = MemoryStream[TsDoc]
    val q = DedupStream.chunksFirstSeen(stream.toDF(), "doc_id", "text",
        "ts", "5 minutes", size = 8, stride = 4)
      .writeStream.format("memory").queryName("chunk_dedup_stream")
      .outputMode("append").start()

    // one doc per micro-batch: arrival order is doc order, so the batch
    // (doc_id, chunk_id)-order semantic and the stream first-arrival
    // semantic pick the SAME survivors
    stream.addData(TsDoc(1L, bodyA, at(0)))
    q.processAllAvailable()
    stream.addData(TsDoc(2L, bodyA, at(1)))  // all chunks in-horizon dups
    q.processAllAvailable()
    stream.addData(TsDoc(3L, bodyC, at(2)))  // head chunk dup, tail fresh
    q.processAllAvailable()
    val survivors = spark.table("chunk_dedup_stream")
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toSet
    assert(survivors == Set((1L, 0L), (1L, 1L), (3L, 2L)),
      "doc 1 owns both its chunks; doc 2 fully deduped; doc 3 keeps only its tail chunk")

    // stream == batch (ns58's firstSeen step) on the same corpus
    val batchFirst = {
      import org.apache.spark.sql.expressions.Window
      val chunks = TextAnalysis.chunkOverlap(
        Seq((1L, bodyA), (2L, bodyA), (3L, bodyC)).toDF("doc_id", "text"),
        "doc_id", "text", 8, 4)
      chunks.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
          Window.partitionBy($"chunk_h").orderBy($"doc_id", $"chunk_id")))
        .filter($"__rn" === 1).select("doc_id", "chunk_id")
        .as[(Long, Long)].collect().toSet
    }
    assert(survivors == batchFirst)

    // TTL: watermark past at(2)+5min evicts every chunk_h key; the state
    // row count drops and a re-sent body re-emits (the documented
    // bounded-state trade-off)
    val stateBefore = q.lastProgress.stateOperators(0).numRowsTotal
    assert(stateBefore >= 3) // the three distinct chunk hashes are keyed
    stream.addData(TsDoc(4L, "unrelated filler words only", at(30)))
    q.processAllAvailable()
    stream.addData(TsDoc(5L, bodyA, at(31)))  // original's state is gone
    q.processAllAvailable()
    val reEmitted = spark.table("chunk_dedup_stream")
      .filter($"doc_id" === 5L).count()
    val stateAfter = q.lastProgress.stateOperators(0).numRowsTotal
    q.stop()
    assert(reEmitted == 2, "evicted chunk hashes re-emit for the late repeat")
    assert(stateAfter < stateBefore + 3,
      s"watermark eviction must bound the state store (before=$stateBefore after=$stateAfter)")
  }
}

case class TsDoc(doc_id: Long, text: String, ts: java.sql.Timestamp)
