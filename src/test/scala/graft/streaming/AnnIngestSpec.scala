package graft.streaming

import graft.SparkSpec
import graft.operators.{KMeansIvf, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Vec(vec_id: Long, embedding: Seq[Float])

class AnnIngestSpec extends SparkSpec {

  test("streamed cell assignment ≡ the batch fit's assignment for the same model") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext

    // offline: bounds + code-trained centroids on the fixture corpus
    val t = graft.Tables(spark, sf0001)
    val emb = t.embeddings
    val b = emb.agg(graft.functions.MinMaxVecAgg.bounds(col("embedding")).as("b"))
      .select(col("b._1"), col("b._2")).head()
    def toFp(xs: Seq[Float]): Array[Long] =
      xs.map(x => math.floor(x.toDouble * 1000000d).toLong).toArray
    val (mn, mx) = (toFp(b.getSeq[Float](0)), toFp(b.getSeq[Float](1)))
    val codes = Similarity.sq8PackedCodes(emb, "vec_id", "embedding")
    val (assignments, centroids) =
      KMeansIvf.fitCodes(codes, "vec_id", "__q", k = 8, iters = 2)
    val batchCells = assignments.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

    // online: replay a slice of the corpus as a stream; each arriving
    // vector must land in the same cell the batch fit assigned it
    val slice = emb.filter(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().map { case (id, v) => Vec(id, v) }
    val stream = MemoryStream[Vec]
    val q = AnnIngest.assignCells(stream.toDF(), "embedding", mn, mx, centroids)
      .select("vec_id", "cell")
      .writeStream.format("memory").queryName("ann_ingest").outputMode("append").start()
    stream.addData(slice.take(20).toIndexedSeq)
    q.processAllAvailable()
    stream.addData(slice.drop(20).toIndexedSeq) // second micro-batch: same model
    q.processAllAvailable()
    val streamed = spark.table("ann_ingest").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    q.stop()

    assert(streamed.keySet == slice.map(_.vec_id).toSet)
    streamed.foreach { case (id, cell) =>
      assert(cell == batchCells(id), s"vec $id: stream=$cell batch=${batchCells(id)}")
    }
  }

  test("null vectors are dropped, out-of-bounds vectors saturate instead of failing") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val dim = 4
    val mn = Array.fill(dim)(0L)
    val mx = Array.fill(dim)(1000000L)
    val centroids = Array(Array.fill(dim)(0L), Array.fill(dim)(255L))
    val stream = MemoryStream[Vec]
    val q = AnnIngest.assignCells(stream.toDF(), "embedding", mn, mx, centroids)
      .select("vec_id", "cell")
      .writeStream.format("memory").queryName("ann_ingest_edge").outputMode("append").start()
    stream.addData(
      Vec(1, Seq(0.5f, 0.5f, 0.5f, 0.5f)),
      Vec(2, null),                              // dropped
      Vec(3, Seq(99f, 99f, 99f, 99f)),           // far above mx: clamps to 255 → cell 1
      Vec(4, Seq(-99f, -99f, -99f, -99f)))       // far below mn: clamps to 0 → cell 0
    q.processAllAvailable()
    val got = spark.table("ann_ingest_edge").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    q.stop()
    assert(got.keySet == Set(1L, 3L, 4L))
    assert(got(3L) == 1 && got(4L) == 0)
  }
}
