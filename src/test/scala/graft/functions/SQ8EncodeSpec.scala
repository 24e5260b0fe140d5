package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{SQ8Encode, SQ8EncodeRaw}

class SQ8EncodeSpec extends SparkSpec {

  test("sq8 encode matches the SQL-lambda affine map, including degenerate dims") {
    val s = spark
    import s.implicits._
    // dim 3 is degenerate (mn = mx) → must encode as 0, not divide by zero
    val rows = Seq(
      (1L, Seq(-500000L, 0L, 250000L, 7L)),
      (2L, Seq(500000L, -250000L, 0L, 7L)),
      (3L, Seq(0L, 250000L, -250000L, 7L)))
    val df = rows.toDF("id", "fe")
      .crossJoin(broadcast(rows.toDF("i2", "f2").agg(
        array((0 until 4).map(i => min(element_at(col("f2"), i + 1))): _*).as("__mn"),
        array((0 until 4).map(i => max(element_at(col("f2"), i + 1))): _*).as("__mx"))))
    val viaLambda = df.select(col("id"), expr(
      """transform(sequence(1, 4), i ->
        |  CASE WHEN element_at(__mx, i) = element_at(__mn, i) THEN 0L
        |       ELSE ((element_at(fe, i) - element_at(__mn, i)) * 255L)
        |            div (element_at(__mx, i) - element_at(__mn, i)) END)""".stripMargin).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaExpr = df.select(col("id"),
        SQ8Encode(col("fe"), col("__mn"), col("__mx")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaExpr == viaLambda)
    assert(viaExpr(1L)(3) == 0L) // degenerate dim
    assert(viaExpr.values.flatten.forall(v => v >= 0L && v <= 255L))
  }

  test("fused raw encode ≡ fixedPoint-then-encode, and float bounds ≡ fixed-point bounds") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map(i => (i.toLong, Seq.fill(16)(rnd.nextFloat() - 0.5f)))
    val df = rows.toDF("id", "vec")
    val fe = graft.operators.Similarity.fixedPoint(col("vec"))
    // bounds via raw float min/max + driver floor (the sq8TopK shape)
    val b = df.agg(graft.functions.MinMaxVecAgg.bounds(col("vec")).as("b"))
      .select(col("b._1"), col("b._2")).head()
    def toFp(xs: Seq[Float]): Seq[Long] = xs.map(x => math.floor(x.toDouble * 1000000d).toLong)
    val (mnF, mxF) = (toFp(b.getSeq[Float](0)), toFp(b.getSeq[Float](1)))
    // bounds via per-dimension min/max of the fixed-point vectors
    val bFp = df.select(fe.as("fe")).agg(
      array((0 until 16).map(i => min(element_at(col("fe"), i + 1))): _*),
      array((0 until 16).map(i => max(element_at(col("fe"), i + 1))): _*)).head()
    assert(mnF == bFp.getSeq[Long](0) && mxF == bFp.getSeq[Long](1))

    val viaRaw = df.select(col("id"),
        SQ8EncodeRaw(col("vec"), typedlit(mnF), typedlit(mxF)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaFe = df.select(col("id"),
        SQ8Encode(fe, typedlit(mnF), typedlit(mxF)).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaRaw == viaFe)
    assert(viaRaw.values.flatten.forall(v => v >= 0L && v <= 255L))
  }

  test("out-of-bounds input saturates at the code-range edges") {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(_: Array[Long])
    val mn = arr(Array(0L, 0L))
    val mx = arr(Array(1000L, 1000L))
    // below the corpus min → 0; above the corpus max → 255 (never negative
    // or >255 — a query vector outside the corpus bounds must stay a valid
    // SQ8 code)
    val out = org.apache.spark.sql.graft.SQ8EncodeEval.eval(
      arr(Array(-500L, 2000L)), mn, mx)
    assert(out.toLongArray().toSeq == Seq(0L, 255L))
    val outRaw = org.apache.spark.sql.graft.SQ8EncodeEval.evalRaw(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array(-0.0005f, 0.002f)), mn, mx)
    assert(outRaw.toLongArray().toSeq == Seq(0L, 255L))
  }

  test("bounds shorter than the vector quantize the covered prefix, never throw") {
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(_: Array[Long])
    // empty bounds (the empty-corpus MinMaxVecAgg shape) → all-zero codes
    val out0 = org.apache.spark.sql.graft.SQ8EncodeEval.eval(
      arr(Array(5L, 7L)), arr(Array.empty[Long]), arr(Array.empty[Long]))
    assert(out0.toLongArray().toSeq == Seq(0L, 0L))
    // one-dim bounds against a two-dim vector → dim 2 degenerates to 0
    val out1 = org.apache.spark.sql.graft.SQ8EncodeEval.eval(
      arr(Array(500L, 7L)), arr(Array(0L)), arr(Array(1000L)))
    assert(out1.toLongArray().toSeq == Seq(127L, 0L))
  }

  test("sq8TopK over an empty or all-null corpus returns empty, not a crash") {
    val s = spark
    import s.implicits._
    val queries = Seq((1L, Seq(0.1f, 0.2f))).toDF("id", "vec")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    val r = graft.operators.Similarity.sq8TopK(queries, empty, "id", "vec", 5, 2)
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("q_id", "cand_id", "qsim", "rank"))
    val allNull = Seq((9L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec")
    assert(graft.operators.Similarity.sq8TopK(queries, allNull, "id", "vec", 5, 2).count() == 0)
  }

  test("codegen and eval helper agree") {
    val fe = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0L, 100L, 999L))
    val mn = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(0L, 0L, 999L))
    val mx = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array(1000L, 255L, 999L))
    val out = org.apache.spark.sql.graft.SQ8EncodeEval.eval(fe, mn, mx)
    assert(out.toLongArray().toSeq == Seq(0L, 100L, 0L))
  }
}
