package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimHashBits

class SimHashBitsSpec extends SparkSpec {

  test("one-pass wide simhash is order/duplication invariant and width-bounded") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "x y z w q")).toDF("id", "text")
    val sh = df.select(col("id"), SimHashBits(Dedup.tokenSet(col("text")), 48).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L)) // same word set
    assert(sh(1L) != sh(3L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 48)))
  }

  test("codegen and interpreted paths agree") {
    val s = spark
    import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"w$i x$i common words here")).toDF("id", "text")
    val viaExpr = df.select(col("id"), SimHashBits(Dedup.tokenSet(col("text")), 62).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // recompute directly via the eval helper
    viaExpr.foreach { case (id, h) =>
      val words = s"w$id x$id common words here".toLowerCase.split(" ").distinct
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        words.map(org.apache.spark.unsafe.types.UTF8String.fromString))
      assert(org.apache.spark.sql.graft.SimHashBitsEval.eval(arr, 62) == h)
    }
  }
}
