package graft.functions

import scala.util.Random

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{MaskPairCodes, MaskPairCodesEval}

class MaskPairCodesSpec extends SparkSpec {

  /** Reference semantics: one (a, −1) per set bit, one ascending (a, b)
    * per set-bit pair — what the former higher-order-function fan built. */
  private def reference(mask: Long): Seq[(Int, Int)] = {
    val bits = (0 until 64).filter(b => ((mask >> b) & 1L) == 1L)
    bits.map(a => (a, -1)) ++
      (for (i <- bits.indices; j <- i + 1 until bits.length)
        yield (bits(i), bits(j)))
  }

  private def decode(code: Int): (Int, Int) = (code >> 6, (code & 63) - 1)

  test("codes decode to exactly the singles plus ascending pairs of set bits") {
    val rnd = new Random(7)
    val masks = Seq(0L, 1L, 3L, 1L << 19, (1L << 20) - 1) ++
      Seq.fill(200)(rnd.nextLong() & ((1L << 20) - 1))
    masks.foreach { m =>
      val got = MaskPairCodesEval.eval(m).toIntArray().toSeq.map(decode)
      assert(got.sorted == reference(m).sorted, s"mask $m")
      // singles come first, pairs after; within each kind order is fixed,
      // but consumers only aggregate, so only the multiset is contractual
      assert(got.size == got.distinct.size, s"mask $m emitted a duplicate")
    }
  }

  test("codegen path agrees with eval and null masks emit nothing") {
    val s = spark
    import s.implicits._
    val df = Seq(Some(0b1011L), Some(0L), None).toDF("m")
    val rows = df.select(explode(MaskPairCodes(col("m"))).as("c"))
      .collect().map(_.getInt(0)).toSeq.map(decode)
    // only the 0b1011 row fans out: bits {0,1,3} → 3 singles + 3 pairs
    assert(rows.sorted == reference(0b1011L).sorted)
  }
}
