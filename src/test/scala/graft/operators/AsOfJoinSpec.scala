package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("as-of join: latest at-or-before, inclusive ties, null when no prior") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 5L, 12L), (1L, 20L, 13L))
      .toDF("k", "t", "i")
    val right = Seq((1L, 100L, 20L), (1L, 40L, 21L), (1L, 99L, 22L), (2L, 6L, 23L))
      .toDF("k", "t", "i")
    val got = AsOfJoin.lastAtOrBefore(left, right, "k", "t", "i")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(10L) == 20L) // tie at t=100 is inclusive
    assert(got(11L) == 21L) // 40 <= 50, 99/100 too late
    assert(got(13L) == -1L) // nothing at or before t=20
    assert(got(12L) == -1L) // key 2: right row is later (t=6 > 5)
  }
}
