package graft.model

import graft.domain.Fixtures

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side unit spec for the per-feed landed-batch counters that
  * back the head cache's invalidation token — the contract is
  * per-feed bumps, generation-prefixed resets, and (since r19) that a
  * token is an ATOMIC (gen, count) snapshot: a reader racing the
  * bounded-map reset must never mint "newGen:oldCount", which — once
  * the fresh counter re-climbed to oldCount — would let the head cache
  * serve a stale head as current until the feed's next landed batch. */
class ConditionMetricsSpec extends AnyFunSuite {

  test("keyCycle bumps only keys a batch landed rows for; reset flips the generation") {
    val m = new ConditionMetrics
    val c1 = Fixtures.cond(key = "k1")
    val c2 = Fixtures.cond(key = "k2")
    assert(m.keyCycle("k1") == "0:0")
    m.record(Seq(c1, c2), Map("k1" -> 3L), execMs = 5L)
    assert(m.keyCycle("k1") == "0:1", "a landed batch bumps its feed")
    assert(m.keyCycle("k2") == "0:0", "a feed with no landed rows keeps its token")
    m.record(Seq(c1, c2), Map("k1" -> 0L, "k2" -> 2L), execMs = 5L)
    assert(m.keyCycle("k1") == "0:1", "zero landed rows must not bump")
    assert(m.keyCycle("k2") == "0:1")
    // push the map past its bound: the NEXT record resets into gen 1,
    // so a re-climbing counter can never collide with a gen-0 token
    val flood = (0 until 8200).map(i => s"flood$i" -> 1L).toMap
    m.record(flood.keys.toSeq.map(k => Fixtures.cond(key = k)), flood, 1L)
    m.record(Seq(c1), Map("k1" -> 1L), 1L)
    assert(m.keyCycle("k1") == "1:1", "post-reset tokens carry the new generation")
  }

  test("keyCycle is an atomic (gen, count) snapshot under concurrent resets") {
    val m = new ConditionMetrics
    val k = Fixtures.cond(key = "k")
    val flood = (0 until 8200).map(i => s"flood$i" -> 1L).toMap
    val floodConds = flood.keys.toSeq.map(kk => Fixtures.cond(key = kk))
    // odd generations bump "k" five times, even generations never —
    // so ANY observed token "g:c" with c > bumps(g) is a snapshot torn
    // across a reset (the pre-fix bug: gen read after the bump, count
    // read before the clear)
    def bumpsOf(gen: Long): Long = if (gen % 2 == 1) 5L else 0L
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop) {
        val tok = m.keyCycle("k")
        val Array(g, c) = tok.split(":")
        if (c.toLong > bumpsOf(g.toLong)) violations.add(tok)
      }
    })
    reader.start()
    try {
      // each iteration: flood past the bound (arming a reset), then the
      // reset-triggering record, then this generation's "k" bumps
      for (gen <- 1 to 24) {
        m.record(floodConds, flood, 1L)
        val bumps = bumpsOf(gen.toLong)
        if (bumps == 0L) m.record(Seq(k), Map("k" -> 0L), 1L) // reset, no bump
        else (1L to bumps).foreach(_ => m.record(Seq(k), Map("k" -> 1L), 1L))
      }
    } finally { stop = true; reader.join(5000) }
    assert(violations.isEmpty,
      s"torn (gen, count) tokens observed: ${violations.toArray.mkString(", ")}")
  }
}
