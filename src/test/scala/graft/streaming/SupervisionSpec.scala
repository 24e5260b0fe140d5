package graft.streaming

import graft.SparkSpec

/** The supervisor's lifecycle contract under races: restarts resume work,
  * and stop() during ANY phase — including the reconnect delay — leaves no
  * unowned incarnation running. */
class SupervisionSpec extends SparkSpec {

  test("stop() during the reconnect delay never leaks a restarted query") {
    val made = new java.util.concurrent.atomic.AtomicInteger(0)
    def mkFailing() = {
      made.incrementAndGet()
      spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) =>
          throw new RuntimeException("boom")
        }
        .start()
    }
    val sup = Supervision.startSupervised(() => mkFailing(),
      reconnectDelayMs = 4000, maxRestarts = 10)
    // wait for the first failure to be RECORDED — the monitor sets
    // lastError before it sleeps, so once error is visible the monitor is
    // in (or entering) the delay window
    val deadline = System.currentTimeMillis() + 30000
    while (sup.error.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(sup.error.isDefined, "first incarnation never failed")
    val incarnationsAtStop = made.get()
    sup.stop() // lands inside the 4s reconnect sleep
    // the race under test: a blind restart after the sleep would start an
    // incarnation that nothing ever stops — give it time to show up
    Thread.sleep(5000)
    assert(made.get() == incarnationsAtStop,
      s"stop() leaked a restarted query (incarnations $incarnationsAtStop -> ${made.get()})")
  }
}
