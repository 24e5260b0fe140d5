package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Automatic reconnect for streaming queries — the reference's
  * subscription loop restarts itself after a delay whenever the firehose
  * errors (/root/reference/src/util/subscription.ts:39-56:
  * `catch (err) { setTimeout(() => this.run(delay), delay) }`), resuming
  * from the stored cursor. The Spark analog: watch the query, and on
  * failure start a FRESH query from the same checkpoint after the delay —
  * Spark replays the failed micro-batch from its offsets, so supervision
  * composes with the effectively-once upsert (T8) without duplicates.
  */
object Supervision {

  /** Start `mkQuery` and keep it alive: on failure, restart after
    * `reconnectDelayMs` (up to `maxRestarts` times). `mkQuery` must point
    * every incarnation at the SAME checkpointLocation. */
  def startSupervised(mkQuery: () => StreamingQuery, reconnectDelayMs: Long = 3000,
      maxRestarts: Int = Int.MaxValue): SupervisedQuery =
    new SupervisedQuery(mkQuery, reconnectDelayMs, maxRestarts)

  final class SupervisedQuery(mkQuery: () => StreamingQuery,
      reconnectDelayMs: Long, maxRestarts: Int) {

    @volatile private var current: StreamingQuery = mkQuery()
    @volatile private var stopping = false
    @volatile private var restartCount = 0
    @volatile private var lastError: Option[Throwable] = None

    private val monitor = new Thread(() => {
      var alive = true
      while (alive && !stopping) {
        try {
          current.awaitTermination()
          // clean stop (stop() called) → leave the loop
          alive = false
        } catch {
          case e: Throwable if !stopping && restartCount < maxRestarts =>
            lastError = Some(e)
            Thread.sleep(reconnectDelayMs)
            // re-check AFTER the sleep: a stop() landing during the delay
            // has already stopped (the dead) `current` and returned — a
            // blind mkQuery() here would start a fresh incarnation nothing
            // ever stops, writing to the store with no owner
            if (!stopping) {
              restartCount += 1
              current = mkQuery() // same checkpoint → resume at the stored offsets
              // Dekker pairing with stop(): stop sets `stopping` BEFORE
              // stopping `current`, this publishes `current` before
              // re-reading `stopping` — one side always sees the other,
              // so a stop racing the assignment can't leak the restart
              if (stopping) { try current.stop() catch { case _: Exception => () } }
            }
          case e: Throwable =>
            lastError = Some(e)
            alive = false
        }
      }
    }, "graft-stream-supervisor")
    monitor.setDaemon(true)
    monitor.start()

    def restarts: Int = restartCount
    def error: Option[Throwable] = lastError

    /** processAllAvailable that survives a mid-call failure+restart: retry
      * against whichever incarnation is current until the deadline. */
    def processAllAvailable(timeoutMs: Long = 60000): Unit = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var done = false
      while (!done) {
        try { current.processAllAvailable(); done = true }
        catch {
          case e: Throwable =>
            // a dead monitor means no restart is coming (budget exhausted
            // or clean exit): fail fast with the REAL terminal error
            // instead of spinning out the whole timeout on it
            if (!monitor.isAlive && !stopping)
              throw new RuntimeException(
                s"supervised query terminated (restarts=$restartCount, no restart pending)",
                lastError.getOrElse(e))
            if (System.nanoTime() > deadline)
              throw new RuntimeException(s"supervised query did not settle in ${timeoutMs}ms", e)
            Thread.sleep(100)
        }
      }
    }

    def stop(): Unit = {
      stopping = true
      try current.stop() finally monitor.join(10000)
    }
  }
}
