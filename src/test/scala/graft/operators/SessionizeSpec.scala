package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {

  test("batch sessionization: gaps split sessions, bounds and counts are exact") {
    val s = spark
    import s.implicits._
    // key 1: [0, 10, 20] gap [100, 105]; key 2: single event
    val df = Seq(
      (1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), (1L, 100L, 4L), (1L, 105L, 5L),
      (2L, 7L, 6L),
    ).toDF("user_id", "ts_us", "event_id")
    val got = Sessionize.batch(df, "user_id", "ts_us", "event_id", gapUs = 30L)
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 3L, 0L, 20L),
      (1L, 2L, 2L, 100L, 105L),
      (2L, 1L, 1L, 7L, 7L),
    ))
  }

  test("streaming flatMapGroupsWithState matches batch sessionization on closed sessions") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val events = Seq(
      Sessionize.Ev(1L, 0L), Sessionize.Ev(1L, 10L), Sessionize.Ev(1L, 100L),
      Sessionize.Ev(1L, 105L), Sessionize.Ev(1L, 300L),
      Sessionize.Ev(2L, 7L), Sessionize.Ev(2L, 500L),
    )
    val stream = MemoryStream[Sessionize.Ev]
    val out = Sessionize.streaming(stream.toDS(), gapUs = 30L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    stream.addData(events)
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_out").as[Sessionize.SessionOut]
      .collect().map(o => (o.key, o.n_events, o.start_us, o.end_us)).toSet
    // sessions CLOSED by a later event in the same run (open tails stay in state)
    assert(closed == Set(
      (1L, 2L, 0L, 10L), (1L, 2L, 100L, 105L), (2L, 1L, 7L, 7L),
    ))
    // batch over the same events yields those closed sessions plus the open tails
    val batchAll = Sessionize.batch(
        events.map(e => (e.key, e.tsUs)).toDF("user_id", "ts_us")
          .withColumn("event_id", col("ts_us")),
        "user_id", "ts_us", "event_id", gapUs = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(closed.subsetOf(batchAll))
    assert(batchAll.size == closed.size + 2) // two open tails (1@300, 2@500)
  }

  test("streaming chains cross-batch late events; a reachable chain folds into the open session") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Sessionize.Ev]
    val out = Sessionize.streaming(stream.toDS(), gapUs = 30L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sessions_late_out").start()
    // batch 1: open sessions (1000..1010) for both keys
    stream.addData(Seq(Sessionize.Ev(1L, 1000L), Sessionize.Ev(1L, 1010L),
      Sessionize.Ev(2L, 1000L), Sessionize.Ev(2L, 1010L)))
    q.processAllAvailable()
    // batch 2, key 1: late events 800+820 are within gap of EACH OTHER →
    // one chained session (was two singletons); 900 is out of gap of the
    // chain → its own session; 1005 merges into the open session but its
    // extended start (1000) can't reach 900 (gap 30)
    // batch 2, key 2: 950 chains late, then 975 merges into the open
    // session pulling its start to 975 — within gap of 950, so the chain
    // FOLDS IN instead of closing separately (batch() parity)
    stream.addData(Seq(Sessionize.Ev(1L, 800L), Sessionize.Ev(1L, 820L),
      Sessionize.Ev(1L, 900L), Sessionize.Ev(1L, 1005L),
      Sessionize.Ev(2L, 950L), Sessionize.Ev(2L, 975L)))
    q.processAllAvailable()
    // batch 3: an out-of-gap event closes key 2's folded open session
    stream.addData(Seq(Sessionize.Ev(2L, 2000L)))
    q.processAllAvailable()
    q.stop()
    val closed = spark.table("sessions_late_out").as[Sessionize.SessionOut]
      .collect().map(o => (o.key, o.n_events, o.start_us, o.end_us)).toSet
    assert(closed == Set(
      (1L, 2L, 800L, 820L), (1L, 1L, 900L, 900L),
      (2L, 4L, 950L, 1010L),
    ))
  }

  test("session_window streaming emits watermark-closed sessions with gap-extended ends") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    def ts(sec: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:00:$sec%02d")
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val out = Sessionize.streamingSessionWindow(
      stream.toDF().toDF("key", "ts"), "key", "ts", "5 seconds", "0 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sw_out").start()
    // key 1: events at 0,3s (one session 0-8); key 2: event at 1s (session 1-6)
    stream.addData((1L, ts(0)), (1L, ts(3)), (2L, ts(1)))
    q.processAllAvailable()
    // advance the watermark far past both sessions' ends → they emit
    stream.addData((9L, ts(50)))
    q.processAllAvailable()
    val got = spark.table("sw_out")
      .select(col("key"), col("n_events"),
        unix_timestamp(col("start")).as("s"), unix_timestamp(col("end")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3) - r.getLong(2))).toSet
    q.stop()
    assert(got == Set((1L, 2L, 8L), (2L, 1L, 5L))) // durations: 3s span + 5s gap, 0 + 5s gap
  }
}
