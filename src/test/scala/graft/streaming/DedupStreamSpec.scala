package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Doc(id: Long, text: String, ts: Timestamp)

class DedupStreamSpec extends SparkSpec {

  private def t(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("exact stream dedup drops in-horizon duplicates across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = DedupStream.exact(stream.toDF(), "ts", "30 minutes", "id")
      .writeStream.format("memory").queryName("dedup_exact").outputMode("append").start()

    stream.addData(Doc(1, "a", t(0)), Doc(2, "b", t(1)), Doc(1, "a again", t(2)))
    q.processAllAvailable()
    stream.addData(Doc(1, "a redelivered", t(3)), Doc(3, "c", t(4)))
    q.processAllAvailable()
    val got = spark.table("dedup_exact").select("id").as[Long].collect().sorted
    q.stop()
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("dedup state survives a query restart from the checkpoint") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("dedup-ckpt").toString
    val stream = MemoryStream[Doc]
    // the memory sink cannot recover from a checkpoint; foreachBatch can
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = DedupStream.exact(stream.toDF(), "ts", "1 hour", "id")
      .writeStream.outputMode("append").option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.select("id").collect().foreach(r => emitted.add(r.getLong(0)))
      }
      .start()

    val q1 = start()
    stream.addData(Doc(1, "first", t(0)), Doc(2, "second", t(1)))
    q1.processAllAvailable()
    q1.stop()

    // restart from the same checkpoint: key 1's state must still be there
    val q2 = start()
    stream.addData(Doc(1, "replay after restart", t(2)), Doc(3, "third", t(3)))
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq.sorted == Seq(1L, 2L, 3L)) // replayed id=1 stayed deduped
  }

  test("fingerprint dedup folds word order and repetition; state evicts past the watermark") {
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = DedupStream.byFingerprint(stream.toDF(), "text", "ts", "5 minutes")
      .writeStream.format("memory").queryName("dedup_fp").outputMode("append").start()

    // same word set, different order/duplication → one survivor
    stream.addData(Doc(1, "spark scales out", t(0)), Doc(2, "out scales spark spark", t(1)))
    q.processAllAvailable()
    assert(spark.table("dedup_fp").count() == 1)

    // push the watermark far past t(1)+5min, evicting the fingerprint state
    stream.addData(Doc(3, "unrelated words", t(30)))
    q.processAllAvailable()
    // the old fingerprint re-emits once its state is gone — the documented
    // bounded-state trade-off (cross-horizon dedup is the store's anti-join)
    stream.addData(Doc(4, "spark scales out", t(31)))
    q.processAllAvailable()
    val ids = spark.table("dedup_fp").select("id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 3L, 4L))
  }

  test("contentless rows (null/empty/whitespace text) pass through undeduped") {
    // they all share the degenerate md5("") fingerprint: keying them would
    // collapse every unrelated null/empty record to ONE survivor per
    // horizon — there is no content to be a near-duplicate OF
    val s = spark
    import s.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Doc]
    val q = DedupStream.byFingerprint(stream.toDF(), "text", "ts", "5 minutes")
      .writeStream.format("memory").queryName("dedup_fp_null").outputMode("append").start()
    stream.addData(
      Doc(1, null, t(0)), Doc(2, "", t(1)), Doc(3, "   ", t(2)),
      Doc(4, "real content here", t(3)), Doc(5, "real content here", t(4)))
    q.processAllAvailable()
    val ids = spark.table("dedup_fp_null").select("id").as[Long].collect().sorted
    q.stop()
    // all three contentless rows survive; the real duplicate still dedups
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
