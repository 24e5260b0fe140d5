package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import graft.domain.Fixtures
import graft.model.Post

/** The store-write serialization contract: every read-modify-write of a
  * post store (sink append, rewrite-and-swap compaction/delete, backfill
  * append) runs under `Ingest.lockFor(storeDir)`. Without it, rows appended
  * between a compaction's `kept` read and its recursive delete are silently
  * destroyed, and concurrent rewrites race on the tmp-dir move. This spec
  * hammers the locked paths from competing threads and asserts nothing is
  * lost for unrelated feeds — the failure mode the unsynchronized code had.
  */
class StoreLockSpec extends SparkSpec {

  private def rows(key: String, from: Int, n: Int): Seq[Post] =
    (from until from + n).map { i =>
      Post(s"at://stress/$key/$i", key, f"c$i%04d", None, None,
        new Timestamp(1700000000000L + i * 1000L))
    }

  test("lockFor is one object per normalized store path") {
    val dir = Files.createTempDirectory("graft-lock").toString
    assert(Ingest.lockFor(dir) eq Ingest.lockFor(dir + "/"))
    assert(Ingest.lockFor(dir) eq Ingest.lockFor(dir + "/x/.."))
  }

  test("concurrent appends, deletes and compactions lose no unrelated rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stress").resolve("store").toString
    val conditions = Seq(Fixtures.cond(key = "keep", limitCount = 2000),
      Fixtures.cond(key = "doomed", limitCount = 2000))

    // seed both feeds; seeding is single-threaded so a plain write is fine
    (rows("keep", 0, 5) ++ rows("doomed", 0, 5)).toDF()
      .write.partitionBy("key").parquet(dir)

    val pool = Executors.newFixedThreadPool(3)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def task(body: => Unit): Unit = pool.execute { () =>
      start.await()
      try body catch { case t: Throwable => failures.add(t) }
    }

    val batches = 6
    // appender: the sink's locked read-dedup-append sequence
    task {
      for (b <- 1 to batches) {
        Ingest.lockFor(dir).synchronized {
          val stored = Ingest.readStore(spark, dir)
          val fresh = graft.operators.Upsert.newRows(
            stored, rows("keep", b * 100, 5).toDF(), Seq("uri", "key"))
          fresh.write.mode("append").partitionBy("key").parquet(dir)
        }
      }
    }
    // deleter: admin deleteCondition path, repeatedly (idempotent)
    task { for (_ <- 1 to 4) Ingest.deleteKey(spark, dir, "doomed") }
    // compactor: retention rewrite-and-swap over the whole store
    task { for (_ <- 1 to 3) Ingest.retentionCompact(spark, dir, conditions) }

    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(300, TimeUnit.SECONDS), "stress threads hung")
    assert(failures.isEmpty, s"store mutation threw: ${failures.peek()}")

    val store = Ingest.readStore(spark, dir)
    val kept = store.filter($"key" === "keep").select("uri").as[String].collect().toSet
    val expected = (rows("keep", 0, 5) ++
      (1 to batches).flatMap(b => rows("keep", b * 100, 5))).map(_.uri).toSet
    assert(kept == expected,
      s"lost ${(expected -- kept).size} keep-rows, gained ${(kept -- expected).size}")
    assert(store.filter($"key" === "doomed").count() == 0L)
  }
}
