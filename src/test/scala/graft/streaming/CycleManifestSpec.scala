package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Failure-mode contract of the persisted cycle manifest: a corrupt or
  * regressed `_graft_cycles` file must DEGRADE (replica serves uncached,
  * successor writer resumes above the unreadable history) — never throw
  * into Writer construction or a replica's request path, and never let a
  * deposed drain's late write regress a replica's version tokens.
  */
class CycleManifestSpec extends AnyFunSuite {

  private def tmpStore(): String =
    Files.createTempDirectory("graft-manifest").toString

  private def writeRaw(dir: String, body: String): Unit = {
    Thread.sleep(5) // distinct mtime for the reader's (mtime, len) stat
    StoreFs.writeString(CycleManifest.manifestPath(dir), body)
  }

  private def manifestJson(gen: Long, counts: (String, Long)*): String =
    s"""{"gen":$gen,"counts":{${
      counts.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}"""

  test("corrupt manifest degrades: read None, replica uncached, writer resumes above history") {
    val dir = tmpStore()

    // a healthy history first: gen 4, one feed counter
    writeRaw(dir, manifestJson(4L, "f1" -> 2L))
    assert(CycleManifest.read(dir) == Some((4L, Map("f1" -> 2L))))

    // corruption lands (torn write, bitrot): read() and the replica
    // reader both degrade to "absent", nothing throws
    writeRaw(dir, """{"gen":4,"counts":{"f1""")
    assert(CycleManifest.read(dir).isEmpty,
      "a corrupt manifest must read as absent, not throw")
    val reader = new CycleManifest.Reader(dir)
    assert(reader.snapshot().isEmpty, "replica must serve uncached")
    assert(reader.snapshot().isEmpty, "…and stay calm on every request")
    assert(reader.keyCycle("f1").isEmpty)

    // Writer construction over the corruption must not fail the drain,
    // and its generations must land ABOVE anything the unreadable
    // history could have issued (gen 4 + any bounded count)
    val w = new CycleManifest.Writer(dir)
    w.persist(0L, Map("f1" -> 1L))
    val recovered = CycleManifest.read(dir)
    assert(recovered.isDefined, "the successor's persist must heal the file")
    assert(recovered.get._1 > 4L,
      s"successor gens must stay monotone past the corrupt history, got gen ${recovered.get._1}")
    // and the replica recovers on the same reader instance
    assert(reader.keyCycle("f1").contains(s"${recovered.get._1}:1"))
  }

  test("reader fences a regressed generation (late write from a deposed drain)") {
    val dir = tmpStore()
    val reader = new CycleManifest.Reader(dir)

    writeRaw(dir, manifestJson(7L, "f1" -> 3L))
    assert(reader.snapshot() == Some((7L, Map("f1" -> 3L))))

    // a deposed writer's stale rename lands AFTER the successor's: the
    // replica must keep the newer generation — adopting gen 5 would let
    // an old cached head token re-validate as current
    writeRaw(dir, manifestJson(5L, "f1" -> 9L))
    assert(reader.snapshot() == Some((7L, Map("f1" -> 3L))),
      "a regressed gen must not replace the newer cached one")
    assert(reader.keyCycle("f1").contains("7:3"))

    // the live writer's next persist moves forward again and wins
    writeRaw(dir, manifestJson(8L, "f1" -> 4L))
    assert(reader.snapshot() == Some((8L, Map("f1" -> 4L))))
  }

  test("async publisher: monotone latest-wins publication under concurrent-looking load") {
    val published = new java.util.concurrent.CopyOnWriteArrayList[(Long, Long)]()
    val slow: (Long, Map[String, Long]) => Unit = (g, c) => {
      Thread.sleep(1) // make the worker slower than the submit loop
      published.add((g, c("f1")))
    }
    val pub = new CycleManifest.AsyncPublisher(slow)
    // submits arrive in record() order (record is synchronized); model
    // that: a strictly monotone (gen, count) stream with a gen reset bump
    (1 to 150).foreach(i => pub.submit(0L, Map("f1" -> i.toLong)))
    (1 to 150).foreach(i => pub.submit(1L, Map("f1" -> i.toLong)))
    assert(pub.flush(), "publisher must drain")
    val seq = published.toArray(Array.empty[(Long, Long)]).toSeq
    assert(seq.nonEmpty && seq.last == ((1L, 150L)),
      s"the FINAL snapshot must always publish, got ${seq.lastOption}")
    seq.sliding(2).foreach {
      case Seq((g1, c1), (g2, c2)) =>
        assert(g2 > g1 || (g2 == g1 && c2 > c1),
          s"published sequence must be strictly monotone: ($g1,$c1) -> ($g2,$c2)")
      case _ =>
    }
    assert(pub.published < 300,
      s"latest-wins must skip intermediates under load, published all ${pub.published}")
    pub.close()
  }

  test("async publisher unblocks record() from a slow store (drain-latency A/B)") {
    val c = graft.domain.Fixtures.cond(key = "f1")
    val slowMs = 40L
    def slowPersist: (Long, Map[String, Long]) => Unit =
      (_, _) => Thread.sleep(slowMs)
    val n = 10

    // A: the old inline wiring — every record() eats the store latency
    val syncMetrics = new graft.model.ConditionMetrics
    syncMetrics.persistWith(slowPersist)
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => syncMetrics.record(Seq(c), Map("f1" -> 1L), 1L))
    val syncMs = (System.nanoTime() - t0) / 1e6

    // B: the async publisher — record() returns without waiting on the FS
    val pub = new CycleManifest.AsyncPublisher(slowPersist)
    val asyncMetrics = new graft.model.ConditionMetrics
    asyncMetrics.persistWith(pub.submit)
    val t1 = System.nanoTime()
    (1 to n).foreach(_ => asyncMetrics.record(Seq(c), Map("f1" -> 1L), 1L))
    val asyncMs = (System.nanoTime() - t1) / 1e6
    assert(pub.flush(), "publisher must drain")
    pub.close()

    assert(syncMs >= n * slowMs,
      s"control: inline persists must serialize behind the store ($syncMs ms)")
    assert(asyncMs < syncMs / 2,
      s"async record() must not stall behind the store: $asyncMs ms vs $syncMs ms inline")
  }

  test("split-brain soak: a deposed writer racing its successor never regresses reader tokens") {
    val dir = tmpStore()
    // incarnation A (baseGen 0) writes some history…
    val a = new CycleManifest.Writer(dir)
    a.persist(0L, Map("f1" -> 1L))
    a.persist(0L, Map("f1" -> 2L))
    // …then is deposed: B constructs (sweeps staging, resumes gen 0+1=1)
    val b = new CycleManifest.Writer(dir)
    val reader = new CycleManifest.Reader(dir)
    assert(reader.snapshot().exists(_._1 == 0L))

    // A keeps persisting stale gen-0 snapshots (a deposed drain's late
    // renames), racing B's live gen-1 stream and a hammering reader
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // touched only by tR; read after join() (which is the memory barrier)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val errs = new java.util.concurrent.CopyOnWriteArrayList[Throwable]()
    def spawn(body: => Unit): Thread = {
      val t = new Thread(() => try body catch {
        case e: Throwable => errs.add(e); ()
      })
      t.start(); t
    }
    val tA = spawn((3 to 120).foreach { i =>
      a.persist(0L, Map("f1" -> i.toLong)); Thread.sleep(1) })
    val tB = spawn((1 to 120).foreach { i =>
      b.persist(0L, Map("f1" -> i.toLong)); Thread.sleep(1) })
    val tR = spawn(while (!stop.get()) reader.snapshot().foreach(s => seen += s._1))
    tA.join(30000); tB.join(30000)
    stop.set(true); tR.join(30000)
    assert(errs.isEmpty, s"nothing may throw under the race: ${errs.toArray.toSeq}")

    val gens = seen.toSeq
    assert(gens.nonEmpty)
    gens.sliding(2).foreach {
      case Seq(g1, g2) => assert(g2 >= g1,
        s"reader generations must never regress under split-brain: $g1 -> $g2")
      case _ =>
    }
    // the live writer's final persist wins: no head can revalidate a
    // stale-as-current token once the successor has published
    b.persist(0L, Map("f1" -> 200L))
    assert(reader.snapshot() == Some((1L, Map("f1" -> 200L))))
  }

  test("stat-cadence A/B: the 250 ms default amortizes a simulated object-store stat to ~zero") {
    val dir = tmpStore()
    writeRaw(dir, manifestJson(1L, "f1" -> 1L))
    val n = 100
    // simulated object-store namespace RPC: statOf plus a latency
    def simStat(ms: Long): org.apache.hadoop.fs.Path => Option[(Long, Long)] =
      p => { if (ms > 0) Thread.sleep(ms); StoreFs.statOf(p) }
    def measure(simMs: Long, intervalMs: Long): Double = {
      val r = new CycleManifest.Reader(dir, intervalMs, simStat(simMs))
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => assert(r.keyCycle("f1").contains("1:1")))
      (System.nanoTime() - t0) / 1e6 / n
    }
    val table = for {
      sim <- Seq(0L, 10L, 30L); interval <- Seq(0L, CycleManifest.DefaultStatIntervalMs)
    } yield (sim, interval, measure(sim, interval))
    table.foreach { case (s, i, ms) =>
      info(f"simulated stat latency ${s}%2d ms, statIntervalMs $i%3d -> $ms%8.3f ms/request")
    }
    // per-request cost at interval 0 IS the RPC; at the default it
    // amortizes below a tenth of it (one stat per interval, not per call)
    val at30int0 = table.find(t => t._1 == 30L && t._2 == 0L).get._3
    val at30def = table.find(t => t._1 == 30L && t._2 > 0L).get._3
    assert(at30int0 >= 30.0,
      f"control: uncached readers must pay the RPC per request ($at30int0%.2f ms)")
    assert(at30def < 3.0,
      f"the default cadence must amortize a 30 ms stat below 10%% ($at30def%.2f ms/request)")
  }

  test("replicaVersion throttles BOTH namespace reads; staleness is bounded by the interval") {
    val dir = tmpStore()
    writeRaw(dir, manifestJson(1L, "f1" -> 1L))
    StoreFs.writeString(StoreFs.path(dir, "_current"), "v0000000000000001")
    val interval = 120L
    val v = CycleManifest.replicaVersion(dir, statIntervalMs = interval)
    assert(v("f1").contains("v0000000000000001:1:1"))
    // a pointer flip AND a drain land inside the interval: the replica
    // serves the cached token (zero FS calls), then sees both by the
    // time the interval expires — the documented bound
    StoreFs.writeString(StoreFs.path(dir, "_current"), "v0000000000000002")
    writeRaw(dir, manifestJson(1L, "f1" -> 2L))
    assert(v("f1").contains("v0000000000000001:1:1"),
      "inside the interval the cached token is served")
    Thread.sleep(interval + 30L)
    assert(v("f1").contains("v0000000000000002:1:2"),
      "past the interval both the pointer flip and the new counter are visible")
  }

  test("a throttled reader bounds staleness to the stat interval") {
    val dir = tmpStore()
    val reader = new CycleManifest.Reader(dir, statIntervalMs = 50L)
    writeRaw(dir, manifestJson(1L, "f1" -> 1L))
    assert(reader.snapshot() == Some((1L, Map("f1" -> 1L))))
    // within the interval the cached answer is served without a stat —
    // a change lands but is not yet visible (the documented bound)
    writeRaw(dir, manifestJson(2L, "f1" -> 2L))
    assert(reader.snapshot() == Some((1L, Map("f1" -> 1L))),
      "inside the stat interval the reader serves the cached snapshot")
    Thread.sleep(60L)
    assert(reader.snapshot() == Some((2L, Map("f1" -> 2L))),
      "past the interval the change is visible")
  }
}
