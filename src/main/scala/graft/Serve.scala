package graft

import graft.model.{Condition, ConditionStore}
import graft.serving.{Auth, DidResolver, FeedServer}

/** Deployment entry point — the engine run the way the reference process
  * runs (/root/reference/src/index.ts + server.ts: subscribe → ingest →
  * serve, one process):
  *
  * {{{
  * sbt "runMain graft.Serve wss://bsky.network did:web:feeds.example.com \
  *        feeds.example.com did:plc:publisher [conditions.json] [batchSec]"
  * }}}
  *
  * Wires [[LivePipeline]] with the production pieces: standing conditions
  * restored through [[model.ConditionStore]] (file-backed control plane),
  * requester keys resolved from the real DID directory with the TTL cache,
  * signature verification via the key-shape dispatching
  * [[serving.Auth.DefaultVerifier]], and a fixed-interval drain loop
  * standing in for a scheduler. Runs until killed; the WebSocket client
  * reconnects from its stored cursor and the idle watchdog covers silent
  * upstream death.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: Serve <subscriptionEndpoint> <serviceDid> <hostname> <publisherDid> " +
        "[conditionsJsonPath] [drainIntervalSec]")
    val Array(endpoint, serviceDid, hostname, publisherDid) = args.take(4)
    val drainSec = if (args.length > 5) args(5).toInt else 10

    val spark = GraftSession.local()
    val conditions: Seq[Condition] =
      if (args.length > 4) ConditionStore.load(spark, args(4)) else Nil
    val cfg = FeedServer.Config(
      serviceDid = serviceDid,
      hostname = hostname,
      publisherDid = publisherDid,
      keyResolver = new DidResolver(new DidResolver.HttpFetcher),
      verifier = Auth.DefaultVerifier)
    val live = new LivePipeline(spark, conditions, cfg, endpoint)
    val port = live.start()
    // scalastyle:off println
    println(s"graft serving on :$port (${conditions.size} conditions), " +
      s"subscribed to $endpoint, draining every ${drainSec}s")
    // scalastyle:on println
    sys.addShutdownHook { live.stop(); spark.stop() }
    while (true) {
      Thread.sleep(drainSec * 1000L)
      val n = live.drainBatch()
      if (n > 0) println(s"ingested $n rows (store=${live.storedRows}, cursor=${live.storedCursor})")
    }
  }
}
