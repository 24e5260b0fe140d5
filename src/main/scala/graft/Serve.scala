package graft

import graft.model.{Condition, ConditionStore}
import graft.serving.{Auth, DidResolver, FeedServer}

/** Deployment entry point — the engine run the way the reference process
  * runs (/root/reference/src/index.ts + server.ts: subscribe → ingest →
  * serve, one process):
  *
  * {{{
  * sbt "runMain graft.Serve wss://bsky.network did:web:feeds.example.com \
  *        feeds.example.com did:plc:publisher [conditions.json] [batchSec] [dataDir]"
  * }}}
  *
  * Wires the pipeline with the production pieces: standing conditions
  * restored through [[model.ConditionStore]] (file-backed control plane),
  * requester keys resolved from the real DID directory with the TTL cache,
  * signature verification via the key-shape dispatching
  * [[serving.Auth.DefaultVerifier]], and a fixed-interval drain loop
  * standing in for a scheduler. Runs until killed; the WebSocket client
  * reconnects from its stored cursor and the idle watchdog covers silent
  * upstream death.
  *
  * With a `dataDir` argument the process runs the DURABLE shape
  * ([[DurablePipeline]]): cursor file + frame spool + streaming checkpoint
  * + key-partitioned parquet store, so a kill-and-restart resumes with no
  * lost or duplicated posts. Without it, the in-memory [[LivePipeline]]
  * (cursor and store rebuilt by wire replay on restart).
  */
object Serve {
  def main(args: Array[String]): Unit = {
    // --restore-url=<console> pulls standing conditions from a remote
    // Admin Console at startup (subscription.ts:58-112); local file rows
    // win on key conflict, matching the reference's on-conflict-ignore.
    // --passkey=<secret> gates the admin CRUD endpoints (EDIT_WEB_PASSKEY).
    val restoreUrl = args.collectFirst {
      case a if a.startsWith("--restore-url=") => a.stripPrefix("--restore-url=")
    }
    // Admin passkey: prefer the GRAFT_WEB_PASSKEY environment variable
    // (the reference reads EDIT_WEB_PASSKEY from env, index.ts) — a CLI
    // flag is visible to every local user via ps/proc and shell history,
    // so --passkey remains only as an explicit documented override.
    val passkey = args.collectFirst {
      case a if a.startsWith("--passkey=") => a.stripPrefix("--passkey=")
    }.orElse(sys.env.get("GRAFT_WEB_PASSKEY"))
    // --search-endpoint=<url> enables the searchPosts initial backfill
    // (T2): at startup and after every drain interval, feeds with no
    // stored rows fill to initPost from the search API — the reference's
    // recordCount==0 run. Delta feeds are untouched, so the periodic call
    // is a cheap no-op once every feed holds rows.
    val searchEndpoint = args.collectFirst {
      case a if a.startsWith("--search-endpoint=") => a.stripPrefix("--search-endpoint=")
    }
    val pos = args.filterNot(_.startsWith("--"))
    require(pos.length >= 4,
      "usage: Serve <subscriptionEndpoint> <serviceDid> <hostname> <publisherDid> " +
        "[conditionsJsonPath] [drainIntervalSec] [dataDir] " +
        "[--restore-url=<console>] [--passkey=<secret>] [--search-endpoint=<url>]")
    val Array(endpoint, serviceDid, hostname, publisherDid) = pos.take(4)
    val drainSec = if (pos.length > 5) pos(5).toInt else 10
    val dataDir = if (pos.length > 6) Some(pos(6)) else None

    val spark = GraftSession.local()
    val local: Seq[Condition] =
      if (pos.length > 4) ConditionStore.load(spark, pos(4)) else Nil
    val (conditions, restoredMeta): (Seq[Condition], Map[String, Map[String, String]]) =
      restoreUrl match {
        case Some(url) =>
          val (restored, metas) =
            ConditionStore.restoreRemoteWithMeta(url, s"https://$hostname")
          // scalastyle:off println
          if (restored.isEmpty) println(s"no conditions restored from $url (unreachable or empty)")
          else println(s"restored ${restored.size} conditions from $url")
          // scalastyle:on println
          val have = local.map(_.key).toSet
          (ConditionStore.mergeRestore(local, restored),
            metas.filterNot { case (k, _) => have.contains(k) })
        case None => (local, Map.empty)
      }
    val cfg = FeedServer.Config(
      serviceDid = serviceDid,
      hostname = hostname,
      publisherDid = publisherDid,
      keyResolver = new DidResolver(new DidResolver.HttpFetcher),
      verifier = Auth.DefaultVerifier)
    // scalastyle:off println
    def searchHits(): Option[org.apache.spark.sql.DataFrame] =
      searchEndpoint.map(url =>
        spark.read.format("graft-search").option("endpoint", url).load())
    dataDir match {
      case Some(dir) =>
        val durable = new DurablePipeline(spark, conditions, cfg, endpoint, dir,
          adminPasskey = passkey)
        restoredMeta.foreach { case (k, m) => durable.control.setMeta(k, m) }
        val port = durable.start()
        println(s"graft serving DURABLE on :$port (${conditions.size} conditions), " +
          s"subscribed to $endpoint, data in $dir, spool flushed every ${drainSec}s")
        sys.addShutdownHook { durable.stop(); spark.stop() }
        searchHits().foreach { h =>
          val b = durable.backfillFromSearch(h)
          if (b > 0) println(s"backfilled $b rows from ${searchEndpoint.get}")
        }
        while (true) {
          Thread.sleep(drainSec * 1000L)
          val n = durable.flushSpool()
          if (n > 0) println(s"spooled $n frames (cursor=${durable.storedCursor})")
          searchHits().foreach { h =>
            val b = durable.backfillFromSearch(h)
            if (b > 0) println(s"backfilled $b rows from ${searchEndpoint.get}")
          }
        }
      case None =>
        val live = new LivePipeline(spark, conditions, cfg, endpoint,
          adminPasskey = passkey)
        restoredMeta.foreach { case (k, m) => live.control.setMeta(k, m) }
        val port = live.start()
        println(s"graft serving on :$port (${conditions.size} conditions), " +
          s"subscribed to $endpoint, draining every ${drainSec}s")
        sys.addShutdownHook { live.stop(); spark.stop() }
        searchHits().foreach { h =>
          val b = live.backfillFromSearch(h)
          if (b > 0) println(s"backfilled $b rows from ${searchEndpoint.get}")
        }
        while (true) {
          Thread.sleep(drainSec * 1000L)
          val n = live.drainBatch()
          if (n > 0) println(s"ingested $n rows (store=${live.storedRows}, cursor=${live.storedCursor})")
          searchHits().foreach { h =>
            val b = live.backfillFromSearch(h)
            if (b > 0) println(s"backfilled $b rows from ${searchEndpoint.get}")
          }
        }
    }
    // scalastyle:on println
  }
}
