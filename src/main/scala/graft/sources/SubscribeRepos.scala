package graft.sources

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.ByteBuffer
import java.util.concurrent.{CompletableFuture, CompletionStage}

/** WebSocket client for `com.atproto.sync.subscribeRepos`
  * (/root/reference/src/util/subscription.ts:16-73) — the piece that was
  * missing between the wire and [[Firehose.decodeCborFrames]]: it opens
  * `ws(s)://<service>/xrpc/com.atproto.sync.subscribeRepos[?cursor=N]`
  * with the JDK's built-in `java.net.http.WebSocket` (zero new
  * dependencies), hands every complete binary frame to the sink, and
  * persists the commit cursor every `cursorEvery` events — the
  * reference's `if (isCommit(evt) && evt.seq % 20 === 0) updateCursor`
  * cadence (subscription.ts:48-51).
  *
  * Reconnect mirrors the reference's
  * `catch { setTimeout(() => this.run(delay), delay) }` (:39-56) and
  * [[graft.streaming.Supervision]]'s contract for streaming queries: on
  * abnormal close or transport error the client sleeps `reconnectDelayMs`
  * and dials again, re-reading `getCursor` per attempt (the reference's
  * `getParams`), so the server replays everything after the last stored
  * cursor. Between the coarse cursor cadence and replay-on-reconnect the
  * frame stream is AT-LEAST-ONCE; exactness is downstream's job — the
  * ingest upsert is idempotent on (uri), exactly like the reference's
  * on-conflict-ignore (T8).
  *
  * Frames go to `onFrame` as raw bytes, NOT through Spark here: the
  * client is the single-socket edge (one per subscription, like the
  * reference process); batching frames into DataFrames and decoding them
  * in parallel is [[Firehose.decodeCborFrames]]'s distributed half.
  */
final class SubscribeReposClient(
    service: String,
    getCursor: () => Option[Long],
    updateCursor: Long => Unit,
    onFrame: Array[Byte] => Unit,
    cursorEvery: Int = 20) {

  @volatile private var stopping = false
  @volatile private var socket: WebSocket = _
  @volatile private var restartCount = 0
  @volatile private var lastErr: Option[Throwable] = None
  @volatile private var lastActivityMs = System.currentTimeMillis()
  @volatile private var currentDial: CompletableFuture[Void] = _
  private var monitor: Thread = _
  private val http = HttpClient.newHttpClient()

  private def uri: URI = {
    val base = s"$service/xrpc/com.atproto.sync.subscribeRepos"
    URI.create(getCursor().map(c => s"$base?cursor=$c").getOrElse(base))
  }

  /** Commit frames carry the resumption cursor in `body.seq`; only the two
    * leading CBOR items are inspected, non-commit frames yield None. */
  private def commitSeq(frame: Array[Byte]): Option[Long] =
    try {
      val r = new Cbor.Reader(frame)
      r.decode() match {
        case h: Cbor.CMap
          if h.get("op").contains(Cbor.CInt(1)) &&
             h.get("t").contains(Cbor.CText("#commit")) && r.remaining > 0 =>
          // skip-walk the body: a full decode() copied the multi-KB
          // `blocks` CAR byte string out of EVERY commit frame on the
          // single-socket edge thread, just to read one integer
          r.mapValueOf("seq").collect { case Cbor.CInt(s) => s }
        case _ => None
      }
    } catch { case _: Exception => None } // invalid frame: no cursor advance

  private def handleFrame(frame: Array[Byte]): Unit = {
    onFrame(frame)
    commitSeq(frame).foreach(seq => if (seq % cursorEvery == 0) updateCursor(seq))
  }

  /** One dial: the future completes on normal close, fails on transport
    * error or abnormal close (an abrupt TCP drop surfaces as onError). */
  private def connectOnce(): CompletableFuture[Void] = {
    val done = new CompletableFuture[Void]()
    val listener = new WebSocket.Listener {
      // JDK WebSocket may deliver one wire message in several parts
      private val pending = new java.io.ByteArrayOutputStream()
      override def onOpen(w: WebSocket): Unit = { lastActivityMs = System.currentTimeMillis(); w.request(1) }
      override def onBinary(w: WebSocket, data: ByteBuffer, last: Boolean): CompletionStage[_] = {
        lastActivityMs = System.currentTimeMillis()
        val part = new Array[Byte](data.remaining())
        data.get(part)
        pending.write(part)
        if (last) {
          val frame = pending.toByteArray
          pending.reset()
          try handleFrame(frame)
          catch { case _: Exception => () } // could-not-handle: skip (subscription.ts:41-46)
        }
        w.request(1)
        null
      }
      override def onClose(w: WebSocket, status: Int, reason: String): CompletionStage[_] = {
        if (status == WebSocket.NORMAL_CLOSURE || stopping) done.complete(null)
        else done.completeExceptionally(
          new java.io.IOException(s"abnormal websocket close: $status $reason"))
        null
      }
      override def onError(w: WebSocket, err: Throwable): Unit =
        done.completeExceptionally(err)
    }
    http.newWebSocketBuilder().buildAsync(uri, listener).whenComplete { (w, e) =>
      if (e != null) done.completeExceptionally(e)
      else if (done.isDone || stopping) {
        // watchdog gave up on this dial mid-handshake, OR stop() ran while
        // the handshake was in flight — stop() sendCloses only the socket
        // it can SEE, so a late-landing socket here would stream frames
        // forever (onFrame after stop() returned, monitor parked in join).
        // Kill it and unpark the dial future.
        w.abort()
        done.complete(null)
      }
      else {
        socket = w
        // Dekker pairing with stop(): stop sets `stopping` BEFORE it reads
        // `socket`, this publishes `socket` before re-reading `stopping`
        // (both volatile) — so either stop sees the new socket and closes
        // it, or this re-check sees the stop and aborts; a stop landing
        // between the check above and the assignment can't leak a zombie.
        if (stopping) { w.abort(); done.complete(null) }
      }
    }
    currentDial = done
    done
  }

  /** Dial and keep the subscription alive on a daemon thread: reconnect
    * after `reconnectDelayMs` on failure (up to `maxRestarts`), stop on
    * normal close or [[stop]].
    *
    * `idleTimeoutMs` arms an idle WATCHDOG: if no frame arrives for that
    * long, the socket is aborted, which surfaces as a transport error and
    * goes through the normal reconnect-with-cursor path. This covers the
    * failure the listener callbacks cannot: an abrupt peer death the JDK
    * WebSocket never reports (observed — EOF without a Close frame can
    * leave the receive loop silently parked), and the real wire's stalled
    * upstreams. The firehose emits events continuously, so a minute of
    * silence IS a fault; pick a smaller value in tests. */
  def start(reconnectDelayMs: Long = 3000, maxRestarts: Int = Int.MaxValue,
      idleTimeoutMs: Long = 60000): Unit = {
    monitor = new Thread(() => {
      var alive = true
      while (alive && !stopping) {
        try {
          lastActivityMs = System.currentTimeMillis() // arm the watchdog per dial
          connectOnce().join()
          alive = false // server closed normally
        } catch {
          case e: Throwable if !stopping && restartCount < maxRestarts =>
            lastErr = Some(e)
            Thread.sleep(reconnectDelayMs)
            restartCount += 1 // redial; uri re-reads the stored cursor
          case e: Throwable =>
            lastErr = Some(e)
            alive = false
        }
      }
    }, "graft-subscribe-repos")
    monitor.setDaemon(true)
    monitor.start()

    val watchdog = new Thread(() => {
      while (monitor.isAlive && !stopping) {
        Thread.sleep(math.max(10L, idleTimeoutMs / 4))
        val idle = System.currentTimeMillis() - lastActivityMs
        val dial = currentDial
        if (idle > idleTimeoutMs && dial != null && !dial.isDone) {
          lastActivityMs = System.currentTimeMillis() // one strike per quiet period
          Option(socket).foreach(_.abort()) // abort() invokes NO listener methods —
          dial.completeExceptionally( // — so the dial future is failed directly
            new java.io.IOException(s"no frames for ${idleTimeoutMs}ms: idle timeout"))
        }
      }
    }, "graft-subscribe-repos-watchdog")
    watchdog.setDaemon(true)
    watchdog.start()
  }

  def restarts: Int = restartCount
  def error: Option[Throwable] = lastErr

  /** Block until the monitor exits (normal close or restart budget). */
  def awaitStopped(timeoutMs: Long): Boolean = {
    monitor.join(timeoutMs)
    !monitor.isAlive
  }

  def stop(): Unit = {
    stopping = true
    Option(socket).foreach(_.sendClose(WebSocket.NORMAL_CLOSURE, "bye"))
    if (monitor != null) monitor.join(10000)
  }
}
