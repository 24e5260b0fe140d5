package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper

/** Network DID resolution with a TTL cache — the production counterpart of
  * [[Auth.StaticKeyResolver]] (/root/reference/src/server.ts:39-43: a
  * `DidResolver({plcUrl: 'https://plc.directory', didCache})` backed by a
  * `MemoryCache`; /root/reference/src/auth.ts:16 resolves the requester's
  * atproto signing key from it on every private-feed request).
  *
  * Two DID methods, matching what the atproto wire actually serves:
  *   - `did:plc:…` → `GET {plcUrl}/{did}` (the plc.directory API shape)
  *   - `did:web:host[:path…]` → `GET https://host/.well-known/did.json`
  *     (or `https://host/path…/did.json` for path-form DIDs) — the same
  *     document [[FeedServer]] publishes for itself.
  *
  * The signing key is the `verificationMethod` whose id fragment is
  * `#atproto`, published as a `publicKeyMultibase`: base58btc ('z' prefix)
  * over a multicodec tag + SEC 1 key bytes. secp256k1-pub (varint 0xe701,
  * compressed 33 bytes) is decoded to the raw point bytes that
  * [[Auth.Es256kVerifier]] consumes; bare (untagged) 33/65-byte points are
  * accepted for legacy `EcdsaSecp256k1VerificationKey2019` documents.
  *
  * Network I/O goes through a [[DidResolver.Fetcher]] so specs run against
  * an in-process HTTP stub; the TTL clock is injectable the same way.
  * Results (hits only) cache for `ttlMillis`, like the reference's
  * MemoryCache — a miss is retried on the next request so a key published
  * moments later is not negatively cached for an hour.
  */
final class DidResolver(
    fetcher: DidResolver.Fetcher,
    plcUrl: String = "https://plc.directory",
    ttlMillis: Long = 3600L * 1000,
    nowMillis: () => Long = () => System.currentTimeMillis(),
    maxEntries: Int = 10000,
    // `iss` is attacker-supplied, so did:web resolution is an SSRF
    // primitive by construction: the default refuses targets that only
    // make sense INSIDE a deployment network — IP-literal hosts (cloud
    // metadata endpoints), single-label hosts (localhost, bare internal
    // service names), *.localhost, and explicit ports (internal HTTPS on
    // odd ports). Real atproto identities are public multi-label domains
    // on 443. Dev setups (did:web:localhost%3A8443) opt in explicitly.
    // This is a string-level screen only: where a public-looking domain
    // actually RESOLVES is checked again at fetch time by
    // [[DidResolver.HttpFetcher]]'s private-range guard.
    allowPrivateHosts: Boolean = false,
    // misses ARE negatively cached, briefly: each miss costs up to three
    // directory round-trips plus backoff ON THE SERVING THREAD, so
    // uncached misses hand an attacker with unresolvable iss values a
    // 4-thread-pool amplification lever. Short TTL keeps the documented
    // property that a key published moments later is picked up quickly.
    negativeTtlMillis: Long = 30L * 1000) extends Auth.KeyResolver {

  private val mapper = new ObjectMapper()
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()
  private val misses = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  /** Bound the cache: a public endpoint resolves every requester's DID,
    * so an unbounded map is a memory-exhaustion vector (millions of valid
    * DIDs exist). Expired entries go first; if still over the cap after
    * that, oldest entries go — O(n) on the rare compaction, zero cost on
    * the hit path. */
  private def compact(now: Long): Unit =
    if (cache.size() > maxEntries) cache.synchronized {
      if (cache.size() > maxEntries) {
        val it = cache.entrySet().iterator()
        while (it.hasNext) if (now - it.next().getValue._2 >= ttlMillis) it.remove()
        if (cache.size() > maxEntries) {
          import scala.jdk.CollectionConverters._
          cache.entrySet().asScala.toSeq.sortBy(_.getValue._2)
            .take(cache.size() - maxEntries).foreach(e => cache.remove(e.getKey))
        }
      }
    }

  /** did → document URL; None for unsupported methods. */
  def documentUrl(did: String): Option[String] = did.split(':').toList match {
    case "did" :: "plc" :: id :: Nil if id.nonEmpty =>
      Some(s"${plcUrl.stripSuffix("/")}/did:plc:$id")
    case "did" :: "web" :: host :: rest if host.nonEmpty =>
      // did:web percent-encodes a port's colon; path segments join with /.
      // iss is attacker-supplied at the auth edge, so the decoded host must
      // be a bare authority (no '/', '@', '?', '#' — a %2F in the DID would
      // otherwise bind a trusted domain's identity to an attacker path) and
      // each path segment must stay inside the did:web segment charset.
      // a malformed percent-escape (bare '%', '%zz') throws from decode —
      // that is an unresolvable DID (None → 401), never an exception that
      // would break resolveKey's no-throw contract and surface as a 400
      val h = try java.net.URLDecoder.decode(host, "UTF-8")
        catch { case _: IllegalArgumentException => return None }
      // Every dot-separated host label must be non-empty: a host that IS
      // a dot-segment (did:web:.. → https://../did.json) or contains an
      // empty label would re-open the normalization aliasing the segment
      // grammar below closes off.
      val hostOk = h.matches("[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)*(:[0-9]+)?")
      // Segment grammar: did:web idchars with '%' valid ONLY as a
      // well-formed pct-triplet (a bare '%' would reach URI.create), and
      // no '.'/'..' segments — literal or pct-encoded — so distinct DIDs
      // cannot alias to the same normalized document URL on a host that
      // resolves dot-segments (did:web:example.com:x:.. ≡ did:web:example.com).
      val restOk = rest.forall { s =>
        s.matches("(?:[A-Za-z0-9._-]|%[0-9A-Fa-f]{2})+") && {
          val dec = java.net.URLDecoder.decode(s, "UTF-8")
          dec != "." && dec != ".." && !dec.exists(c => c == '/' || c == '\\')
        }
      }
      val hostPublic = allowPrivateHosts || {
        val bare = h.takeWhile(_ != ':').toLowerCase
        !h.contains(':') &&                       // no explicit port
        bare.contains('.') &&                     // no single-label hosts
        !bare.endsWith(".localhost") &&
        !bare.matches("\\d+(\\.\\d+){3}")        // no IPv4 literals
      }
      if (!hostOk || !restOk || !hostPublic) None
      else if (rest.isEmpty) Some(s"https://$h/.well-known/did.json")
      else Some(s"https://$h/${rest.mkString("/")}/did.json")
    case _ => None
  }

  override def resolveKey(did: String): Option[Array[Byte]] = {
    val now = nowMillis()
    Option(cache.get(did)).filter(now - _._2 < ttlMillis) match {
      case Some((key, _)) => Some(key)
      case None if Option(misses.get(did)).exists(now - _ < negativeTtlMillis) =>
        None // recent miss: don't re-pay the fetch+backoff train per request
      case None =>
        val fresh = for {
          url <- documentUrl(did)
          body <- fetcher.fetch(url)
          key <- DidResolver.atprotoKey(mapper, body, did)
        } yield key
        fresh match {
          case Some(k) =>
            cache.put(did, (k, now)); misses.remove(did); compact(now)
          case None =>
            misses.put(did, now)
            // bound the miss map like the hit cache: random unresolvable
            // DIDs are the attacker-controlled key space here
            if (misses.size() > maxEntries) misses.synchronized {
              val it = misses.entrySet().iterator()
              while (it.hasNext)
                if (now - it.next().getValue >= negativeTtlMillis) it.remove()
              if (misses.size() > maxEntries) misses.clear()
            }
        }
        fresh
    }
  }
}

object DidResolver {

  /** GET url → body on 2xx; None on error (resolution failure ≠ crash —
    * the caller turns it into 401, auth.ts's behavior when the DID has no
    * resolvable key). */
  trait Fetcher { def fetch(url: String): Option[String] }

  final class HttpFetcher(retries: Int = 2, backoffMillis: Long = 100,
      connectTimeoutMillis: Long = 5000, requestTimeoutMillis: Long = 10000,
      // DID documents are ~1-2 KB; the host is attacker-steerable via
      // iss, so an uncapped ofString() accumulation was a one-request
      // heap-exhaustion vector
      maxBodyBytes: Int = 64 * 1024,
      // Defense in depth behind documentUrl's host-STRING screen: that
      // screen can't see where a public-looking multi-label domain
      // actually RESOLVES (attacker-controlled DNS, nip.io-style
      // wildcards), so the fetcher resolves the host itself and refuses
      // private/loopback/link-local/ULA/CGNAT targets before connecting.
      // Residual: the check and the client's own connect are two DNS
      // lookups (rebinding TOCTOU) — the JVM's positive DNS cache
      // (networkaddress.cache.ttl, default ~30 s) narrows but does not
      // close it; fully closing it means pinning the checked address,
      // which the JDK client can't do per-request for HTTPS (SNI/Host
      // would diverge). Deployments needing a hard guarantee should
      // route fetches through an egress proxy. `resolve` is injectable
      // so specs exercise the guard without real DNS.
      guardPrivateRanges: Boolean = true,
      resolve: String => Array[java.net.InetAddress] =
        java.net.InetAddress.getAllByName) extends Fetcher {
    // redirects are followed MANUALLY (guarded per hop, below): the
    // JDK's Redirect.NORMAL re-fetches a 3xx Location with no hook to
    // re-run the private-range guard, so a public host could 302 the
    // fetch straight into the deployment network — the exact SSRF the
    // guard exists to block. NORMAL's one hard rule (never follow a
    // secure origin to an insecure one) is preserved in the manual walk.
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMillis))
      .followRedirects(java.net.http.HttpClient.Redirect.NEVER).build()
    private val MaxRedirects = 3
    /** Bounded retry on TRANSIENT failures only (connect reset, timeout —
      * i.e. IOException, which HttpTimeoutException extends): a directory
      * blip must not surface as a 401 for a valid token. Permanent
      * failures — a malformed URL (IllegalArgumentException from
      * URI.create), any other non-IO defect — return None immediately:
      * backing off cannot fix them. A non-2xx response is authoritative
      * (the DID genuinely isn't there) and is NOT retried. An interrupt
      * during backoff restores the thread's interrupt status and returns
      * None, keeping the no-throw Option contract. Misses are uncached
      * upstream, so the cost of a false None is one extra fetch per
      * request until the directory recovers. */
    override def fetch(url: String): Option[String] = {
      var attempt = 0
      while (true) {
        try {
          // explicit timeouts end-to-end: the JDK client defaults BOTH
          // connect and request timeouts to infinite, so a stalled host
          // would otherwise park a serving thread forever (the retry
          // comment's HttpTimeoutException could never actually fire).
          // The body is streamed with a byte cap AND a wall-clock
          // deadline — the request timeout only covers up to response
          // headers, so a slow-dripped body needs its own bound.
          var uri = java.net.URI.create(url)
          var hops = 0
          while (true) {
            if (guardPrivateRanges) {
              val host = uri.getHost
              if (host == null) return None
              // UnknownHostException is an IOException: a transient DNS
              // blip rides the bounded retry like any other connect failure
              if (resolve(host).exists(DidResolver.isPrivateAddress))
                return None
            }
            val req = java.net.http.HttpRequest.newBuilder(uri)
              .timeout(java.time.Duration.ofMillis(requestTimeoutMillis)).GET().build()
            val resp = client.send(req,
              java.net.http.HttpResponse.BodyHandlers.ofInputStream())
            val in = resp.body()
            try {
              val status = resp.statusCode()
              if (status / 100 == 3 && hops < MaxRedirects) {
                // guarded manual follow: the next hop's host re-enters the
                // private-range check at the top of this loop — a 3xx into
                // the deployment network dies exactly like a direct fetch
                val loc = resp.headers().firstValue("location")
                if (loc.isEmpty) return None
                val next = uri.resolve(loc.get.trim)
                val scheme = Option(next.getScheme).map(_.toLowerCase).getOrElse("")
                if (scheme != "http" && scheme != "https") return None
                if ("https".equalsIgnoreCase(uri.getScheme) && scheme != "https")
                  return None // never follow a secure origin down to http
                  // (case-insensitive on the current hop too: a Location of
                  // 'HTTPS://…' must still pin later hops to https, matching
                  // Redirect.NORMAL's case-insensitive rule)
                uri = next
                hops += 1
              } else if (status / 100 != 2) {
                return None // 3xx past the hop cap is a miss too
              } else {
                val deadline = System.currentTimeMillis() + requestTimeoutMillis
                val buf = new java.io.ByteArrayOutputStream()
                val chunk = new Array[Byte](8192)
                var n = in.read(chunk)
                while (n >= 0) {
                  buf.write(chunk, 0, n)
                  if (buf.size() > maxBodyBytes || System.currentTimeMillis() > deadline)
                    return None // oversized or slow-dripped: not a DID document
                  n = in.read(chunk)
                }
                return Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
              }
            } finally in.close()
          }
        } catch {
          case _: java.io.IOException if attempt < retries =>
            attempt += 1
            try Thread.sleep(backoffMillis * attempt)
            catch { case _: InterruptedException =>
              Thread.currentThread().interrupt(); return None }
          case _: InterruptedException =>
            Thread.currentThread().interrupt(); return None
          case _: Exception => return None
        }
      }
      None // unreachable
    }
  }

  /** Address ranges that only make sense INSIDE a deployment network —
    * the resolve-time complement of documentUrl's host-string screen.
    * IPv4: loopback/link-local/RFC1918 (the InetAddress predicates),
    * plus 0/8, CGNAT 100.64/10, 192.0.0.0/24, 198.18/15, 240/4.
    * IPv6: loopback/link-local via the predicates, ULA fc00::/7;
    * IPv4-mapped addresses surface as Inet4Address and take the v4 path. */
  private[serving] def isPrivateAddress(a: java.net.InetAddress): Boolean =
    a.isAnyLocalAddress || a.isLoopbackAddress || a.isLinkLocalAddress ||
      a.isSiteLocalAddress || a.isMulticastAddress || (a match {
        case v4: java.net.Inet4Address =>
          val b = v4.getAddress.map(_ & 0xff)
          b(0) == 0 ||
            (b(0) == 100 && (b(1) & 0xc0) == 64) ||
            (b(0) == 192 && b(1) == 0 && b(2) == 0) ||
            (b(0) == 198 && (b(1) & 0xfe) == 18) ||
            b(0) >= 240
        case v6: java.net.Inet6Address =>
          (v6.getAddress()(0) & 0xfe) == 0xfc
        case _ => false
      })

  private val Base58Alphabet = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"

  /** base58btc decode (the 'z' multibase body). None on a non-alphabet
    * character. */
  def base58Decode(s: String): Option[Array[Byte]] = {
    var acc = BigInt(0)
    for (c <- s) {
      val i = Base58Alphabet.indexOf(c)
      if (i < 0) return None
      acc = acc * 58 + i
    }
    val body = acc.toByteArray.dropWhile(_ == 0)
    Some(Array.fill[Byte](s.takeWhile(_ == '1').length)(0) ++ body)
  }

  def base58Encode(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var acc = BigInt(1, bytes)
    while (acc > 0) { sb.append(Base58Alphabet((acc % 58).toInt)); acc /= 58 }
    bytes.takeWhile(_ == 0).foreach(_ => sb.append('1'))
    sb.reverseInPlace().toString
  }

  /** Multibase+multicodec → raw SEC 1 key bytes. secp256k1-pub's varint
    * tag is 0xe7 0x01; untagged 33/65-byte points pass through (legacy
    * 2019-suite documents publish the bare compressed point). */
  def decodeMultibaseKey(multibase: String): Option[Array[Byte]] =
    if (!multibase.startsWith("z")) None
    else base58Decode(multibase.drop(1)).flatMap { raw =>
      if (raw.length >= 2 && (raw(0) & 0xff) == 0xe7 && (raw(1) & 0xff) == 0x01)
        Some(raw.drop(2))
      else if (raw.length == 33 || raw.length == 65) Some(raw)
      else None
    }

  /** The `#atproto` verification key of a DID document, as raw point
    * bytes. Accepts both absolute (`did…#atproto`) and relative
    * (`#atproto`) method ids — both appear in the wild. */
  private[serving] def atprotoKey(mapper: ObjectMapper, documentJson: String,
      did: String): Option[Array[Byte]] =
    try {
      val doc = mapper.readTree(documentJson)
      val methods = Option(doc.get("verificationMethod")).toSeq
        .flatMap(m => (0 until m.size()).map(m.get))
      methods.find { m =>
        val id = Option(m.get("id")).map(_.asText()).getOrElse("")
        id == "#atproto" || id == s"$did#atproto"
      }.flatMap(m => Option(m.get("publicKeyMultibase")).map(_.asText()))
        .flatMap(decodeMultibaseKey)
    } catch { case _: Exception => None }

  /** Encode a compressed secp256k1 point as the multibase string a DID
    * document publishes — fixtures and [[FeedServer]]'s own document. */
  def encodeMultibaseKey(compressedPoint: Array[Byte]): String =
    "z" + base58Encode(Array(0xe7.toByte, 0x01.toByte) ++ compressedPoint)
}
