package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper

/** Feed-generator publish/delete ops
  * (/root/reference/scripts/publishFeedGen.ts:6-83 and
  * deleteFeedGenerator.ts:4-43): log in for a session, optionally upload
  * the avatar blob, then put/delete the `app.bsky.feed.generator` record
  * in the publisher's repo.
  *
  * The XRPC calls go through a [[Transport]] — [[HttpTransport]] is the
  * real JDK-HttpClient implementation (tests point it at a local PDS
  * stub; a deployment points it at its PDS). Record construction,
  * validation, DID derivation, and the auth flow are all here and fully
  * testable offline.
  */
object FeedGenOps {

  trait Transport {
    /** POST an XRPC procedure; returns the response body (JSON). */
    def post(nsid: String, authJwt: Option[String], contentType: String,
        body: Array[Byte]): String
  }

  final class HttpTransport(baseUrl: String) extends Transport {
    private val client = java.net.http.HttpClient.newHttpClient()
    override def post(nsid: String, authJwt: Option[String], contentType: String,
        body: Array[Byte]): String = {
      val b = java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"$baseUrl/xrpc/$nsid"))
        .header("Content-Type", contentType)
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      authJwt.foreach(t => b.header("Authorization", s"Bearer $t"))
      val resp = client.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"xrpc $nsid failed: ${resp.statusCode()} ${resp.body()}")
      resp.body()
    }
  }

  private val mapper = new ObjectMapper()

  /** publishFeedGen.ts:42-45: explicit service DID, else did:web of the
    * hostname; one of the two must be configured. */
  def feedGenDid(serviceDid: Option[String], hostname: Option[String]): String =
    serviceDid.orElse(hostname.map(h => s"did:web:$h")).getOrElse(
      throw new IllegalArgumentException("Please provide a hostname"))

  /** publishFeedGen.ts:53-60: only png/jpeg avatars are accepted. */
  def avatarEncoding(path: String): String =
    if (path.endsWith("png")) "image/png"
    else if (path.endsWith("jpg") || path.endsWith("jpeg")) "image/jpeg"
    else throw new IllegalArgumentException("expected png or jpeg")

  private def createSession(t: Transport, handle: String, password: String)
      : (String, String) = {
    val body = mapper.createObjectNode()
    body.put("identifier", handle)
    body.put("password", password)
    val resp = mapper.readTree(t.post("com.atproto.server.createSession", None,
      "application/json", mapper.writeValueAsBytes(body)))
    (resp.get("did").asText(), resp.get("accessJwt").asText())
  }

  /** Publish (upsert) the feed-generator record; returns its at-uri.
    * `nowIso` is injectable for deterministic tests. */
  def publish(t: Transport, handle: String, password: String, recordName: String,
      displayName: String, description: String = "",
      avatar: Option[(String, Array[Byte])] = None,
      serviceDid: Option[String] = None, hostname: Option[String] = None,
      nowIso: String = java.time.Instant.now().toString): String = {
    if (!recordName.matches("^[a-z0-9-]{1,15}$"))
      throw new IllegalArgumentException(s"invalid recordName: $recordName")
    val did = feedGenDid(serviceDid, hostname)
    val (repoDid, jwt) = createSession(t, handle, password)

    val avatarRef = avatar.map { case (path, bytes) =>
      val resp = mapper.readTree(t.post("com.atproto.repo.uploadBlob", Some(jwt),
        avatarEncoding(path), bytes))
      resp.get("blob")
    }

    val record = mapper.createObjectNode()
    record.put("did", did)
    record.put("displayName", displayName)
    // publishFeedGen.ts:29: the env file smuggles newlines as ¥n
    record.put("description", description.replace("¥n", "\n"))
    avatarRef.foreach(a => record.replace("avatar", a))
    record.put("createdAt", nowIso)

    val put = mapper.createObjectNode()
    put.put("repo", repoDid)
    put.put("collection", "app.bsky.feed.generator")
    put.put("rkey", recordName)
    put.replace("record", record)
    t.post("com.atproto.repo.putRecord", Some(jwt), "application/json",
      mapper.writeValueAsBytes(put))
    s"at://$repoDid/app.bsky.feed.generator/$recordName"
  }

  /** Delete the feed-generator record (deleteFeedGenerator.ts:32-41). */
  def delete(t: Transport, handle: String, password: String, recordName: String): String = {
    val (repoDid, jwt) = createSession(t, handle, password)
    val del = mapper.createObjectNode()
    del.put("repo", repoDid)
    del.put("collection", "app.bsky.feed.generator")
    del.put("rkey", recordName)
    t.post("com.atproto.repo.deleteRecord", Some(jwt), "application/json",
      mapper.writeValueAsBytes(del))
    s"at://$repoDid/app.bsky.feed.generator/$recordName"
  }
}
