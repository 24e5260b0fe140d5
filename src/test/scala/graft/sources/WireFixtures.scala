package graft.sources

import graft.sources.Cbor._

/** Shared wire-format builders for the firehose specs: real DAG-CBOR
  * commit frames whose `blocks` field is a CARv1 archive with CIDv1
  * (dag-cbor, sha2-256) block addresses — the exact byte shapes
  * `subscribeRepos` serves. */
object WireFixtures {

  def cidBytes(data: Array[Byte]): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(data)
    Array[Byte](0x01, 0x71.toByte, 0x12, 32) ++ digest
  }

  def cidLink(cid: Array[Byte]): Value = CTag(42, CBytes(0x00.toByte +: cid))

  def car(blocks: Seq[Array[Byte]]): Array[Byte] = {
    val header = Writer.encode(CMap(Vector(
      "version" -> CInt(1), "roots" -> CArr(Vector.empty))))
    val out = new java.io.ByteArrayOutputStream()
    out.write(VarInt.write(header.length)); out.write(header)
    blocks.foreach { data =>
      val cid = cidBytes(data)
      out.write(VarInt.write(cid.length + data.length)); out.write(cid); out.write(data)
    }
    out.toByteArray
  }

  def postRecord(text: String): Array[Byte] = Writer.encode(CMap(Vector(
    "$type" -> CText("app.bsky.feed.post"),
    "text" -> CText(text),
    "createdAt" -> CText("2024-03-01 10:00:00"),
    "langs" -> CArr(Vector(CText("en"))))))

  /** A complete binary `#commit` frame: one create op for a post. */
  def commitFrame(seq: Long, text: String): Array[Byte] = {
    val rec = postRecord(text)
    val header = Writer.encode(CMap(Vector("op" -> CInt(1), "t" -> CText("#commit"))))
    val body = Writer.encode(CMap(Vector(
      "seq" -> CInt(seq), "repo" -> CText(s"did:plc:u$seq"),
      "ops" -> CArr(Vector(CMap(Vector(
        "action" -> CText("create"),
        "path" -> CText(s"app.bsky.feed.post/3k$seq"),
        "cid" -> cidLink(cidBytes(rec)))))),
      "blocks" -> CBytes(car(Seq(rec))))))
    header ++ body
  }

  def commitFrame(seq: Long): Array[Byte] = commitFrame(seq, s"post number $seq")
}
