package graft.sources

/** Minimal DAG-CBOR codec, CARv1 reader, and CIDv1 rendering — all public
  * wire formats (RFC 8949; the IPLD DAG-CBOR, CARv1 and CID/multibase
  * specs). This is the real binary path behind the firehose
  * (/root/reference/src/util/subscription.ts:76-122 reads the commit's CAR
  * archive and CBOR-decodes each op's record block); the decoder is
  * deliberately restricted to what DAG-CBOR permits — definite lengths
  * only, text map keys, tag 42 for CID links.
  *
  * Driver/executor-agnostic plain Scala: [[Firehose.decodeCborFrames]]
  * runs it inside `mapPartitions` (a byte codec is per-row imperative work
  * — the same honest boundary as the multimodal codecs, not expressible as
  * a Catalyst expression).
  */
object Cbor {

  sealed trait Value
  final case class CInt(v: Long) extends Value
  final case class CBytes(v: Array[Byte]) extends Value
  final case class CText(v: String) extends Value
  final case class CArr(v: Vector[Value]) extends Value
  final case class CMap(v: Vector[(String, Value)]) extends Value {
    def get(key: String): Option[Value] = v.collectFirst { case (`key`, x) => x }
  }
  final case class CBool(v: Boolean) extends Value
  case object CNull extends Value
  final case class CDouble(v: Double) extends Value
  final case class CTag(tag: Long, v: Value) extends Value

  /** Streaming reader over one byte array; `decode()` consumes one item. */
  final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def remaining: Int = buf.length - pos
    private def u8(): Int = {
      if (pos >= buf.length) throw new IllegalArgumentException("truncated CBOR")
      val b = buf(pos) & 0xff; pos += 1; b
    }
    private def take(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > buf.length) throw new IllegalArgumentException("truncated CBOR")
      val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a
    }
    private def uintArg(info: Int): Long = info match {
      case n if n < 24 => n
      case 24 => u8()
      case 25 => (u8() << 8) | u8()
      case 26 => (u8().toLong << 24) | (u8() << 16) | (u8() << 8) | u8()
      case 27 => (0 until 8).foldLeft(0L)((acc, _) => (acc << 8) | u8())
      case other =>
        throw new IllegalArgumentException(s"indefinite/reserved length info=$other not allowed in DAG-CBOR")
    }
    /** A length/count operand: 64-bit on the wire, but nothing inside one
      * frame can exceed the frame's own byte length — a value past that
      * (or past Int range) is a crafted/corrupt header and must REJECT,
      * not truncate via .toInt into a wrong-but-accepted parse (e.g. an
      * 8-byte length 0x1_0000_0005 truncating to 5 and re-synchronizing
      * the reader at attacker-chosen offsets, or a count whose .toInt
      * goes negative making Vector.fill return EMPTY and silently skip
      * elements). */
    private def lenArg(info: Int): Int = {
      val v = uintArg(info)
      if (v < 0 || v > buf.length)
        throw new IllegalArgumentException(
          s"CBOR length/count $v exceeds frame size ${buf.length}")
      v.toInt
    }
    /** Advance past one value WITHOUT materializing it — the hot-path
      * primitive [[mapValueOf]] uses to extract one field of a frame whose
      * dominant bytes (a commit's `blocks` CAR archive) would otherwise be
      * copied per frame just to be discarded. */
    def skipValue(): Unit = {
      val ib = u8()
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 | 1 => uintArg(info): Unit
        case 2 | 3 =>
          val n = lenArg(info)
          if (pos + n > buf.length) throw new IllegalArgumentException("truncated CBOR")
          pos += n
        case 4 => val n = lenArg(info); var i = 0; while (i < n) { skipValue(); i += 1 }
        case 5 =>
          val n = lenArg(info); var i = 0
          while (i < n) { skipValue(); skipValue(); i += 1 }
        case 6 => uintArg(info); skipValue()
        case 7 => info match {
          case 20 | 21 | 22 => ()
          case 27 => uintArg(27): Unit
          case other =>
            throw new IllegalArgumentException(s"unsupported simple value $other")
        }
      }
    }

    /** Decode ONLY `key`'s value from a map at the cursor, skipping every
      * other entry unmaterialized; None when the next item is not a map or
      * lacks the key. */
    def mapValueOf(key: String): Option[Value] = {
      val ib = u8()
      if ((ib >> 5) != 5) return None
      val n = lenArg(ib & 0x1f)
      var found: Option[Value] = None
      var i = 0
      while (i < n) {
        decode() match {
          case CText(k) if found.isEmpty && k == key => found = Some(decode())
          case _: CText => skipValue()
          case other => throw new IllegalArgumentException(s"non-text map key $other")
        }
        i += 1
      }
      found
    }

    def decode(): Value = {
      val ib = u8()
      val major = ib >> 5
      val info = ib & 0x1f
      major match {
        case 0 => CInt(uintArg(info))
        case 1 => CInt(-1L - uintArg(info))
        case 2 => CBytes(take(lenArg(info)))
        case 3 => CText(new String(take(lenArg(info)), java.nio.charset.StandardCharsets.UTF_8))
        case 4 => CArr(Vector.fill(lenArg(info))(decode()))
        case 5 => CMap(Vector.fill(lenArg(info)) {
          decode() match {
            case CText(k) => k -> decode()
            case other => throw new IllegalArgumentException(s"non-text map key $other")
          }
        })
        case 6 => CTag(uintArg(info), decode())
        case 7 => info match {
          case 20 => CBool(false)
          case 21 => CBool(true)
          case 22 => CNull
          case 27 => CDouble(java.lang.Double.longBitsToDouble(uintArg(27)))
          case other => throw new IllegalArgumentException(s"unsupported simple value $other")
        }
      }
    }
  }

  /** Definite-length encoder — fixtures and tests build real wire bytes
    * with it (DAG-CBOR's subset; no indefinite forms, no half floats). */
  object Writer {
    def encode(v: Value): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      write(v, out)
      out.toByteArray
    }
    private def head(major: Int, n: Long, out: java.io.ByteArrayOutputStream): Unit = {
      require(n >= 0, "negative length")
      if (n < 24) out.write((major << 5) | n.toInt)
      else if (n < 256) { out.write((major << 5) | 24); out.write(n.toInt) }
      else if (n < 65536) { out.write((major << 5) | 25); out.write((n >> 8).toInt); out.write((n & 0xff).toInt) }
      else if (n < (1L << 32)) {
        out.write((major << 5) | 26)
        (3 to 0 by -1).foreach(i => out.write(((n >> (8 * i)) & 0xff).toInt))
      } else {
        out.write((major << 5) | 27)
        (7 to 0 by -1).foreach(i => out.write(((n >> (8 * i)) & 0xff).toInt))
      }
    }
    private def write(v: Value, out: java.io.ByteArrayOutputStream): Unit = v match {
      case CInt(n) if n >= 0 => head(0, n, out)
      case CInt(n) => head(1, -1L - n, out)
      case CBytes(b) => head(2, b.length, out); out.write(b, 0, b.length)
      case CText(s) =>
        val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        head(3, b.length, out); out.write(b, 0, b.length)
      case CArr(xs) => head(4, xs.length, out); xs.foreach(write(_, out))
      case CMap(kvs) => head(5, kvs.length, out); kvs.foreach { case (k, x) => write(CText(k), out); write(x, out) }
      case CTag(t, x) => head(6, t, out); write(x, out)
      case CBool(false) => out.write(0xf4)
      case CBool(true) => out.write(0xf5)
      case CNull => out.write(0xf6)
      case CDouble(d) =>
        out.write(0xfb)
        val bits = java.lang.Double.doubleToLongBits(d)
        (7 to 0 by -1).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    }
  }

  /** Unsigned LEB128 varint (the CAR framing integer). */
  object VarInt {
    def read(buf: Array[Byte], start: Int): (Long, Int) = {
      var x = 0L; var shift = 0; var i = start
      while (true) {
        if (i >= buf.length) throw new IllegalArgumentException("truncated varint")
        val b = buf(i) & 0xff
        x |= (b & 0x7fL) << shift
        i += 1
        if ((b & 0x80) == 0) return (x, i)
        shift += 7
      }
      throw new IllegalStateException("unreachable")
    }
    def write(n: Long): Array[Byte] = {
      var x = n
      val out = new java.io.ByteArrayOutputStream()
      while ((x & ~0x7fL) != 0) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt)
      out.toByteArray
    }
  }

  /** RFC 4648 base32, lowercase, no padding — the multibase 'b' alphabet
    * CIDv1 strings use. */
  def base32Lower(bytes: Array[Byte]): String = {
    val alpha = "abcdefghijklmnopqrstuvwxyz234567"
    val sb = new StringBuilder
    var buffer = 0L
    var bits = 0
    bytes.foreach { b =>
      buffer = (buffer << 8) | (b & 0xff)
      bits += 8
      while (bits >= 5) { sb.append(alpha(((buffer >> (bits - 5)) & 31).toInt)); bits -= 5 }
    }
    if (bits > 0) sb.append(alpha(((buffer << (5 - bits)) & 31).toInt))
    sb.toString
  }

  /** CIDv1 string: multibase prefix 'b' + base32(version ++ codec ++ multihash). */
  def cidToString(cidBytes: Array[Byte]): String = "b" + base32Lower(cidBytes)

  /** A CARv1 archive: varint-framed header block, then varint-framed
    * (CID ++ data) blocks; returns data keyed by CID string, the map
    * `getOpsByType` probes per op (subscription.ts:92-96). */
  def readCar(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val (headerLen, afterHeaderLen) = VarInt.read(bytes, 0)
    var pos = afterHeaderLen + headerLen.toInt // header CBOR {version, roots} — not needed here
    val blocks = Map.newBuilder[String, Array[Byte]]
    while (pos < bytes.length) {
      val (blockLen, dataStart) = VarInt.read(bytes, pos)
      val blockEnd = dataStart + blockLen.toInt
      if (blockEnd > bytes.length) throw new IllegalArgumentException("truncated CAR block")
      // CID v1 inside the block: version varint, codec varint, multihash
      // (hash code varint, digest length varint, digest bytes)
      val (_, p1) = VarInt.read(bytes, dataStart) // version (1)
      val (_, p2) = VarInt.read(bytes, p1) // codec (0x71 dag-cbor)
      val (_, p3) = VarInt.read(bytes, p2) // multihash code
      val (digestLen, p4) = VarInt.read(bytes, p3)
      val cidEnd = p4 + digestLen.toInt
      val cid = java.util.Arrays.copyOfRange(bytes, dataStart, cidEnd)
      val data = java.util.Arrays.copyOfRange(bytes, cidEnd, blockEnd)
      blocks += cidToString(cid) -> data
      pos = blockEnd
    }
    blocks.result()
  }

  /** Render a decoded CBOR value as JSON text. CID links (tag 42 around a
    * multibase-prefixed byte string) become their CIDv1 string — the same
    * surface `cid.toString()` gives the reference; other byte strings
    * become base64 (they do not occur in the routed record shapes). */
  def toJson(v: Value): String = v match {
    case CInt(n) => n.toString
    case CDouble(d) => d.toString
    case CBool(b) => b.toString
    case CNull => "null"
    case CText(s) => jsonQuote(s)
    case CBytes(b) => jsonQuote(java.util.Base64.getEncoder.encodeToString(b))
    case CTag(42, CBytes(b)) =>
      // DAG-CBOR CID link: identity-multibase 0x00 prefix byte, then the CID
      jsonQuote(cidToString(b.drop(1)))
    case CTag(_, inner) => toJson(inner)
    case CArr(xs) => xs.map(toJson).mkString("[", ",", "]")
    case CMap(kvs) => kvs.map { case (k, x) => s"${jsonQuote(k)}:${toJson(x)}" }.mkString("{", ",", "}")
  }

  private[sources] def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }
}
