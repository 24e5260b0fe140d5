package graft.serving

/** Minimal secp256k1 ECDSA — the curve math behind atproto's ES256K
  * service JWTs (/root/reference/src/auth.ts:5-18 verifies via @atproto's
  * verifyJwt; the stock JDK has no secp256k1 provider, so the group law
  * is implemented here directly from the public SEC 2 parameters).
  *
  * Affine double-and-add with BigInteger modular inverses: a verify costs
  * ~2×256 point ops ≈ single-digit milliseconds — the serving plane
  * verifies one token per request, not per row, so clarity wins over a
  * Jacobian ladder. Not constant-time; VERIFICATION handles only public
  * inputs, and the signer here is fixture/ops-grade (deterministic k from
  * SHA-256(priv ‖ digest), low-s normalized like the atproto wire).
  */
object Secp256k1 {

  // SEC 2 "Recommended Elliptic Curve Domain Parameters", curve secp256k1
  val P: BigInt = BigInt("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F", 16)
  val N: BigInt = BigInt("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141", 16)
  val G: Point = Point(
    BigInt("79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798", 16),
    BigInt("483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8", 16))

  /** Affine point; the identity is represented as `None` in the group ops. */
  final case class Point(x: BigInt, y: BigInt)

  private def modP(a: BigInt): BigInt = { val m = a.mod(P); m }

  private def add(p: Option[Point], q: Option[Point]): Option[Point] = (p, q) match {
    case (None, _) => q
    case (_, None) => p
    case (Some(a), Some(b)) =>
      if (a.x == b.x && modP(a.y + b.y) == 0) None // inverse points
      else {
        val lambda =
          if (a == b) modP(3 * a.x * a.x) * (2 * a.y).modInverse(P)
          else modP(b.y - a.y) * modP(b.x - a.x).modInverse(P)
        val x3 = modP(lambda * lambda - a.x - b.x)
        Some(Point(x3, modP(lambda * (a.x - x3) - a.y)))
      }
  }

  /** Scalar multiple via double-and-add (MSB first). */
  def mul(p: Point, k: BigInt): Option[Point] = {
    var acc: Option[Point] = None
    var i = k.bitLength - 1
    while (i >= 0) {
      acc = add(acc, acc)
      if (k.testBit(i)) acc = add(acc, Some(p))
      i -= 1
    }
    acc
  }

  /** SEC 1 point decode: 33-byte compressed (02/03 ‖ x, y from the curve
    * equation — p ≡ 3 mod 4 so √a = a^((p+1)/4)) or 65-byte uncompressed
    * (04 ‖ x ‖ y). None for malformed or off-curve bytes. */
  def decodePoint(bytes: Array[Byte]): Option[Point] = bytes match {
    case b if b.length == 33 && (b(0) == 0x02 || b(0) == 0x03) =>
      val x = BigInt(1, b.drop(1))
      if (x >= P) return None
      val rhs = modP(x * x * x + 7)
      val y = rhs.modPow((P + 1) / 4, P)
      if (modP(y * y) != rhs) None // x³+7 is a non-residue: not on the curve
      else {
        val wantOdd = b(0) == 0x03
        Some(Point(x, if (y.testBit(0) == wantOdd) y else P - y))
      }
    case b if b.length == 65 && b(0) == 0x04 =>
      val x = BigInt(1, b.slice(1, 33))
      val y = BigInt(1, b.slice(33, 65))
      if (x < P && y < P && modP(y * y) == modP(x * x * x + 7)) Some(Point(x, y)) else None
    case _ => None
  }

  def compress(p: Point): Array[Byte] = {
    val x = p.x.toByteArray.dropWhile(_ == 0)
    val pad = Array.fill[Byte](32 - x.length)(0)
    (if (p.y.testBit(0)) 0x03.toByte else 0x02.toByte) +: (pad ++ x)
  }

  /** ECDSA verify (SEC 1 §4.1.4) over a 32-byte message digest. Accepts
    * both s and n−s (the JOSE wire may or may not be low-s normalized). */
  def verify(digest: Array[Byte], r: BigInt, s: BigInt, pub: Point): Boolean = {
    if (r <= 0 || r >= N || s <= 0 || s >= N) return false
    val z = BigInt(1, digest.take(32))
    val w = s.modInverse(N)
    val u1 = (z * w).mod(N)
    val u2 = (r * w).mod(N)
    add(mul(G, u1), mul(pub, u2)) match {
      case Some(pt) => pt.x.mod(N) == r
      case None => false
    }
  }

  /** Deterministic fixture-grade signer: k = SHA-256(priv ‖ digest) mod n
    * (re-hashed until nonzero), s low-s normalized. Tests and ops dry-runs
    * only — production tokens come from the PDS, never from this engine. */
  def sign(digest: Array[Byte], priv: BigInt): (BigInt, BigInt) = {
    val z = BigInt(1, digest.take(32))
    var seed = priv.toByteArray ++ digest
    var k = BigInt(0)
    while (k == 0 || k >= N || mul(G, k).isEmpty) {
      seed = java.security.MessageDigest.getInstance("SHA-256").digest(seed)
      k = BigInt(1, seed).mod(N)
    }
    val r = mul(G, k).get.x.mod(N)
    require(r != 0, "degenerate nonce")
    val s = (k.modInverse(N) * (z + r * priv)).mod(N)
    require(s != 0, "degenerate signature")
    (r, if (s > N / 2) N - s else s)
  }
}
