package graft.sources

import graft.SparkSpec
import graft.model.Condition
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

class FirehoseSpec extends SparkSpec {

  private def raw(lines: String*) = {
    val s = spark
    import s.implicits._
    lines.toDF("value")
  }

  private val postCreate =
    """{"seq":1,"action":"create","collection":"app.bsky.feed.post","uri":"at://a/1","cid":"c1",
      |"author":"did:plc:x","record":{"text":"spark rocks","createdAt":"2024-03-01 10:00:00","langs":["en"]}}"""
      .stripMargin.replace("\n", "")
  private val likeCreate =
    """{"seq":2,"action":"create","collection":"app.bsky.feed.like","uri":"at://a/2","cid":"c2","author":"did:plc:y"}"""
  private val postDelete =
    """{"seq":3,"action":"delete","collection":"app.bsky.feed.post","uri":"at://a/1","cid":"","author":"did:plc:x"}"""
  private val corrupt = """{"seq": not json at all"""
  private val unknownCollection =
    """{"seq":4,"action":"create","collection":"com.example.other","uri":"at://a/9","cid":"c9","author":"did:plc:z"}"""

  test("decode keeps valid ops, drops corrupt and unknown-collection messages (S2-S4)") {
    val ops = Firehose.decode(raw(postCreate, likeCreate, postDelete, corrupt, unknownCollection))
    assert(ops.count() == 3)
    assert(Firehose.creates(ops, "app.bsky.feed.post").count() == 1)
    assert(Firehose.creates(ops, "app.bsky.feed.like").count() == 1)
    assert(Firehose.deletes(ops, "app.bsky.feed.post")
      .collect().map(_.getString(0)).toSeq == Seq("at://a/1"))
  }

  test("post creates route through the cascade as PostViews") {
    val ops = Firehose.decode(raw(postCreate, likeCreate))
    val pv = Firehose.postViews(ops)
    val stored = Ingest.processBatch(spark, Ingest.emptyStore(spark), pv,
      Seq(graft.domain.Fixtures.cond(key = "fh")), None)
    val rows = stored.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("uri") == "at://a/1")
    assert(rows.head.getAs[String]("key") == "fh")
  }

  test("search source hits flow end-to-end: DSv2 scan -> cascade -> store") {
    val hits = spark.read.format("graft-search")
      .option("totalPosts", 400).load().filter(col("lang") === "en")
    val pv = Firehose.searchHitsAsPostViews(hits)
    val stored = Ingest.processBatch(spark, Ingest.emptyStore(spark), pv,
      Seq(graft.domain.Fixtures.cond(key = "s1", inputRegex = "spark|vector")), None)
    assert(stored.count() > 0)
    assert(stored.select("key").distinct().head().getString(0) == "s1")
    // idempotent re-ingest
    val again = Ingest.processBatch(spark, stored, pv,
      Seq(graft.domain.Fixtures.cond(key = "s1", inputRegex = "spark|vector")), None)
    assert(again.isEmpty)
  }

  test("dot_fp is registered in SQL via GraftExtensions") {
    val r = spark.sql("SELECT dot_fp(array(1L,2L,3L), array(4L,5L,6L)) AS d").head()
    assert(r.getLong(0) == 32L)
  }

  test("the native text/similarity expressions are SQL-callable") {
    // each one: SQL text → same value as the Column-API construction
    val tc = spark.sql(
      "SELECT term_counts(array('a','b','a')) AS t").head().getSeq[Any](0)
    assert(tc.size == 2) // a:2, b:1
    val mh = spark.sql(
      "SELECT minhash_sig(array('a','b'), 4) AS s").head().getSeq[Any](0)
    assert(mh.size == 4)
    val sh = spark.sql(
      "SELECT simhash_bits(array('a','b'), 16) AS h," +
        "       simhash_bits(array('b','a'), 16) AS h2").head()
    assert(sh.getLong(0) == sh.getLong(1)) // order-invariant (dedup is tokenSet's job)
    val gk = spark.sql(
      "SELECT md5_gram_keys(array('a','b','c'), 2, true) AS g").head().getSeq[Any](0)
    assert(gk.size == 2) // two bigrams
    val is = spark.sql(
      "SELECT intersect_size_sorted(array('a','c','e'), array('c','d','e')) AS n").head()
    assert(is.getLong(0) == 2L)
    val dc = spark.sql(
      "SELECT dot_codes(X'0102', X'0304') AS d").head()
    assert(dc.getLong(0) == 1 * 3 + 2 * 4)
    // the DSIR primitives: per-token bucket mass and exact integer dot
    val bc = spark.sql(
      "SELECT dot_longs(bucket_counts(array('a','b','a',''), 4), array(1L,1L,1L,1L)) AS m")
      .head().getLong(0)
    assert(bc == 3L) // '' contributes nothing; three real tokens
    // a non-foldable parameter fails with the USAGE, not a ClassCastException
    val e = intercept[Exception](
      spark.sql("SELECT minhash_sig(array('a'), CAST(rand()*4 AS INT))").head())
    assert(e.getMessage.contains("foldable integer"))
    // a foldable non-Literal expression folds (2+1 is not a bare Literal)
    val folded = spark.sql(
      "SELECT minhash_sig(array('a','b'), 2+1) AS s").head().getSeq[Any](0)
    assert(folded.size == 3)
    // wrong arity raises the usage, not IndexOutOfBoundsException
    val ar = intercept[Exception](
      spark.sql("SELECT md5_gram_keys(array('a','b'), 2)").head())
    assert(ar.getMessage.contains("expects 3 arguments"))
    // the cached-regex pair and the include-screen engine (r16)
    val rc = spark.sql(
      "SELECT rlike_cached('SPARK flies', '(?iu)spark') AS f," +
        "       regexp_count_cached('aXaXa', 'a') AS c").head()
    assert(rc.getBoolean(0) && rc.getInt(1) == 3)
    // contains_any_folded expects PRE-folded text (the prefilter feeds it
    // lower(translate(...)) — fold coverage is ContainsAnyFoldedSpec's job)
    val caf = spark.sql(
      "SELECT contains_any_folded('a spark flies', 'spark', 'vector') AS hit," +
        "       contains_any_folded('nothing here', 'spark', 'vector') AS miss")
      .head()
    assert(caf.getBoolean(0) && !caf.getBoolean(1))
    val nf = intercept[Exception](
      spark.sql("SELECT contains_any_folded('t', lower(rand()))").head())
    assert(nf.getMessage.contains("foldable strings"))
  }

  // ---- real binary wire path: CBOR frames + CAR blocks -----------------

  import Cbor._

  /** CIDv1 bytes (version 1, dag-cbor 0x71, sha2-256 multihash) for a block. */
  private def cidBytes(data: Array[Byte]): Array[Byte] = {
    val digest = java.security.MessageDigest.getInstance("SHA-256").digest(data)
    Array[Byte](0x01, 0x71.toByte, 0x12, 32) ++ digest
  }

  /** DAG-CBOR CID link: tag 42 around identity-multibase(0x00) ++ cid. */
  private def cidLink(cid: Array[Byte]): Value = CTag(42, CBytes(0x00.toByte +: cid))

  /** CARv1 archive: varint-framed CBOR header, then varint-framed cid++data blocks. */
  private def car(blocks: Seq[Array[Byte]]): Array[Byte] = {
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

  private def commitFrame(seq: Long, repo: String, ops: Seq[Value],
      carBlocks: Seq[Array[Byte]]): Array[Byte] = {
    val header = Writer.encode(CMap(Vector("op" -> CInt(1), "t" -> CText("#commit"))))
    val body = Writer.encode(CMap(Vector(
      "seq" -> CInt(seq), "repo" -> CText(repo),
      "ops" -> CArr(ops.toVector), "blocks" -> CBytes(car(carBlocks)))))
    header ++ body
  }

  private def op(action: String, path: String, cid: Option[Array[Byte]]): Value =
    CMap(Vector("action" -> CText(action), "path" -> CText(path)) ++
      cid.map(c => "cid" -> cidLink(c)))

  private val postRecord = Writer.encode(CMap(Vector(
    "$type" -> CText("app.bsky.feed.post"),
    "text" -> CText("spark decodes cbor"),
    "createdAt" -> CText("2024-03-01 10:00:00"),
    "langs" -> CArr(Vector(CText("en"))))))
  private val followRecord = Writer.encode(CMap(Vector(
    "$type" -> CText("app.bsky.graph.follow"),
    "subject" -> CText("did:plc:followee"),
    "createdAt" -> CText("2024-03-01 11:00:00"))))

  private def binFrames(frames: Array[Byte]*) = {
    val s = spark
    import s.implicits._
    frames.toDF("frame")
  }

  test("binary commit frames decode through CAR + CBOR into routed ops (S2-S3)") {
    val orphanCid = cidBytes("not in car".getBytes)
    val frame = commitFrame(7L, "did:plc:x", Seq(
      op("create", "app.bsky.feed.post/3kabc", Some(cidBytes(postRecord))),
      op("delete", "app.bsky.feed.post/3kold", None),
      op("create", "app.bsky.graph.follow/3kfol", Some(cidBytes(followRecord))),
      op("update", "app.bsky.feed.post/3kupd", Some(cidBytes(postRecord))), // skipped (:90)
      op("create", "app.bsky.feed.post/3knocid", None), // no cid: skipped (:93)
      op("create", "app.bsky.feed.post/3korphan", Some(orphanCid)), // block missing: skipped (:95)
    ), Seq(postRecord, followRecord))
    val nonCommit = Writer.encode(CMap(Vector("op" -> CInt(1), "t" -> CText("#info"))))
    val garbage = Array[Byte](0x7f, -1, 0x42)

    val ops0 = Firehose.decodeCborFrames(binFrames(frame, nonCommit, garbage)).cache()
    assert(ops0.count() == 3)
    val post = Firehose.creates(ops0, "app.bsky.feed.post").head()
    assert(post.getAs[Long]("seq") == 7L)
    assert(post.getAs[String]("uri") == "at://did:plc:x/app.bsky.feed.post/3kabc")
    assert(post.getAs[String]("author") == "did:plc:x")
    assert(post.getAs[String]("cid") == Cbor.cidToString(cidBytes(postRecord)))
    val rec = post.getStruct(post.fieldIndex("record"))
    assert(rec.getAs[String]("text") == "spark decodes cbor")
    assert(rec.getSeq[String](rec.fieldIndex("langs")) == Seq("en"))
    assert(Firehose.creates(ops0, "app.bsky.graph.follow").count() == 1)
    assert(Firehose.deletes(ops0, "app.bsky.feed.post")
      .collect().map(_.getString(0)).toSeq == Seq("at://did:plc:x/app.bsky.feed.post/3kold"))
  }

  test("binary path and JSON stand-in share one guard surface: identical rows") {
    val frame = commitFrame(9L, "did:plc:y", Seq(
      op("create", "app.bsky.feed.post/3kp", Some(cidBytes(postRecord)))), Seq(postRecord))
    val viaCbor = Firehose.decodeCborFrames(binFrames(frame))
    val cidStr = Cbor.cidToString(cidBytes(postRecord))
    val viaJson = Firehose.decode(raw(
      s"""{"seq":9,"action":"create","collection":"app.bsky.feed.post",""" +
        s""""uri":"at://did:plc:y/app.bsky.feed.post/3kp","cid":"$cidStr","author":"did:plc:y",""" +
        """"record":{"text":"spark decodes cbor","createdAt":"2024-03-01 10:00:00","langs":["en"]}}"""))
    assert(viaCbor.exceptAll(viaJson).isEmpty && viaJson.exceptAll(viaCbor).isEmpty)
  }

  test("wire-controlled strings cannot inject JSON fields into the op row") {
    // a hostile relay controls path/repo byte-for-byte: a quote in the
    // path must surface as a LITERAL character in the uri, never as a
    // field boundary that forges record/cid on the op (Jackson keeps the
    // last duplicate key, so an unescaped interpolation was exploitable)
    val evilPath = """app.bsky.feed.post/3k","record":{"text":"forged"},"z":"x"""
    val frame = commitFrame(11L, "did:plc:victim", Seq(
      op("create", evilPath, Some(cidBytes(postRecord)))), Seq(postRecord))
    val rows = Firehose.decodeCborFrames(binFrames(frame)).collect()
    assert(rows.length == 1, "injected frame must still decode as ONE op")
    val r = rows.head
    assert(r.getAs[String]("uri") == s"at://did:plc:victim/$evilPath",
      "quote in path must be literal content, not a JSON field boundary")
    val rec = r.getStruct(r.fieldIndex("record"))
    assert(rec.getAs[String]("text") == "spark decodes cbor",
      "record must come from the CAR block, never from injected bytes")
  }

  test("CBOR rejects lengths/counts that exceed the frame instead of truncating") {
    // 8-byte byte-string length 0x1_0000_0005: .toInt would truncate to 5
    // and re-synchronize the reader at an attacker-chosen offset
    val hugeLen = Array[Byte](0x5b, 0, 0, 0, 1, 0, 0, 0, 5) ++ Array.fill[Byte](5)(7)
    intercept[IllegalArgumentException] { new Reader(hugeLen).decode() }
    // 4-byte array count 0xFFFFFFFF: .toInt goes negative and Vector.fill
    // would return EMPTY, silently skipping every element
    val hugeCount = Array[Byte](0x9a.toByte, -1, -1, -1, -1)
    intercept[IllegalArgumentException] { new Reader(hugeCount).decode() }
  }

  test("mapValueOf extracts one field without materializing the rest") {
    val body = Writer.encode(CMap(Vector(
      "blocks" -> CBytes(Array.fill[Byte](4096)(3)), // the dominant bytes
      "seq" -> CInt(42L),
      "extra" -> CArr(Vector(CInt(1), CText("x"))))))
    assert(new Reader(body).mapValueOf("seq").contains(CInt(42L)))
    assert(new Reader(body).mapValueOf("absent").isEmpty)
    // non-map at the cursor: None, not an exception
    assert(new Reader(Writer.encode(CInt(5))).mapValueOf("seq").isEmpty)
  }

  test("CBOR codec round-trips the DAG-CBOR value domain") {
    val v = CMap(Vector(
      "i" -> CInt(23), "big" -> CInt(1L << 40), "neg" -> CInt(-42),
      "s" -> CText("héllo \"quoted\"\n"), "b" -> CBool(true), "n" -> CNull,
      "d" -> CDouble(2.5), "arr" -> CArr(Vector(CInt(0), CText("x"))),
      "bytes" -> CBytes(Array[Byte](1, 2, 3)),
      "link" -> cidLink(cidBytes("data".getBytes))))
    val decoded = new Reader(Writer.encode(v)).decode()
    def norm(x: Value): Any = x match {
      case CBytes(b) => b.toSeq
      case CTag(t, inner) => (t, norm(inner))
      case CArr(xs) => xs.map(norm)
      case CMap(kvs) => kvs.map { case (k, y) => k -> norm(y) }
      case other => other
    }
    assert(norm(decoded) == norm(v))
  }
}
