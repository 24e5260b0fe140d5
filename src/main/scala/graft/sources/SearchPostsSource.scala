package graft.sources

import java.security.MessageDigest
import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 source modeling the reference's paged `searchPosts` ingest
  * (/root/reference/src/subscription.ts:219-239): cursor-paged scan with a
  * per-cycle page budget (`apiCall < 100`, T3) and the language predicate
  * pushed INTO the source (`' lang:xx'` appended to the search query,
  * P10/S1 — here a DSv2 `SupportsPushDownFilters` on the `lang` column).
  *
  * The fetch body is pluggable. With `endpoint` set, every page is a REAL
  * HTTP GET (`{endpoint}?offset=N&limit=M[&lang=xx]` → JSON post array,
  * executed executor-side with the JDK HttpClient) — the pushed language
  * predicate travels on the wire exactly like the reference appending
  * `' lang:xx'` to the remote query. Without `endpoint` a deterministic
  * in-process generator stands in (zero-egress harness default); the
  * connector surface — offsets, micro-batch planning, pushdown, rate
  * budget, page fan-out — is identical either way. Options:
  *   totalPosts (default 1000), pageSize (100), pagesPerTrigger (100),
  *   endpoint (default unset → synthetic).
  *
  * Registered as format("graft-search"); supports batch and micro-batch
  * reads. Offsets are post indices, checkpointed by Spark (T4 — strictly
  * stronger than the reference's every-20-events stride).
  */
class SearchPostsProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-search"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SearchPosts.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SearchPostsTable(new CaseInsensitiveStringMap(properties))
}

object SearchPosts {
  val schema: StructType = StructType(Seq(
    StructField("uri", StringType, nullable = false),
    StructField("cid", StringType, nullable = false),
    StructField("did", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("createdAt", TimestampType, nullable = false),
  ))

  private val langs = Seq("en", "es", "de", "fr", "zh")
  private val vocab = ("the a fast slow big small spark vector hash join merge sort scan filter " +
    "group agg window batch stream table row column key value order part line customer").split(" ")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def lang(i: Long): String = langs((i % langs.size).toInt)

  /** Deterministic fake post #i (what the remote search API would return). */
  def row(i: Long): InternalRow = {
    val h = md5hex(s"post:$i")
    val words = (0 until 8 + (h(0) % 8)).map { j =>
      vocab((Integer.parseInt(h.substring(j % 28, j % 28 + 2), 16)) % vocab.length)
    }
    InternalRow(
      UTF8String.fromString(s"at://did:plc:src${i % 20}/app.bsky.feed.post/$i"),
      UTF8String.fromString(h),
      UTF8String.fromString(s"did:plc:src${i % 20}"),
      UTF8String.fromString(words.mkString(" ")),
      UTF8String.fromString(lang(i)),
      // createdAt: 2024-01-01T00:00:00Z + i seconds, micros
      1704067200000000L + i * 1000000L,
    )
  }
}

class SearchPostsTable(options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = "graft_search_posts"
  override def schema(): StructType = SearchPosts.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new SearchScanBuilder(
      totalPosts = options.getLong("totalPosts", 1000L),
      pageSize = options.getInt("pageSize", 100),
      pagesPerTrigger = options.getInt("pagesPerTrigger", 100),
      endpoint = Option(options.get("endpoint")))
}

/** Pushdown: EqualTo("lang", v) is consumed by the source (the reference
  * appends ' lang:xx' to the remote query); everything else stays a Spark
  * post-filter. */
class SearchScanBuilder(totalPosts: Long, pageSize: Int, pagesPerTrigger: Int,
    endpoint: Option[String]) extends ScanBuilder with SupportsPushDownFilters {
  private var langFilter: Option[String] = None
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("lang", v: String) => true
      case _ => false
    }
    accepted.foreach { case EqualTo(_, v: String) => langFilter = Some(v) }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SearchScan(totalPosts, pageSize, pagesPerTrigger, langFilter, endpoint)
}

class SearchScan(totalPosts: Long, pageSize: Int, pagesPerTrigger: Int,
    langFilter: Option[String], endpoint: Option[String] = None) extends Scan {
  override def readSchema(): StructType = SearchPosts.schema
  override def description(): String =
    s"graft-search(totalPosts=$totalPosts, pushedLang=${langFilter.getOrElse("-")})"
  override def toBatch: Batch = new SearchBatch(0L, totalPosts, pageSize, langFilter, endpoint)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SearchMicroBatchStream(totalPosts, pageSize, pagesPerTrigger, langFilter, endpoint)
}

case class PageOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Micro-batch stream over the paged scan: each trigger advances by at most
  * pagesPerTrigger × pageSize posts (the reference's 100-call budget).
  *
  * Admission control is stateless with respect to this object: the end
  * offset is `start + budget`, where `start` is whatever Spark restored from
  * the checkpoint — so a restarted query resumes at full budget immediately
  * instead of re-warming an in-memory counter from zero. */
class SearchMicroBatchStream(totalPosts: Long, pageSize: Int,
    pagesPerTrigger: Int, langFilter: Option[String],
    endpoint: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def budgetRows: Long = pageSize.toLong * pagesPerTrigger

  override def initialOffset(): Offset = PageOffset(0L)

  /** Per-trigger budget — the reference's per-cycle `apiCall < 100` bound;
    * successive triggers drain the backlog (catch-up, T2/T3). */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(budgetRows)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[PageOffset].index
    val budget = limit match {
      case r: ReadMaxRows => r.maxRows()
      // Trigger.Once/AvailableNow pass allAvailable: the contract is the
      // WHOLE backlog in this batch — treating it as one page budget made
      // a single-batch query stop after pagesPerTrigger pages and report
      // success with the rest silently unread
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        totalPosts
      case _ => budgetRows
    }
    PageOffset(math.min(totalPosts, s + budget))
  }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  /** True head of the stream, reported for progress/lag metrics. */
  override def reportLatestOffset(): Offset = PageOffset(totalPosts)

  override def deserializeOffset(json: String): Offset = PageOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[PageOffset].index
    val e = end.asInstanceOf[PageOffset].index
    SearchBatch.partitions(s, e, pageSize)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SearchReaderFactory(langFilter, endpoint)
}

/** One partition = one "API page" — parallel fetch across executors. */
case class SearchPagePartition(start: Long, end: Long) extends InputPartition

object SearchBatch {
  def partitions(start: Long, end: Long, pageSize: Int): Array[InputPartition] =
    (start until end by pageSize)
      .map(s => SearchPagePartition(s, math.min(end, s + pageSize)): InputPartition)
      .toArray
}

class SearchBatch(start: Long, end: Long, pageSize: Int,
    langFilter: Option[String], endpoint: Option[String] = None) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    SearchBatch.partitions(start, end, pageSize)
  override def createReaderFactory(): PartitionReaderFactory =
    new SearchReaderFactory(langFilter, endpoint)
}

class SearchReaderFactory(langFilter: Option[String],
    endpoint: Option[String] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SearchPagePartition]
    endpoint match {
      case Some(url) => new HttpPageReader(url, p, langFilter)
      case None => new PartitionReader[InternalRow] {
        private var i = p.start - 1
        private var current: InternalRow = _
        override def next(): Boolean = {
          i += 1
          // language pushdown: non-matching posts are never materialized
          while (i < p.end && langFilter.exists(_ != SearchPosts.lang(i))) i += 1
          if (i < p.end) { current = SearchPosts.row(i); true } else false
        }
        override def get(): InternalRow = current
        override def close(): Unit = ()
      }
    }
  }
}

/** The REAL fetch body: one HTTP GET per page partition, executed on the
  * executor that owns the partition (subscription.ts:227-239's
  * `agent.app.bsky.feed.searchPosts({q, limit, cursor})` — offset/limit
  * here, with the pushed language predicate as a query parameter like the
  * reference's `' lang:xx'` query suffix). The response is a JSON array of
  * `{uri, cid, did, text, lang, createdAt}` objects, createdAt in ISO-8601;
  * rows convert straight to InternalRow, so everything downstream of the
  * fetch is byte-identical to the synthetic path. */
class HttpPageReader(url: String, p: SearchPagePartition,
    langFilter: Option[String]) extends PartitionReader[InternalRow] {
  private lazy val rows: Iterator[InternalRow] = {
    // percent-encode the pushed predicate: a raw space crashes URI.create
    // (task dies on every retry), and a raw '&' would rewrite the
    // request's OTHER query parameters
    val lang = langFilter
      .map(l => "&lang=" + java.net.URLEncoder.encode(l, "UTF-8")).getOrElse("")
    val uri = java.net.URI.create(
      s"$url?offset=${p.start}&limit=${p.end - p.start}$lang")
    // request timeout: the JDK client defaults it to INFINITE, so an
    // endpoint that accepts the connection and then stalls would park
    // this Spark task forever — a timeout fails the task instead, and
    // Spark's task retry is the retry policy (same pitfall fixed in
    // DidResolver.HttpFetcher; a page is ≤ limit rows, so 30 s covers
    // any healthy response). HttpRequest.timeout only covers up to the
    // response HEADERS, so the body is streamed under its own wall-clock
    // deadline and byte cap (a slow-dripped or unbounded body would
    // otherwise still park the task — DidResolver.HttpFetcher's bound,
    // applied here too; 32 MB is far above any ≤ limit-row page).
    val resp = HttpPageReader.client.send(
      java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofSeconds(30)).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    val body = {
      val in = resp.body()
      try {
        if (resp.statusCode() != 200)
          throw new java.io.IOException(s"search endpoint ${resp.statusCode()} for $uri")
        val deadline = System.currentTimeMillis() + 30000L
        val maxBodyBytes = 32 * 1024 * 1024
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) {
          buf.write(chunk, 0, n)
          if (buf.size() > maxBodyBytes)
            throw new java.io.IOException(s"search page body exceeded $maxBodyBytes bytes for $uri")
          if (System.currentTimeMillis() > deadline)
            throw new java.io.IOException(s"search page body stalled past the deadline for $uri")
          n = in.read(chunk)
        }
        buf.toString(java.nio.charset.StandardCharsets.UTF_8)
      } finally in.close()
    }
    val arr = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    // field access is validated so one malformed row names itself instead
    // of killing the query with a bare NPE from asText()
    def field(n: com.fasterxml.jackson.databind.JsonNode, i: Int, name: String): String = {
      val v = n.get(name)
      if (v == null || v.isNull)
        throw new java.io.IOException(s"search row $i from $uri missing field '$name': $n")
      v.asText()
    }
    (0 until arr.size()).iterator.map { i =>
      val n = arr.get(i)
      val t = java.time.Instant.parse(field(n, i, "createdAt"))
      InternalRow(
        UTF8String.fromString(field(n, i, "uri")),
        UTF8String.fromString(field(n, i, "cid")),
        UTF8String.fromString(field(n, i, "did")),
        UTF8String.fromString(field(n, i, "text")),
        UTF8String.fromString(field(n, i, "lang")),
        t.toEpochMilli * 1000L + t.getNano / 1000 % 1000,
      )
    }.toVector.iterator
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object HttpPageReader {
  /** ONE executor-wide client: each JDK HttpClient owns a selector-manager
    * thread and has no close() (pre-21), so the former per-partition
    * client leaked a thread per page until GC — hundreds per hour on a
    * streaming ingest. The long-lived-singleton pattern SubscribeRepos
    * already uses. */
  private[sources] lazy val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()
}
