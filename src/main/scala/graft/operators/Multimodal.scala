package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as per-partition batch functions (the Scala analog of mapInPandas — one
  * iterator per partition, vectorizable by batching inside the iterator).
  *
  * The actual image/audio DECODE IS A STUB (the codec libraries are not in
  * this environment): `decodeStub` derives deterministic fake metadata from
  * the bytes. The Spark-side plumbing — schema, partitioning, batch
  * iterator shape, binary slicing — is real and tested; swapping the stub
  * for a JNI/FFmpeg decoder changes only the function body.
  */
object Multimodal {

  /** One media row: opaque payload + source id. */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  /** Decoded metadata (what a real decoder would emit). */
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      sha: String, width: Int, height: Int)

  /** Pack a text column as the opaque media payload (harness stand-in for
    * reading real image/audio bytes). */
  def packFromText(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("media"))

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** STUB decoder: real decode would parse the codec here. Deterministic
    * fake: dimensions derived from the byte length, digest from the bytes.
    * Runs per-partition over row batches — the distributed shape is real.
    */
  def decodeStub(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val n = r.media.length.toLong
        MediaMeta(r.doc_id, r.kind, n, md5hex(r.media),
          width = (n % 640).toInt, height = (n % 480).toInt)
      }
    }
  }

  /** One extracted feature vector per media row. */
  final case class MediaFeature(doc_id: Long, kind: String, embedding: Seq[Float])

  /** STUB featurizer — a real vision/audio model (ONNX/JNI) would run here
    * per partition batch. Deterministic fake: each dimension is a hash of
    * (bytes, dim) scaled to [-0.5, 0.5). Identical payloads get identical
    * embeddings, so the downstream embedding-cosine dedup/ANN operators
    * (graft.operators.Similarity) work unchanged over media columns. */
  def featureExtractStub(ds: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeature] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val base = MessageDigest.getInstance("MD5").digest(r.media)
        val vec = (0 until dim).map { i =>
          val b0 = base((i * 2) % base.length) & 0xff
          val b1 = base((i * 2 + 1) % base.length) & 0xff
          ((b0 * 256 + b1).toFloat / 65536f) - 0.5f
        }
        MediaFeature(r.doc_id, r.kind, vec)
      }
    }
  }

  /** STUB resize: a real implementation decodes, scales with a codec, and
    * re-encodes; the deterministic stand-in keeps every `stride`-th byte
    * (nearest-neighbor downsampling on the raw payload). Same
    * per-partition binary-in/binary-out iterator contract as
    * [[decodeStub]] — no driver-side bytes, swap the body for the codec. */
  def resizeStub(ds: Dataset[MediaRow], stride: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.map { r =>
      r.copy(media = Array.range(0, r.media.length, stride).map(r.media(_)))
    })
  }

  /** Frame sampling: slice the payload into `n` equal byte ranges (a real
    * video decoder would seek keyframes; the partition/batch shape is the
    * same). Emits (doc_id, frame_no, frame_bytes). */
  def frameSample(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(n - 1)), i => {
          val len = length(col("media"))
          // integer frame boundaries: frame i covers (i*len/n, (i+1)*len/n]
          val lo = floor(i * len / n).cast("int")
          val hi = floor((i + lit(1)) * len / n).cast("int")
          expr("media").substr(lo + 1, hi - lo)
        })).as(Seq("frame_no", "frame_bytes")))

  /** End-to-end stub pipeline over a text table, used by the declared
    * query: pack → decode → metadata table. */
  def metadataFromText(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, kind: String): DataFrame = {
    import spark.implicits._
    decodeStub(packFromText(df, idCol, textCol, kind).as[MediaRow]).toDF()
  }
}
