package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract / frame-sample run
  * as per-partition batch functions (the Scala analog of mapInPandas — one
  * iterator per partition, vectorizable by batching inside the iterator).
  *
  * IMAGE decode/resize/featurize are REAL, using the JDK's bundled
  * ImageIO codecs (PNG/JPEG/GIF/BMP) — [[decodeImages]],
  * [[resizeImages]], [[imageFeatures]]. AUDIO/VIDEO decode remains a
  * declared stub (`decodeStub` — the JDK bundles no codecs for them):
  * deterministic fake metadata from the bytes, with the real
  * per-partition iterator contract, so swapping in a JNI/FFmpeg decoder
  * changes only the function body.
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

  /** REAL image decode via the JDK's bundled ImageIO codecs (PNG / JPEG /
    * GIF / BMP — public `javax.imageio` API, zero external libraries):
    * actual pixels, actual dimensions. Payloads no installed reader
    * understands are DROPPED (flatMap) — the usual curation-pipeline
    * stance toward undecodable media; audio/video stay behind
    * [[decodeStub]] because the JDK bundles no codecs for them. Same
    * per-partition iterator contract as the stub — this is exactly the
    * "swap the function body for a codec" upgrade the stub documents,
    * done for the formats the JDK can parse. */
  def decodeImages(ds: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { r =>
      readImage(r.media).map(im => MediaMeta(r.doc_id, r.kind,
        r.media.length.toLong, md5hex(r.media), im.getWidth, im.getHeight))
    })
  }

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** REAL image resize (JDK-only): decode, scale the longest side down to
    * `maxSide` preserving aspect (never upscales), re-encode as PNG.
    * Undecodable payloads are dropped, like [[decodeImages]]. */
  def resizeImages(ds: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { r =>
      readImage(r.media).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val scale = maxSide.toDouble / math.max(w, h)
        if (scale >= 1.0) r
        else {
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val out = new java.awt.image.BufferedImage(nw, nh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.drawImage(im, 0, 0, nw, nh, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          r.copy(media = bos.toByteArray)
        }
      }
    })
  }

  /** REAL image featurizer (JDK-only): mean luminance over a grid × grid
    * cell decomposition of the decoded pixels, scaled to [-0.5, 0.5) —
    * grid² dimensions of actual image content, so identical images embed
    * identically and the embedding-cosine dedup/ANN operators
    * ([[Similarity]]) run unchanged over media columns. Cells outside a
    * smaller-than-grid image contribute 0. */
  def imageFeatures(ds: Dataset[MediaRow], grid: Int = 4): Dataset[MediaFeature] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions(_.flatMap { r =>
      readImage(r.media).map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        val vec = (0 until grid * grid).map { c =>
          val (cx, cy) = (c % grid, c / grid)
          val (x0, x1) = (cx * w / grid, (cx + 1) * w / grid)
          val (y0, y1) = (cy * h / grid, (cy + 1) * h / grid)
          var sum = 0L
          var n = 0L
          var x = x0
          while (x < x1) {
            var y = y0
            while (y < y1) {
              val rgb = im.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              n += 3
              y += 1
            }
            x += 1
          }
          if (n == 0) 0f else (sum.toFloat / n / 256f) - 0.5f
        }
        MediaFeature(r.doc_id, r.kind, vec)
      }
    })
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
          // LONG intermediate: i*len multiplies two ints, and a payload
          // past Int.MaxValue/n bytes (a ~300 MB video at n = 8) would
          // raise ARITHMETIC_OVERFLOW under ANSI mode mid-scan
          val len = length(col("media")).cast("long")
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
