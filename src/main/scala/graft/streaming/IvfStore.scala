package graft.streaming

import java.nio.file.Paths

import graft.operators.KMeansIvf
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{NearestCellsCodes, SQ8PackRaw}
import org.apache.spark.sql.types._

/** The durable half of the streaming IVF lifecycle
  * ([[AnnIngest]] is the in-flight half): a [[VersionedStore]]-versioned
  * on-disk layout holding the quantized index —
  *
  * {{{ <storeDir>/_vNNN/model/   one-row parquet: mn, mx, centroids
  *     <storeDir>/_vNNN/codes/   (vec_id, __q binary, cell) partitioned by cell }}}
  *
  * Lifecycle: [[publish]] trains bounds + code-space centroids on a
  * corpus snapshot and lands index v1; a stream assigns arriving vectors
  * against the CURRENT model ([[AnnIngest.assignCells]]) and [[ingest]]
  * appends them to the current version's codes; [[refit]] retrains the
  * cells on everything stored (batch + streamed — Lloyd trains ON codes,
  * so no raw vectors are kept) and lands the result as the next version
  * with an atomic pointer flip — searches that resolved the old version
  * keep their files for [[VersionedStore.GraceVersions]] more swaps.
  * Bounds are fixed at publish time: streamed vectors outside them
  * saturate at the SQ8 code edge (recall degrades gradually under drift;
  * a fresh [[publish]] re-derives them).
  *
  * At 100 TB: partitionBy(cell) makes the search's cell equi-join
  * partition-pruned file reads (only the probed cells' files are
  * listed), the model sidecar is the k×dim + 2×dim driver-bounded state,
  * and the parquet version dirs swap for Delta/Iceberg snapshots with
  * the identical publish/ingest/refit/flip choreography. */
object IvfStore {

  /** The driver-bounded model sidecar: SQ8 bounds (fixed-point micros)
    * and code-space centroids. */
  final case class Model(mn: Array[Long], mx: Array[Long],
      centroids: Array[Array[Long]])

  // vec_id is pinned to LONG in the at-rest layout: schema-on-read needs
  // one concrete type, and every embedding fixture/source in scope keys
  // vectors by int64. Hash wider ids to longs upstream (xxhash64).
  private val codesSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("__q", BinaryType),
    StructField("cell", IntegerType)))

  private def codesDir(versionDir: String) =
    Paths.get(versionDir, "codes").toString
  private def modelDir(versionDir: String) =
    Paths.get(versionDir, "model").toString

  /** Train on a corpus snapshot and land it as the store's next version:
    * SQ8 bounds over the snapshot, packed codes, a code-trained k-means
    * ([[KMeansIvf.fitCodes]] — the same deterministic Lloyd as the batch
    * catalog entries), one pointer flip. Returns the published model. */
  def publish(spark: SparkSession, storeDir: String, embeddings: DataFrame,
      idCol: String, vecCol: String, nCells: Int, iters: Int = 3): Model = {
    val fpOne = (x: org.apache.spark.sql.Column) =>
      floor(x.cast("double") * 1000000d).cast("long")
    val nn = embeddings.filter(col(vecCol).isNotNull)
    // fixed-point bounds, exactly Similarity.sq8PackedCodes' recipe — a
    // vector quantized here and one quantized by the batch path must get
    // identical codes
    val b = nn.agg(graft.functions.MinMaxVecAgg.bounds(col(vecCol)).as("__b"))
      .select(transform(col("__b._1"), fpOne).as("mn"),
        transform(col("__b._2"), fpOne).as("mx")).head()
    val model0 = Model(b.getSeq[Long](0).toArray, b.getSeq[Long](1).toArray, Array.empty)
    val codes = nn.select(col(idCol).cast("long").as("vec_id"),
      SQ8PackRaw(col(vecCol), typedlit(model0.mn.toSeq),
        typedlit(model0.mx.toSeq)).as("__q"))
    VersionedStore.lockFor(storeDir).synchronized {
      swapFit(spark, storeDir, codes, model0, nCells, iters)
    }
  }

  /** Retrain the cells on EVERYTHING currently stored — the original
    * snapshot plus every streamed append — and land it as the next
    * version. Bounds carry over (codes are already quantized with them);
    * only the cell structure refreshes. Searches against the superseded
    * version keep streaming it through the grace window. */
  def refit(spark: SparkSession, storeDir: String, nCells: Int,
      iters: Int = 3): Model =
    VersionedStore.lockFor(storeDir).synchronized {
      val m = model(spark, storeDir)
      swapFit(spark, storeDir, codes(spark, storeDir).select("vec_id", "__q"),
        m, nCells, iters)
    }

  /** Fit cells on `codes`, then write (model, assigned codes) as the next
    * version and flip the pointer. Caller holds the store lock. The swap
    * writes the new version BEFORE touching the old one, and the reads
    * feeding the fit resolve the old version's files — which survive the
    * flip by the grace window — so refit-from-self is safe. */
  private def swapFit(spark: SparkSession, storeDir: String, codes: DataFrame,
      m: Model, nCells: Int, iters: Int): Model = {
    val (assignments, centroids) =
      KMeansIvf.fitCodes(codes, "vec_id", "__q", nCells, iters)
    val assigned = codes.join(assignments, "vec_id")
      .select(col("vec_id"), col("__q"), col("cluster").as("cell"))
    val next = Model(m.mn, m.mx, centroids)
    VersionedStore.swap(storeDir, tmp => {
      import spark.implicits._
      Seq((next.mn.toSeq, next.mx.toSeq, next.centroids.map(_.toSeq).toSeq))
        .toDF("mn", "mx", "centroids")
        .coalesce(1).write.parquet(modelDir(tmp.toString))
      assigned.write.partitionBy("cell").parquet(codesDir(tmp.toString))
    })
    next
  }

  /** The CURRENT version's model sidecar. */
  def model(spark: SparkSession, storeDir: String): Model = {
    val r = spark.read.parquet(modelDir(VersionedStore.versionDir(storeDir))).head()
    // nested rows come back as mutable.ArraySeq — type the inner element
    // as collection.Seq or the .map trips a ClassCastException
    Model(r.getSeq[Long](r.fieldIndex("mn")).toArray,
      r.getSeq[Long](r.fieldIndex("mx")).toArray,
      r.getSeq[scala.collection.Seq[Long]](r.fieldIndex("centroids"))
        .map(_.toArray).toArray)
  }

  /** The CURRENT version's code table (vec_id, __q, cell). */
  def codes(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.schema(codesSchema)
      .parquet(codesDir(VersionedStore.versionDir(storeDir)))

  /** Append a streamed batch of assigned codes — the output shape of
    * [[AnnIngest.assignCells]] plus the id column — into the CURRENT
    * version. Serialized with publish/refit by the store lock, so an
    * append can never land in a directory the GC is about to drop. */
  def ingest(storeDir: String, assigned: DataFrame, idCol: String): Unit =
    VersionedStore.lockFor(storeDir).synchronized {
      assigned
        .select(col(idCol).cast("long").as("vec_id"), col("__q"), col("cell"))
        .write.mode("append").partitionBy("cell")
        .parquet(codesDir(VersionedStore.versionDir(storeDir)))
    }

  /** Top-k in-cell quantized search against the CURRENT version: external
    * query vectors quantize with the stored bounds, probe their `nProbe`
    * nearest cells, rank by the exact integer code dot product — the
    * [[KMeansIvf.searchSq8MultiProbe]] ranking over the published index
    * instead of a per-query refit. partitionBy(cell) turns the cell
    * equi-join into pruned file reads when Spark plans it as a dynamic
    * filter; the broadcast query side never shuffles the code table. */
  def search(spark: SparkSession, storeDir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 1): DataFrame = {
    val m = model(spark, storeDir)
    val qs = broadcast(queries.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("__id"),
        SQ8PackRaw(col(vecCol), typedlit(m.mn.toSeq), typedlit(m.mx.toSeq)).as("__q"))
      .withColumn("cluster", explode(NearestCellsCodes(col("__q"), m.centroids, nProbe))))
    KMeansIvf.rankCodes(qs,
      codes(spark, storeDir)
        .select(col("vec_id").as("__id"), col("__q"), col("cell").as("cluster")),
      k)
  }
}
