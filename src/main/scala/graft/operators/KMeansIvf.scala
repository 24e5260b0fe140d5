package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixed-point k-means — the coarse quantizer that upgrades
  * [[Similarity.ivfTopK]] from a given-cluster column to a REAL IVF index:
  * fit centroids, assign every vector to its nearest cell, search only the
  * query's cell.
  *
  * Determinism: vectors are integer micro-units (Similarity.fixedPoint),
  * distances are exact Longs, centroid updates use integer division, init
  * is the k lowest-id vectors — no RNG, same result on every run/cluster.
  *
  * Scale notes: each Lloyd iteration is one scan + one (cluster, dim)
  * aggregation; centroids (k × dim longs) live on the driver and ship
  * once per plan as a [[org.apache.spark.sql.graft.NearestCells]] codegen
  * reference object — nothing about the candidate table is ever
  * collected.
  */
object KMeansIvf {

  // Centroid ranking runs through the native NearestCells expression: the
  // earlier form unrolled every centroid into a distSq literal column
  // (k × dim literals, duplicated per consumer), which made the generated
  // code grow with k·dim — janino compile time dominated 2 M-row runs at
  // k = 16 already, and a production coarse quantizer (k ≈ √n) could
  // never plan. NearestCells ships the matrix once as a reference object.

  /** Fit k centroids, return (assignments, centroids). Assignments:
    * (idCol, cluster int).
    *
    * Adaptive like a broadcast join: below
    * `spark.graft.kmeans.localThreshold` corpus rows (default 65536) the
    * fixed-point vectors are collected ONCE and Lloyd runs on the driver —
    * the iterations cost array arithmetic instead of an
    * assign-join + centroid-aggregation Spark job each. Above it, the
    * distributed loop below is the only option (no driver holds a 100 TB
    * corpus), and the one probe job it spent deciding is noise against the
    * iterations it runs. Identical centroids and assignments by
    * construction — exact integer math, lowest-id init, first-min
    * tie-break on both paths (spec-asserted). */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int = 3,
      corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) = {
    val localThreshold = df.sparkSession.conf
      .get("spark.graft.kmeans.localThreshold", "65536").toInt
    LocalLloyd.probeSorted(df, idCol, Similarity.fixedPoint(col(vecCol)),
        localThreshold, corpusKey).foreach { vecs =>
      val (assignment, centroids) = LocalLloyd.fit(vecs.map(_._2), k, iters)
      val rows: java.util.List[org.apache.spark.sql.Row] =
        java.util.Arrays.asList(vecs.indices.map(i =>
          org.apache.spark.sql.Row(vecs(i)._1, assignment(i))): _*)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        df.schema(idCol).copy(name = idCol),
        org.apache.spark.sql.types.StructField("cluster",
          org.apache.spark.sql.types.IntegerType, nullable = false)))
      return (df.sparkSession.createDataFrame(rows, schema), centroids)
    }

    val fp = df.select(col(idCol), Similarity.fixedPoint(col(vecCol)).as("__fe"))
      .localCheckpoint()

    var centroids: Array[Array[Long]] = fp.orderBy(col(idCol)).limit(k)
      .select("__fe").collect()
      .map(_.getSeq[Long](0).toArray)

    def assign(frame: DataFrame): DataFrame =
      frame.withColumn("cluster",
        org.apache.spark.sql.graft.NearestCells.nearest(col("__fe"), centroids))

    val dim = centroids.head.length
    for (_ <- 1 to iters) {
      val assigned = assign(fp)
      // per-cluster integer means as dim sum-columns in ONE aggregation:
      // the shuffle moves k partially-aggregated rows, not the k × dim ×
      // |vectors| stream a posexplode would feed it
      val sums = (0 until dim).map(i =>
        sum(element_at(col("__fe"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
      val means = assigned.groupBy(col("cluster")).agg(sums.head, sums.tail: _*).collect()
      val next = Array.tabulate(centroids.length)(i => centroids(i).clone())
      means.foreach { r =>
        val cl = r.getInt(0)
        val n = r.getLong(dim + 1)
        var i = 0
        while (i < dim) { next(cl)(i) = r.getLong(i + 1) / n; i += 1 } // Long '/' ≡ SQL div (trunc toward 0)
      }
      centroids = next
    }

    (assign(fp).select(col(idCol), col("cluster")), centroids)
  }

  /** [[fit]] with the result shared across consumers via
    * [[graft.SharedCache]]: single-probe and multi-probe search over the
    * same corpus/params train the IDENTICAL model (deterministic fit — no
    * RNG), so only the first caller pays the Lloyd iterations; the
    * assignment table is pinned and the centroids memoized on the driver.
    * `cacheKey` must identify corpus + params (include the data dir).
    * The 100 TB analog: a fitted index is written once and every search
    * job loads it, it is not retrained per query. */
  def fitCached(df: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, cacheKey: Option[String],
      corpusKey: Option[String] = None): (DataFrame, Array[Array[Long]]) =
    cacheKey match {
      case None => fit(df, idCol, vecCol, k, iters, corpusKey)
      case Some(key) =>
        val spark = df.sparkSession
        val assignments = graft.SharedCache.getOrCompute(s"$key:assign", spark) {
          val (a, c) = fit(df, idCol, vecCol, k, iters, corpusKey)
          graft.SharedCache.getOrComputeValue(s"$key:centroids")(c)
          a
        }
        val centroids = graft.SharedCache.getOrComputeValue[Array[Array[Long]]](
          s"$key:centroids")(sys.error(s"centroids missing for $key"))
        (assignments, centroids)
    }

  /** Full IVF search: fit on the candidate set, assign queries to their
    * nearest centroid, search only that cell. */
  def search(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, iters: Int = 3,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    val (assignments, _) =
      fitCached(candidates, idCol, vecCol, nCells, iters, cacheKey, corpusKey)
    val cands = candidates.join(assignments, idCol)
    val qs = queries.join(assignments, idCol) // queries drawn from the corpus
    Similarity.ivfTopK(qs, cands, idCol, vecCol, "cluster", k)
  }

  /** Multi-probe IVF search: each query probes its `nProbe` nearest cells
    * (ties broken by cell id) instead of one — the standard recall knob.
    * Every candidate lives in exactly ONE cell, so probing several cells
    * never duplicates a (query, candidate) pair; the probe fan-out just
    * multiplies the broadcast query side by nProbe, and the cell equi-join
    * stays an ordinary hash join over the candidate table. */
  def searchMultiProbe(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nCells: Int, nProbe: Int, iters: Int = 3,
      cacheKey: Option[String] = None,
      corpusKey: Option[String] = None): DataFrame = {
    val (assignments, centroids) =
      fitCached(candidates, idCol, vecCol, nCells, iters, cacheKey, corpusKey)
    val cands = candidates.join(assignments, idCol)
    // the nProbe nearest cells per query, ascending by (distance, cell) —
    // NearestCells reproduces the former sort_array(struct(d, c)) order,
    // tie-break included
    val probed = queries
      .select(col(idCol), col(vecCol), Similarity.fixedPoint(col(vecCol)).as("__fe"))
      .withColumn("cluster", explode(
        org.apache.spark.sql.graft.NearestCells(col("__fe"), centroids, nProbe)))
      .select(col(idCol), col(vecCol), col("cluster"))
    Similarity.ivfTopK(probed, cands, idCol, vecCol, "cluster", k)
  }
}
