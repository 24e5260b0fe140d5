package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Driver-side Lloyd iterations over already-collected fixed-point
  * vectors — the below-threshold fast path shared by [[KMeansIvf.fit]] and
  * [[ProductQuantizer]] codebook training. Replicates the distributed
  * recipe exactly: lowest-id init (callers pass vectors id-sorted),
  * first-min tie-break (lowest cluster index), per-cluster integer-mean
  * update with Long division, empty clusters keeping their previous
  * centroid, and a final assignment pass with the converged centroids.
  * All distances are exact Longs on both paths, so the results are
  * bit-identical, not approximately equal. */
private[operators] object LocalLloyd {

  /** Can the local path reproduce Spark's ORDER BY for this id type?
    * (Strings compare as UTF-8 bytes in Spark — matched below.) */
  def supportsId(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  def idOrdering(dt: DataType): Ordering[Any] = dt match {
    case LongType => Ordering.by((a: Any) => a.asInstanceOf[Long])
    case IntegerType => Ordering.by((a: Any) => a.asInstanceOf[Int])
    case ShortType => Ordering.by((a: Any) => a.asInstanceOf[Short])
    case ByteType => Ordering.by((a: Any) => a.asInstanceOf[Byte])
    case StringType => new Ordering[Any] {
      // unsigned byte-wise UTF-8 compare = Spark's binary string ordering
      override def compare(a: Any, b: Any): Int = {
        val (x, y) = (a.toString.getBytes("UTF-8"), b.toString.getBytes("UTF-8"))
        var i = 0
        while (i < x.length && i < y.length) {
          val d = (x(i) & 0xff) - (y(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
      }
    }
    case other =>
      throw new IllegalArgumentException(s"unsupported id type for local Lloyd: $other")
  }

  /** The adaptive gate shared by [[KMeansIvf.fit]] and
    * [[ProductQuantizer]] training: None when the corpus exceeds
    * `threshold` rows or the id type is unsupported — decided by an
    * id-only count probe (column-pruned, no bulk vector transfer on the
    * big path) — otherwise ALL (id, fixed-point vector) rows, id-sorted,
    * ready for [[fit]].
    *
    * `cacheKey` (identify corpus + vector column + threshold, include the
    * data dir) memoizes the probe AND the collected rows in
    * [[graft.SharedCache]], so DIFFERENT fits over the same corpus — the
    * IVF k-means and the PQ codebooks both train on `embeddings` — share
    * one probe job and one collect per pass instead of each paying their
    * own. Bounded by `threshold` rows by construction; at 100 TB scale
    * the probe answers None and nothing is held. */
  def probeSorted(df: DataFrame, idCol: String, fe: Column,
      threshold: Int, cacheKey: Option[String] = None)
      : Option[Array[(Any, Array[Long])]] = {
    def compute: Option[Array[(Any, Array[Long])]] = {
      val idType = df.schema(idCol).dataType
      if (!supportsId(idType)) return None
      if (df.select(col(idCol)).limit(threshold + 1).count() > threshold) return None
      val rows = df.select(col(idCol), fe.as("__fe")).collect()
      Some(rows.map(r => (r.get(0), r.getSeq[Long](1).toArray))
        .sortBy(_._1)(idOrdering(idType)))
    }
    cacheKey match {
      case Some(key) => graft.SharedCache.getOrComputeValue(s"$key:probe")(compute)
      case None => compute
    }
  }

  private def nearest(v: Array[Long], centroids: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0L
      var i = 0
      while (i < v.length) { val t = v(i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c } // strict < : first-min = lowest cluster
      c += 1
    }
    best
  }

  /** `iters` Lloyd rounds then a final assignment. `vecs` must already be
    * sorted by id — element i of the returned assignment labels vecs(i).
    * Seeds are the first min(k, n) vectors, mirroring the distributed
    * init's ORDER BY id LIMIT k. */
  def fit(vecs: Array[Array[Long]], k: Int, iters: Int): (Array[Int], Array[Array[Long]]) = {
    val kk = math.min(k, vecs.length)
    var centroids = Array.tabulate(kk)(i => vecs(i).clone())
    val dim = if (vecs.nonEmpty) vecs(0).length else 0
    val assignment = new Array[Int](vecs.length)
    def assignAll(): Unit = {
      var i = 0
      while (i < vecs.length) { assignment(i) = nearest(vecs(i), centroids); i += 1 }
    }
    for (_ <- 1 to iters) {
      assignAll()
      val sums = Array.ofDim[Long](kk, dim)
      val counts = new Array[Long](kk)
      var i = 0
      while (i < vecs.length) {
        val c = assignment(i)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += vecs(i)(j); j += 1 }
        i += 1
      }
      val next = Array.tabulate(kk)(c => centroids(c).clone())
      var c = 0
      while (c < kk) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { next(c)(j) = sums(c)(j) / counts(c); j += 1 } // Long '/' ≡ SQL div
        }
        c += 1
      }
      centroids = next
    }
    assignAll()
    (assignment, centroids)
  }
}
