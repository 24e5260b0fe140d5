package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle-shaping tools for skewed and co-located workloads.
  *
  * `saltedJoin` splits each hot join key across `n` salt buckets: the big
  * side salts deterministically from a unique column, the small side is
  * replicated n× — the shuffle then spreads one hot key over n reducers.
  * Results are identical to the unsalted join. (AQE's skew-join handles
  * sort-merge skew automatically; salting is the explicit form that also
  * works for aggregations feeding a join and under AQE-off builds.)
  *
  * `writeBucketed`/`bucketedTable` persist a table bucketed by the join
  * key: a join of two tables bucketed the same way needs NO shuffle at
  * all — the 100 TB answer for repeated joins on the same key.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, spreading each key across `n` salt
    * buckets. `saltBy` must be any column of `big` (used only to derive a
    * deterministic salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltBy: Column,
      n: Int, joinType: String = "inner"): DataFrame = {
    // the small side is REPLICATED n×, so any join type that emits
    // unmatched small-side rows (right/full outer) would emit each of
    // them n times — not 'identical to the unsalted join'. Refuse those
    // up front; inner/left-flavored joins only ever emit small-side rows
    // through a match, where the (key, salt) equi-pair picks exactly one
    // replica per big row.
    val t = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(t),
      s"saltedJoin cannot preserve '$joinType' semantics: the replicated small " +
        "side would duplicate its unmatched rows n times — use the unsalted join " +
        "(or swap the sides) for right/full outer")
    val salted = big.withColumn("__salt", pmod(hash(saltBy), lit(n)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Persist `df` bucketed by `key` into the session catalog (parquet).
    * Bucket-pruned, shuffle-free joins for any two tables bucketed with
    * the same count on the same key. */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int,
      sortBy: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    sortBy.fold(w)(s => w.sortBy(s)).saveAsTable(tableName)
  }

  def bucketedTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
