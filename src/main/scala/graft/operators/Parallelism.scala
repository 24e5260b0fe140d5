package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical._

/** Parallelism must follow COMPUTE, not input bytes, for compute-dense
  * operators (per-row minhash/md5 signatures, quadratic dot-product
  * scoring, in-row tokenize+tf): Spark sizes scan splits by
  * `files.maxPartitionBytes`, so a small-but-expensive corpus (the sf0.1
  * harness tables are one parquet split each) plans as ONE task and the
  * whole operator runs serially on one core — measured as 13 single-task
  * stages under ns70 and a ~2 s serial 4 M-pair scoring stage. Widening
  * such a frame to the session's core count costs one exchange of the
  * small input and buys core-count speedup of the dominant stage.
  *
  * At data scale this is a NO-OP: input splits already exceed the core
  * count, so the exchange never happens — the gate makes the helper safe
  * to leave on every compute-dense path. The repartition uses an explicit
  * partition count, which AQE's coalescePartitions honors (it only
  * re-merges AQE-optimizable shuffles), so tiny inputs stay widened.
  *
  * Applies ONLY to scan-shaped inputs (scan/project/filter/sample — no
  * exchange anywhere in the plan), for two reasons: (a) that is the one
  * case the helper targets — a join/aggregate/repartition output already
  * carries shuffle-partition width chosen by its own operators (or by
  * the caller, who must win); (b) the partition-count probe is
  * `df.rdd`, and under AQE building the RDD of a plan that CONTAINS
  * exchanges finalizes the adaptive plan — synchronously executing every
  * shuffle stage of the input at graph-construction time, work the real
  * query then re-runs (no cross-execution exchange reuse). On an
  * exchange-free plan the probe is a driver-side partition count and
  * runs nothing.
  */
object Parallelism {
  def widen(df: DataFrame): DataFrame = {
    val scanShaped = df.queryExecution.optimizedPlan.collectFirst {
      case p if !p.isInstanceOf[Project] && !p.isInstanceOf[Filter] &&
        !p.isInstanceOf[Sample] && !p.isInstanceOf[LeafNode] => p
    }.isEmpty
    if (!scanShaped) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
