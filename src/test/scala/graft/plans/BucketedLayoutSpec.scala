package graft.plans

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Proves the layout claim the scale notes repeat: "at 100 TB you'd
  * bucket the candidate table on the cell id and skip even that shuffle."
  * The block-keyed self-joins (knnGraph, ivfTopK's candidate side, the
  * ns65 pair generator) shuffle both sides on the block key ONLY because
  * the parquet scan has no distribution; a table bucketed on that key
  * hands the join its clustering for free. This spec materializes a real
  * bucketed table and pins that the SAME join goes exchange-free —
  * evidence, not prose, that the per-query shuffle is a layout decision
  * rather than a property of the operator. */
class BucketedLayoutSpec extends SparkSpec {

  test("a cell-bucketed table feeds the blocked pair join with zero exchanges") {
    val warehouse = Files.createTempDirectory("graft-bucketed").toString
    val emb = Tables(spark, sf0001).embeddings
      .select(col("vec_id"), col("label"), Similarity.fixedPoint(col("embedding")).as("fe"))
    spark.sql("DROP TABLE IF EXISTS emb_bucketed")
    emb.write.bucketBy(8, "label").sortBy("label")
      .option("path", s"$warehouse/emb_bucketed").saveAsTable("emb_bucketed")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // broadcast off: at test sizes the planner would broadcast the small
    // side and trivially show no exchange, proving nothing about layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val t = spark.table("emb_bucketed")
      val q = t.as("q"); val c = t.as("c")
      val joined = q.join(c,
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
        .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("cand_id"))
      val plan = joined.queryExecution.executedPlan
      assert(plan.collectWithSubqueries { case j: SortMergeJoinExec => j }.nonEmpty, plan)
      assert(plan.collectWithSubqueries { case e: ShuffleExchangeExec => e }.isEmpty, plan)
      // the control: the SAME join over the plain parquet scan shuffles
      // both sides — the exchange the bucketing removed
      val p = Tables(spark, sf0001).embeddings
        .select(col("vec_id"), col("label"))
      val pq = p.as("q"); val pc = p.as("c")
      val unbucketed = pq.join(pc,
        col("q.label") === col("c.label") && col("q.vec_id") =!= col("c.vec_id"))
        .queryExecution.executedPlan
      // one Exchange plus a ReusedExchange on the identical other side —
      // still a full shuffle of the table the bucketed plan never pays
      assert(unbucketed.collectWithSubqueries { case e: ShuffleExchangeExec => e }.nonEmpty,
        unbucketed)
      // and the bucketed layout returns the same pairs
      assert(joined.count() ==
        pq.join(pc, col("q.label") === col("c.label") &&
          col("q.vec_id") =!= col("c.vec_id")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS emb_bucketed")
    }
  }
}
