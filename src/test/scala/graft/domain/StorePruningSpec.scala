package graft.domain

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.Ingest
import org.apache.spark.sql.functions._

/** The serving-path scale claim, proven on the plan: the post store is
  * partitioned by feed `key`, so `key = ?` never scans other feeds. */
class StorePruningSpec extends SparkSpec {

  test("key filter on the partitioned store becomes partition pruning") {
    val store = Files.createTempDirectory("graft-prune").toString
    val conditions = Seq(Fixtures.cond(key = "f1"), Fixtures.cond(key = "f2", invertRegex = "banana"))
    FilterCascadeFixtureStore.build(spark, conditions)
      .write.mode("overwrite").partitionBy("key").parquet(store)

    val df = Ingest.readStore(spark, store).filter(col("key") === "f1")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("key#") || scan.contains("(key"), scan)
    // only f1's files are read
    val files = df.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("key=f1")), files.mkString("\n"))
  }
}
