package graft.model

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

/** Conditions control-plane I/O (S6/S12 — /root/reference/src/
  * subscription.ts:58-112, databaseUtil.ts:9-113): restore standing
  * queries from a JSON config, validate at the boundary, default missing
  * fields, and merge insert-on-conflict-ignore against the running set.
  */
object ConditionStore {

  val rawSchema = Encoders.product[ConditionRaw].schema

  /** Load + validate + normalize; invalid rows are dropped (the reference
    * rejects them at the CRUD boundary with a 4xx). */
  def load(spark: SparkSession, path: String): Seq[Condition] = {
    import spark.implicits._
    spark.read.schema(rawSchema).json(path)
      .as[ConditionRaw].collect().toSeq // control plane: few rows by design
      .flatMap(r => Condition.validate(r).toOption)
      .map(Condition.normalize)
  }

  /** Insert-on-conflict-ignore by key: existing rows win (subscription.ts:
    * 95-99). */
  def mergeRestore(existing: Seq[Condition], restored: Seq[Condition]): Seq[Condition] = {
    val have = existing.map(_.key).toSet
    existing ++ restored.filterNot(c => have.contains(c.key))
  }

  /** Full-replace upsert for the CRUD path (delete+insert, databaseUtil.ts:
    * 77-108). */
  def setQuery(existing: Seq[Condition], c: Condition): Seq[Condition] =
    existing.filterNot(_.key == c.key) :+ c

  /** The conditions dimension as a DataFrame (broadcast on use). */
  def toDf(spark: SparkSession, cs: Seq[Condition]): DataFrame = {
    import spark.implicits._
    cs.toDF()
  }
}
