package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fail-fast canary for the shared testdata fixture: asserts the loaded
  * dtypes/shapes the catalog (Tables.scala) and every downstream query
  * depend on. When the driver regenerates `/root/testdata` with a changed
  * physical schema — as happened in round 9, when events.ts flipped from
  * INT64 TIMESTAMP(NANOS) to TIMESTAMP_MICROS and 13 tests + 22 queries
  * failed at scattered sites — this suite turns that into ONE pointed
  * message naming the table and column that moved.
  */
class TestdataCanarySpec extends SparkSpec {
  private lazy val t = Tables(spark, sf0001)

  test("canary: events loads with ts as session-TZ TimestampType") {
    val schema = t.events.schema
    assert(schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType (got ${schema("ts").dataType}); " +
        "if the parquet physical type changed again, extend Tables.events dispatch")
    assert(schema("event_id").dataType == LongType)
    assert(schema("user_id").dataType == LongType)
    assert(schema("event_type").dataType == StringType)
    assert(schema("value").dataType == DoubleType)
    assert(schema("props").dataType == StringType)
  }

  test("canary: events ts values are sane epoch range (unix_micros works)") {
    // one bounded action; catches a silent nanos/micros unit mix-up (values
    // would land thousands of years off) — the failure mode a pure dtype
    // check can't see
    val row = t.events.agg(
      min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    val y2000us = 946684800L * 1000000L
    val y2100us = 4102444800L * 1000000L
    assert(lo > y2000us && hi < y2100us,
      s"events.ts micros out of sane range [$lo, $hi] — unit mix-up in Tables.events?")
  }

  test("canary: events props payload keeps the '{\"k\": N}' shape the queries parse") {
    // dq06 (regexp_extract on "k") and dq11 (validity rlike) both encode
    // this exact serialization; a regenerated fixture that reformats the
    // JSON (no space after the colon, different key) would flip those
    // queries hash-red with no pointed message — this pins it
    val n = t.events.filter(col("props").rlike("^\\{\"k\": [0-9]+\\}$")).count()
    val total = t.events.count()
    assert(n > 0, "no events.props row matches '{\"k\": N}' — payload format changed")
    assert(n == total,
      s"only $n of $total events.props rows match the expected shape — " +
        "update the dq06/dq11 parsers AND oracles together if the format changed")
  }

  test("canary: documents has the text-pipeline columns") {
    val schema = t.documents.schema
    assert(schema("doc_id").dataType == LongType)
    assert(schema("text").dataType == StringType)
    assert(schema("lang").dataType == StringType)
    assert(schema("source").dataType == StringType)
    assert(schema("n_chars").dataType == LongType)
  }

  test("canary: embeddings has float-array embedding with a stable dim") {
    val schema = t.embeddings.schema
    assert(schema("vec_id").dataType == LongType)
    assert(schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
      schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float> (got ${schema("embedding").dataType})")
    val dims = t.embeddings.select(size(col("embedding")).as("d"))
      .distinct().collect().map(_.getInt(0)).toSet
    // the catalog hardcodes dim = 64 (ns36/ns37/ns42 SQ8/LSH/PQ entries);
    // a regenerated fixture with another width must update those queries
    // AND their oracles together, starting from this one message
    assert(dims == Set(64),
      s"embedding dim must be exactly 64 — the catalog's hardcoded width (got $dims)")
    // ns09's IVF blocking column: an int cell label
    assert(schema("label").dataType == IntegerType,
      s"embeddings.label must be int (got ${schema("label").dataType})")
  }

  test("canary: TPC-H-ish tables expose the keyed columns the joins use") {
    assert(t.lineitem.schema.fieldNames.toSet
      .intersect(Set("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_returnflag")).size == 5)
    assert(t.orders.schema.fieldNames.contains("o_orderkey"))
    assert(t.customer.schema.fieldNames.contains("c_custkey"))
    assert(t.supplier.schema.fieldNames.contains("s_suppkey"))
    assert(t.part.schema.fieldNames.contains("p_partkey"))
    assert(t.nation.schema.fieldNames.contains("n_nationkey"))
    assert(t.region.schema.fieldNames.contains("r_regionkey"))
  }
}
