package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals the plain join and spreads keys over salt buckets") {
    val t = Tables(spark, sf0001)
    val events = t.events
    val customer = t.customer
    val plain = events.join(customer, events("user_id") === customer("c_custkey"))
      .select("event_id", "c_name")
    val salted = Skew.saltedJoin(
      events.withColumnRenamed("user_id", "k"),
      customer.withColumnRenamed("c_custkey", "k"),
      key = "k", saltBy = col("event_id"), n = 8)
      .select("event_id", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("same-bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed2")
    // a crashed prior run can leave the managed location behind
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    Seq("ev_bucketed", "ev_bucketed2").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) d.listFiles().foreach(_.delete())
      d.delete()
    }
    val t = Tables(spark, sf0001)
    Skew.writeBucketed(t.events.select("event_id", "user_id", "value"),
      "ev_bucketed", "user_id", buckets = 8, sortBy = Some("user_id"))
    Skew.writeBucketed(t.events.select("event_id", "user_id"),
      "ev_bucketed2", "user_id", buckets = 8, sortBy = Some("user_id"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path: the point is the co-located SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = Skew.bucketedTable(spark, "ev_bucketed")
      val b = Skew.bucketedTable(spark, "ev_bucketed2")
        .withColumnRenamed("event_id", "event_id2")
      val joined = a.join(b, Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  /** One viral near-duplicate: 400 identical texts (one hot bucket under
    * ANY of the pair families' blocking keys — LSH band hash, simhash
    * block value, or an explicit bucket column), plus a unique tail. */
  private def hotDocs = {
    val s = spark
    import s.implicits._
    ((0 until 400).map(i => (i.toLong, "hot viral post going around")) ++
      (400 until 600).map(i => (i.toLong, s"unique text number $i about topic ${i % 7}")))
      .toDF("doc_id", "text")
  }

  /** Force the at-scale shuffle shape on a toy fixture: no broadcast
    * anywhere, skew thresholds low enough that the hot bucket's partition
    * trips them. Restores every conf afterwards. */
  private def withForcedSkew[A](body: => A): A = {
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // shuffle sizes are COMPRESSED bytes and identical hot rows compress
      // hard — thresholds must sit well below the hot partition's few KB
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def assertSkewSplitJoin(df: org.apache.spark.sql.DataFrame): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(plan.contains("skewed"), // AQEShuffleRead marks the split partitions
      s"expected AQE skew-split markers in the final adaptive plan:\n$plan")
  }

  test("LSH pair self-join under a hot bucket: AQE splits the skewed partition, result unchanged") {
    val docs = hotDocs
    // ground truth from the broadcast path (default gate)
    val viaBroadcast = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBroadcast.size >= 400 * 399 / 2) // the hot clique is present

    withForcedSkew {
      // broadcastRowLimit = 0 → the shuffle join path (what a 100 TB corpus takes)
      val shuffled = Dedup.minhashLshPairs(docs, "doc_id", "text", broadcastRowLimit = 0L)
      val viaShuffle = shuffled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaShuffle == viaBroadcast, "skew-split shuffle join must equal the broadcast join")
      assertSkewSplitJoin(shuffled)
    }
  }

  test("jaccard pair join under a hot bucket: AQE splits the skewed partition, result unchanged") {
    // all docs share one blocking bucket value — the hot clique plus tail
    // all land on one reducer unless AQE splits it
    val docs = hotDocs.withColumn("bkt", lit(1))
    val viaBroadcast = Dedup.jaccardPairs(docs, "doc_id", "text",
        bucket = Seq("bkt"), ngram = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBroadcast.size >= 400 * 399 / 2)

    withForcedSkew {
      val shuffled = Dedup.jaccardPairs(docs, "doc_id", "text",
        bucket = Seq("bkt"), ngram = 2, threshold = 0.5, broadcastRowLimit = 0L)
      val viaShuffle = shuffled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaShuffle == viaBroadcast, "skew-split shuffle join must equal the broadcast join")
      assertSkewSplitJoin(shuffled)
    }
  }

  test("banded simhash pair join under a hot block: AQE splits the skewed partition, result unchanged") {
    // simhashPairsBanded always shuffles (no broadcast arm — banding IS its
    // scale path); identical texts agree on every (block, value) key, so
    // the hot clique concentrates on single reducers
    val docs = hotDocs
    // ground truth: the same operator under default confs (its plan is
    // deterministic; only the physical partitioning changes under skew)
    val baseline = Dedup.simhashPairsBanded(docs, "doc_id", "text",
        bucket = Nil, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseline.size >= 400 * 399 / 2)

    withForcedSkew {
      val shuffled = Dedup.simhashPairsBanded(docs, "doc_id", "text",
        bucket = Nil, maxDist = 3)
      val viaShuffle = shuffled.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaShuffle == baseline, "skew-split shuffle join must equal the default-conf run")
      assertSkewSplitJoin(shuffled)
    }
  }
}
