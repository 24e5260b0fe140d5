package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis, Upsert}

/** Scale smoke harness: the correctness suite runs at sf0.01–0.1 (5 k
  * documents); this main runs the same operators over a MILLIONS-of-rows
  * synthetic corpus generated distributively (spark.range + hash-derived
  * columns — no driver-side data, no files) to demonstrate the plans'
  * scale behavior directly: every op must finish without driver collects
  * of data, without single-partition funnels, and in time roughly linear
  * in the input.
  *
  * {{{ sbt "runMain graft.ScaleSmoke 2000000" }}}
  *
  * Results from this harness are recorded in SCALE.md. This is the
  * 40–400× companion to Bench: Bench measures the per-query floor at
  * oracle scale; this measures the slope.
  */
object ScaleSmoke {

  /** Deterministic corpus: ~5% exact duplicates (seed collapse), 20
    * sources, 40–80 words per doc over a 20 000-word zipf-ish vocabulary
    * (squaring a uniform hash fraction skews low ids common, high ids
    * rare — so n-grams overlap realistically: common stopword-like heads,
    * a long rare tail). All columns derive from the row id via xxhash64 —
    * generation is embarrassingly parallel and reproducible. */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    val V = 20000
    spark.range(n).toDF("doc_id")
      .withColumn("__seed",
        when(pmod(col("doc_id"), lit(20)) === 0, pmod(col("doc_id"), lit(4096)))
          .otherwise(col("doc_id")))
      .withColumn("text", concat_ws(" ",
        transform(
          sequence(lit(0), (pmod(xxhash64(col("__seed")), lit(41)) + lit(40)).cast("int")),
          i => {
            val u = pmod(xxhash64(col("__seed") * lit(1000003L) + i), lit(1000000L))
              .cast("double") / lit(1000000.0)
            concat(lit("w"), floor(u * u * V).cast("long"))
          })))
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(col("doc_id") + lit(7)), lit(20))))
      .select("doc_id", "source", "text")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    // optional second arg: substring filter over op labels (focused A/B runs)
    val only = args.lift(1)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = corpus(spark, n).localCheckpoint() // generate once, time ops only
    // JIT/codegen warmup (r9 methodology): each selected op first runs
    // once over a 100×-smaller corpus, untimed — the first heavy query in
    // a fresh JVM otherwise pays ~2 minutes of C2-compilation that has
    // nothing to do with the op's scaling (Bench applies the same
    // discipline). SCALE.md rows from r9 on are warm-JIT numbers.
    val warm = corpus(spark, math.max(n / 100, 10000L)).localCheckpoint()
    println(s"[scale] corpus: $n docs, ${docs.rdd.getNumPartitions} partitions")

    var warming = true
    def time(label: String)(body: org.apache.spark.sql.DataFrame => Long): Unit = {
      // filter is a comma-separated list of label substrings
      if (only.forall(_.split(',').exists(label.contains))) {
        if (warming) body(warm)
        else {
          val t0 = System.nanoTime()
          val rows = body(docs)
          println(f"[scale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.1f s  ($rows rows)")
        }
      }
    }

    def ops(): Unit = {
      time("exact_dedup") { d =>
        Dedup.exact(d, "doc_id", "text").filter(col("n") > 1).count()
      }
      time("minhash_lsh_pairs") { d =>
        Dedup.minhashLshPairs(d, "doc_id", "text", numHashes = 16, bands = 4).count()
      }
      time("simhash_pairs_banded48") { d =>
        Dedup.simhashPairsBanded(d, "doc_id", "text", bucket = Nil, maxDist = 3).count()
      }
      time("batch_ids_distributed_rank") { d =>
        Upsert.batchIds(d, "doc_id", 25).groupBy(col("batch_id")).count().count()
      }
      time("source_mix_sample") { d =>
        TextAnalysis.sampleToMix(d, "source", "doc_id",
          Seq("src0" -> 0.3, "src1" -> 0.2, "src2" -> 0.2, "src3" -> 0.3)).count()
      }
      time("bm25_rank") { d =>
        TextAnalysis.bm25Rank(d, "doc_id", "text",
          Seq("w17", "w230", "w1200", "w4200", "w9000", "w15000"), 1.2, 0.75, 20).count()
      }
      time("source_overlap_trigrams") { d =>
        TextAnalysis.sourceOverlap(d, "source", "text", n = 3).count()
      }
      time("dup_span_stats") { d =>
        TextAnalysis.duplicateSpanStats(d, "doc_id", "text", n = 3)
          .filter(col("dup_frac") > 0.5).count()
      }
      time("norm_dedup") { d =>
        Dedup.normalizedExact(d, "doc_id", "text").filter(col("n") > 1).count()
      }
      time("token_budget") { d =>
        // budget sized so the filter bites: ~60 words/doc × n/20 docs per
        // source → keep roughly the best third of each source
        TextAnalysis.tokenBudgetSelect(d, "source", "doc_id", "text", n).count()
      }
      time("chunk_overlap") { d =>
        TextAnalysis.chunkOverlap(d, "doc_id", "text", size = 32, stride = 24).count()
      }
      time("url_domains") { d =>
        val withUrls = d.select(col("doc_id"), concat(col("text"),
          lit(" https://m"), pmod(col("doc_id"), lit(37)).cast("string"),
          lit(".example.com/d")).as("text"))
        TextAnalysis.urlDomains(withUrls, "doc_id", "text").count()
      }
    }
    ops()            // warm pass at n/100 (untimed, JIT/codegen)
    warming = false
    ops()            // measured pass at n
    spark.stop()
  }
}
