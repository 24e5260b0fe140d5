package graft.queries

import graft.operators.Similarity
import graft.{QueryEntry, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Similarity-search suite over the embeddings table (SURVEY.md §7.2 M6):
  * brute-force cosine top-k, IVF-bucketed top-k, and embedding-cosine
  * near-dup pairs. All dot products are exact fixed-point integers so both
  * engines produce bit-identical doubles at the single final division.
  */
object SimilarityQueries extends QueryModule {

  /** DuckDB CTEs: fixed-point vectors + squared norms. */
  private val FpSql =
    """fp AS (SELECT vec_id, label,
      |  list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fe
      |  FROM embeddings),
      |n AS (SELECT vec_id, label, fe,
      |  CAST(list_sum(list_transform(list_zip(fe, fe), p -> p[1] * p[2])) AS BIGINT) AS nsq
      |  FROM fp)""".stripMargin

  private val CosSql =
    """CAST(CAST(list_sum(list_transform(list_zip(q.fe, c.fe), p -> p[1] * p[2])) AS BIGINT) AS DOUBLE)
      | / (sqrt(CAST(q.nsq AS DOUBLE)) * sqrt(CAST(c.nsq AS DOUBLE)))""".stripMargin

  private val ns08 = QueryEntry(
    "ns08_ann_brute",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val queries = t.embeddings.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(queries, t.embeddings, "vec_id", "embedding", k = 10)
        .select(col("q_id"), col("cand_id"), col("sim"), col("rank").as("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    },
    Some(
      s"""WITH $FpSql,
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    $CosSql AS sim
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
         |SELECT q_id, cand_id, sim, rnk FROM (
         |  SELECT q_id, cand_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 10 ORDER BY q_id, rnk""".stripMargin),
    headline = true,
  )

  private val ns09 = QueryEntry(
    "ns09_ann_ivf",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val queries = t.embeddings.filter(col("vec_id") < 5)
      Similarity.ivfTopK(queries, t.embeddings, "vec_id", "embedding", "label", k = 5)
        .select(col("q_id"), col("cand_id"), col("sim"), col("rank").as("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    },
    Some(
      s"""WITH $FpSql,
         |scored AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS cand_id,
         |    $CosSql AS sim
         |  FROM n q JOIN n c
         |    ON q.vec_id < 5 AND q.label = c.label AND c.vec_id <> q.vec_id)
         |SELECT q_id, cand_id, sim, rnk FROM (
         |  SELECT q_id, cand_id, sim,
         |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) AS BIGINT) AS rnk
         |  FROM scored)
         |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin),
  )

  private val ns07 = QueryEntry(
    "ns07_embed_neardup",
    (spark, dir) => {
      val t = Tables(spark, dir)
      Similarity.cosineNearDupPairs(t.embeddings, "vec_id", "embedding",
          bucket = Seq("label"), threshold = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some(
      s"""WITH $FpSql
         |SELECT id_a, id_b, sim FROM (
         |  SELECT q.vec_id AS id_a, c.vec_id AS id_b,
         |    $CosSql AS sim
         |  FROM n q JOIN n c ON q.label = c.label AND q.vec_id < c.vec_id)
         |WHERE sim >= 0.35 ORDER BY id_a, id_b""".stripMargin),
  )

  /** Real IVF: deterministic fixed-point k-means fits the coarse cells,
    * search probes only the query's cell. No SQL oracle (k-means isn't
    * reasonably SQL-expressible) → driver records a rows-only check; the
    * spec suite covers determinism and cell-local correctness. */
  private val ns20 = QueryEntry(
    "ns20_ann_ivf_kmeans",
    (spark, dir) => {
      val t = Tables(spark, dir)
      val queries = t.embeddings.filter(col("vec_id") < 5)
      graft.operators.KMeansIvf.search(queries, t.embeddings,
          "vec_id", "embedding", k = 5, nCells = 8, iters = 2)
        .select(col("q_id"), col("cand_id"), col("sim"), col("rank").as("rnk"))
        .orderBy(col("q_id"), col("rnk"))
    },
    oracle = None,
  )

  override def entries: Seq[QueryEntry] = Seq(ns07, ns08, ns09, ns20)
}
