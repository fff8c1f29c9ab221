package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables
import graft.sim.SimilarityOps

/** Similarity-search query surface over `embeddings` (north-star
  * extensions). Exact paths have DuckDB oracles (cosine recomputed in
  * double with identical rounding); the LSH ANN path is rows-only +
  * SimilaritySpec (recall vs. the brute-force baseline).
  */
object SimQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force cosine top-5 for every 10th vector as query.
    "q_cosine_topk" -> ((s, dir) =>
      SimilarityOps.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5)
        .orderBy("query_id", "rank")),

    // All pairs with cosine ≥ 0.4 (embedding near-dup threshold scan).
    "q_cosine_pairs" -> ((s, dir) =>
      SimilarityOps.cosinePairs(emb(s, dir), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")),

    // ANN: random-hyperplane LSH buckets (6 planes → 64 buckets), top-5
    // within bucket. Plane count scales with corpus size (log n).
    "q_ann_lsh" -> ((s, dir) =>
      SimilarityOps.lshTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, nPlanes = 6)
        .orderBy("query_id", "rank")),

    // ANN: IVF cells (16 centroids, 2 probes), exact rank within cells.
    "q_ann_ivf" -> ((s, dir) =>
      SimilarityOps.ivfTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, nCells = 16, nProbe = 2)
        .orderBy("query_id", "rank")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 10 = 0),
        |e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings),
        |pairs AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_cosine_similarity(qv, v), 6) AS cos
        |  FROM q, e WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    // q_ann_lsh: intentionally no oracle (xxhash64-derived hyperplanes are
    // not reproducible in DuckDB; rows-only + SimilaritySpec).
    // q_ann_ivf IS deterministic math end-to-end, so it gets a full oracle:
    "q_ann_ivf" ->
      """WITH base AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT id AS cell, v AS cv FROM base ORDER BY id LIMIT 16),
        |asg AS (
        |  SELECT b.id, b.v, c.cell,
        |         row_number() OVER (PARTITION BY b.id
        |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
        |  FROM base b CROSS JOIN cent c),
        |corpus AS (SELECT id AS neighbor_id, v, cell FROM asg WHERE r = 1),
        |qs AS (SELECT id AS query_id, v AS qv, cell FROM asg
        |       WHERE r <= 2 AND id % 10 = 0),
        |pairs AS (
        |  SELECT q.query_id, c.neighbor_id,
        |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos, c.cell
        |  FROM qs q JOIN corpus c
        |    ON q.cell = c.cell AND q.query_id <> c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos, cell,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, cos, cell
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
  )
}
