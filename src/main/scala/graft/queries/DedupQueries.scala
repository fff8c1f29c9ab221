package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables
import graft.dedup.DedupOps

/** Deduplication query surface over `documents` (north-star extensions).
  *
  * Exact methods (`q_dedup_exact`, `q_dedup_ngram`) carry full DuckDB
  * oracles. The probabilistic methods (MinHash+LSH, SimHash) are not
  * SQL-expressible bit-for-bit, so they get rows-only driver checks — their
  * correctness is pinned by ScalaTest specs instead (DedupSpec): LSH output
  * ⊆ exact-Jaccard output, and recall = 100% on the planted near-dup pairs.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup (hash-groupBy on md5).
    "q_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDedup(docs(s, dir), "doc_id", "text")
        .orderBy("content_hash")),

    // Exact 3-gram Jaccard near-dup pairs at 0.8.
    "q_dedup_ngram" -> ((s, dir) =>
      DedupOps.ngramJaccardPairs(docs(s, dir), "doc_id", "text", 3, 0.8)
        .orderBy("id_a", "id_b")),

    // MinHash(128)+LSH(32 bands × 4 rows) with exact verification at 0.8.
    "q_dedup_minhash" -> ((s, dir) =>
      DedupOps.minhashDedupPairs(docs(s, dir), "doc_id", "text",
          n = 3, k = 128, bands = 32, threshold = 0.8)
        .orderBy("id_a", "id_b")),

    // SimHash fingerprints + Hamming≤3 near-dup pairs.
    "q_dedup_simhash" -> ((s, dir) =>
      DedupOps.simhashPairs(
          DedupOps.simhash(docs(s, dir), "doc_id", "text"), 3)
        .orderBy("id_a", "id_b")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_ngram" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |  FROM toks WHERE len(t) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |cnt AS (SELECT doc_id, len(s) AS n FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b, shared,
        |       round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) AS jaccard
        |FROM pairs
        |JOIN cnt ca ON id_a = ca.doc_id
        |JOIN cnt cb ON id_b = cb.doc_id
        |WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    // q_dedup_minhash / q_dedup_simhash: intentionally no oracle (probabilistic
    // hash families; rows-only check + ScalaTest containment/recall specs).
  )
}
