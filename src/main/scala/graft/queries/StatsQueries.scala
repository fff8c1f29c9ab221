package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.dedup.DedupOps

/** Statistical / analytical extensions beyond the reference surface:
  * exact percentiles, distinct cardinalities, duplicate-cluster resolution
  * (connected components over near-dup pairs), heavy-hitter shingles.
  */
object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation).
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
             round(expr("percentile(value, 0.95)"), 6).as("p95"),
             round(stddev_pop(col("value")), 6).as("sd"))
        .orderBy("event_type")),

    // Exact distinct cardinality per group (shuffle-dedup; the approximate
    // HLL variant is benchmarked in spec, not oracle-checked).
    "q_count_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Duplicate-cluster resolution: connected components over the exact
    // near-dup pair graph; keeper = min doc_id per component.
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = DedupOps.ngramJaccardPairs(
        Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      DedupOps.duplicateClusters(pairs).orderBy("doc_id")
    }),

    // Heavy hitters: the most document-frequent 3-gram shingles (exact
    // count, rank-limited with deterministic tie-break).
    "q_top_shingles" -> ((s, dir) => {
      val df = DedupOps.shingleSets(Tables.documents(s, dir), "doc_id", "text", 3)
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      df.orderBy(col("df").desc, col("shingle")).limit(20)
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95,
        |       round(stddev_pop(value), 6) AS sd
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
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
        |  GROUP BY 1, 2),
        |edges AS (
        |  SELECT id_a, id_b FROM pairs
        |  JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
        |  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.8),
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM edges
        |  UNION ALL SELECT id_b, id_a FROM edges),
        |reach AS (
        |  SELECT src, dst FROM bidir
        |  UNION
        |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        |  WHERE r.src <> b.dst),
        |members AS (
        |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT doc_id, cluster_id FROM members ORDER BY doc_id""".stripMargin,

    "q_top_shingles" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM toks WHERE len(t) >= 3)
        |SELECT shingle, count(*) AS df FROM sh
        |GROUP BY 1 ORDER BY df DESC, shingle LIMIT 20""".stripMargin,
  )
}
