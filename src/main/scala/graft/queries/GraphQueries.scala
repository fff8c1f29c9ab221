package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.GraphOps
import graft.tables.Tables

/** Iterative graph analytics over the star schema: the part–supplier
  * incidence graph from `lineitem` (who supplies what, observed in
  * orders) ranked by fixed-point PageRank — the importance measure a
  * training-data pipeline uses for source/URL weighting (harmonic-
  * centrality-style curation à la Common Crawl ranking).
  *
  * The iteration is exact integer fixed-point ([[GraphOps.pageRank]]), so
  * the DuckDB oracle replays all three rounds with UNROLLED CTEs —
  * bit-equal ranks, not approximately-equal ones. */
object GraphQueries {

  private val Iters = 3

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank(d=0.85, 3 rounds) over the symmetric part↔supplier edge
    // list. Bipartite symmetry guarantees no dangling nodes (every node
    // sources at least the edge that introduced it).
    "q_pagerank" -> ((s, dir) => {
      val pairs = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val edges = pairs.select(
          concat(lit("p"), col("l_partkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
        .unionByName(pairs.select(
          concat(lit("s"), col("l_suppkey").cast("string")).as("src"),
          concat(lit("p"), col("l_partkey").cast("string")).as("dst")))
      GraphOps.pageRank(edges, Iters).orderBy("node")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // the same three rounds, unrolled: integer fixed-point arithmetic is
    // aggregation-order independent, so the replay is exact
    "q_pagerank" -> {
      def round(i: Int) =
        s"""c$i AS (
           |  SELECT e.dst, sum(r.r // e.deg) AS c
           |  FROM ed e JOIN r${i - 1} r ON e.src = r.node GROUP BY 1),
           |r$i AS (
           |  SELECT n.node,
           |         CAST(150000 + (850000 * COALESCE(c.c, 0)) // 1000000
           |              AS BIGINT) AS r
           |  FROM r0 n LEFT JOIN c$i c ON n.node = c.dst)""".stripMargin
      s"""WITH pairs AS (
         |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         |e AS (
         |  SELECT 'p' || l_partkey AS src, 's' || l_suppkey AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || l_suppkey AS src, 'p' || l_partkey AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d ON e.src = d.src),
         |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT node, r AS rank_micro FROM r3 ORDER BY node""".stripMargin
    },
  )
}
