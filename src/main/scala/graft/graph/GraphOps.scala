package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — the driver coordinates a
  * fixed number of rounds, each round one shuffle join + one aggregate;
  * no RDDs, no Pregel runtime.
  *
  * Scale design:
  *  - each iteration is exactly one `edges ⋈ ranks` shuffle on `src` plus
  *    one `groupBy(dst)` exchange — the canonical distributed-PageRank
  *    shape; the degree column rides ON the edge table so the loop never
  *    re-joins it;
  *  - `localCheckpoint(true)` after every round truncates lineage — an
  *    unbounded iterative plan otherwise grows Catalyst analysis
  *    super-linearly with rounds (the classic iterative-DataFrame trap);
  *  - arithmetic is INTEGER micro-units throughout (`r div deg`,
  *    `(damp · Σ) div 1e6`) — a floating Σ of contributions is
  *    aggregation-order dependent, so two runs (or two engines) could
  *    disagree in the last ulp; integer fixed-point is exact under any
  *    order, which is what lets a DuckDB oracle replay the whole
  *    iteration with unrolled CTEs.
  *
  * Reference: Page, Brin, Motwani, Winograd (1999), "The PageRank
  * citation ranking"; damping 0.85.
  */
object GraphOps {

  /** Fixed-point PageRank over a directed edge list `(src, dst)`.
    *
    * Every node must appear as a source (no dangling mass — callers with
    * dangling nodes add self-loops or redistribute first; the bipartite
    * incidence graphs this engine builds are symmetric, so the
    * precondition holds by construction). Returns `(node, rank_micro)`
    * after `iters` rounds from a uniform start of 1.0 (= 1e6 micro),
    * with per-round update
    * `r' = (1−d) + d · Σ_in (r_src div deg_src)` in micro-units.
    */
  def pageRank(edges: DataFrame, iters: Int, dampMicro: Long = 850000L)
      : DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree rides on the edge relation once; the loop joins ranks only
    val ed = edges.join(deg, "src").localCheckpoint(true)
    val nodes = deg.select(col("src").as("node")).localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(1000000L).as("r"))
    val base = 1000000L - dampMicro
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(expr("r div deg")).as("c"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) + expr(s"$dampMicro * coalesce(c, 0) div 1000000"))
            .as("r"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
