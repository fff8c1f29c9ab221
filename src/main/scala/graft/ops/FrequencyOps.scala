package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Exact heavy hitters by the two-pass Misra-Gries protocol — the 100 TB
  * replacement for `groupBy(key).count().filter(cnt > n/k)`, whose
  * exchange carries one row per DISTINCT key (an n-gram universe at
  * corpus scale is 10^10 keys; the frequent ones are dozens).
  *
  * Pass 1 ([[candidateSummary]]): one [[graft.functions.MisraGriesAgg]]
  * aggregate over the keys — constant ≤k-entry state per partition,
  * map-side combined, one k-row exchange. The MG invariant guarantees
  * the summary contains EVERY key with true frequency > n/(k+1) ⊇ every
  * key with frequency > n/k, whatever the partitioning or merge order.
  *
  * Pass 2 ([[recountHeavy]]): re-scan filtered to the ≤k candidate keys
  * (a codegen'd `InSet` literal — no join, no broadcast exchange, rows
  * for non-candidates never leave the scan), exact ≤k-group count, keep
  * `cnt·k > n` in exact integers. The result is exactly
  * {key : freq > n/k} — deterministic even though the candidate SET is
  * order-dependent: guaranteed-present heavy keys always survive the
  * filter, spurious candidates never do. That determinism is what makes
  * a plain `GROUP BY ... HAVING cnt*k > n` DuckDB oracle hash-check a
  * query built on an order-dependent sketch. */
object FrequencyOps {

  /** Pass 1: `(n, candidate keys)` from one MG aggregate over
    * `df(keyCol)`. The ≤k-entry result is driver-sized by construction
    * — collecting it is the point (it becomes a scan-side literal). */
  def candidateSummary(df: DataFrame, keyCol: String, k: Int): (Long, Seq[String]) = {
    val row = df.agg(graft.functions.MisraGriesAgg.misra_gries(col(keyCol), k).as("mg"))
      .select(col("mg.n").as("n"), col("mg.entries.key").as("cands"))
      .head()
    (row.getLong(0), row.getSeq[String](1))
  }

  /** Pass 2: exact recount of `cands` only; keep freq > n/k (exact
    * integer compare `cnt*k > n`). Output: (keyCol, cnt). */
  def recountHeavy(df: DataFrame, keyCol: String, k: Int,
                   n: Long, cands: Seq[String]): DataFrame =
    df.filter(if (cands.isEmpty) lit(false) else col(keyCol).isInCollection(cands))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(k.toLong) > lit(n))

  /** Both passes: exactly {key : freq(key) > n/k} with counts. */
  def exactHeavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val (n, cands) = candidateSummary(df, keyCol, k)
    recountHeavy(df, keyCol, k, n, cands)
  }
}
