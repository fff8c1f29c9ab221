package graft.queries

/** Shared DuckDB fragments for the exact-integer round-6 discipline
  * (PERF r12 "Spark and DuckDB round the same double differently"):
  * every engine-side `ResampleOps.microMeanHalfUp`/`ratioHalfUp` has a
  * structurally identical mirror here, so both engines round the same
  * exact rational in integer space instead of each rounding its own
  * double realization. */
object OracleSql {

  /** Exact HALF_UP round-6 mean of milli sum `s` over count `n`, /1e6 —
    * mirrors `ResampleOps.microMeanHalfUp(s, n)/1e6` (`// 0` is NULL in
    * DuckDB exactly like the Spark n=0 guard). */
  def milliMeanSql(s: String, n: String): String =
    s"CAST(CASE WHEN $s < 0 THEN -((abs($s) * 2000 + $n) // (2 * $n)) " +
      s"ELSE ($s * 2000 + $n) // (2 * $n) END AS DOUBLE) / 1e6"

  /** Aggregate fragment: exact milli-unit sum of `v` (HUGEINT so the
    * doubled numerator can't overflow at any group size). */
  def sMilliSql(v: String): String =
    s"CAST(sum(CAST(round($v * 1000, 0) AS BIGINT)) AS HUGEINT)"

  /** Exact HALF_UP of integer ratio `num/den` — mirrors
    * `ResampleOps.ratioHalfUp`. */
  def ratioHalfUpSql(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -((abs($num) * 2 + ($den)) // (2 * ($den))) " +
      s"ELSE (($num) * 2 + ($den)) // (2 * ($den)) END)"
}
