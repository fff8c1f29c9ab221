package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed data (SURVEY §4: AQE handles moderate skew at
  * runtime; explicit salting is the deterministic tool for pathological
  * keys — e.g. a null-like sentinel user owning 10% of a 100 TB fact). */
object JoinOps {

  /** Skew-safe equi-join of a large (skewed) side against a smaller side:
    * the large side's rows scatter across `salts` sub-keys (deterministic —
    * hash of the whole row, no `rand()`, so retries/speculative tasks agree),
    * and the small side replicates once per salt. Same result set as a
    * plain inner equi-join, but the hot key's rows land on `salts`
    * reducers instead of one. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Range/interval overlap predicate `[aStart,aEnd] ∩ [bStart,bEnd] ≠ ∅`
    * (J2's generalization). Use with a broadcast side; for two large sides
    * pre-bucket both on coarse time buckets first. */
  def overlaps(aStart: Column, aEnd: Column, bStart: Column, bEnd: Column): Column =
    aStart <= bEnd && bStart <= aEnd
}
