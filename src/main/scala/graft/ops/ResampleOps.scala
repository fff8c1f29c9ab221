package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-bucket resampling (reference: `app/services/get_aggregations.py:24-39,166-264`).
  *
  * The reference buckets a time-indexed series with pandas
  * `resample(rule).mean()` (left-closed, left-labeled, day-anchored origin) —
  * ref `app/services/get_aggregations.py:187,255`. Spark's `window()` is
  * epoch-aligned; for the six supported rules (all exact divisors of a day)
  * epoch alignment and day-start alignment coincide, so
  * `groupBy(window(ts, dur))` reproduces the reference bucketing exactly
  * (asserted in ResampleSpec, per SURVEY §7.5.1).
  *
  * Scale notes: the bucket key is derived from `ts` only, so the aggregation
  * is a single hash-aggregate with map-side partial combine — no pre-shuffle
  * needed, and the bucket cardinality (≤ the 2000-point cap) means the final
  * aggregate is tiny regardless of input size. The reference's month/day
  * chunk loop (`_iter_monthly_chunks`) exists only to bound single-node
  * memory and is deliberately NOT reproduced (SURVEY §4.2.1).
  */
object ResampleOps {

  /** interval label → Spark window duration (ref `app/services/get_aggregations.py:24-31`). */
  val IntervalDurations: Map[String, String] = Map(
    "10s" -> "10 seconds",
    "1m"  -> "1 minute",
    "5m"  -> "5 minutes",
    "15m" -> "15 minutes",
    "1h"  -> "1 hour",
    "1d"  -> "1 day",
  )

  /** interval label → seconds (ref `app/services/get_aggregations.py:33-39`). */
  val IntervalSeconds: Map[String, Long] = Map(
    "10s" -> 10L, "1m" -> 60L, "5m" -> 300L, "15m" -> 900L, "1h" -> 3600L, "1d" -> 86400L)

  /** Intervals in fineness order, used by auto-resolution (ref `:138-163`). */
  val IntervalOrder: Seq[String] = Seq("10s", "1m", "5m", "15m", "1h", "1d")

  /** Epoch-aligned bucket start for `ts` at the given interval label. */
  def bucket(ts: Column, interval: String): Column =
    window(ts, IntervalDurations(interval))("start")

  /** Normalize NaN to NULL so Spark `avg` matches pandas `mean(skipna=True)`
    * — Spark's avg ignores NULL but propagates NaN (SURVEY §7.5.2). */
  def nanToNull(v: Column): Column = when(isnan(v), lit(null)).otherwise(v)

  /** A1 — broadband resample: bucketed arithmetic mean of the value column.
    * One shuffle on the bucket key; partial aggregation map-side. */
  def resampleMean(df: DataFrame, tsCol: String, valueCol: String, interval: String): DataFrame =
    df.groupBy(bucket(col(tsCol), interval).as("bucket_start"))
      .agg(avg(nanToNull(col(valueCol))).as("mean_value"),
           count(nanToNull(col(valueCol))).as("point_count"))
      .filter(col("point_count") > 0) // P5: drop all-null buckets (ref `:98,:255`)

  /** Exact micro-unit half-up rounding of the rational `sMilli·1000 / n`
    * (i.e. round-6 of the mean `sMilli/(1000·n)`), entirely in integer
    * space. Needed because Spark's `round(double, 6)` rounds the double's
    * SHORTEST DECIMAL STRING (BigDecimal.valueOf) while DuckDB rounds the
    * binary value — on exactly-halfway rationals (a mean of 3-decimal
    * values over a 2^a·5^b-sized bucket lands on .xxxxx5 routinely once
    * the data replicates 10×) the two disagree by one final ulp; the sf1
    * sweep surfaced exactly this on 2/720 resample buckets. The integer
    * form — HALF_UP via `(2000·|s| + n) div (2·n)`, sign reapplied — is
    * engine-independent at any scale (DuckDB mirror: the same formula
    * with `//`). The caller divides the returned micro long by 1e6, a
    * single deterministic IEEE op on identical inputs. DECIMAL(38,0)
    * intermediates so 2000·Σmilli can never overflow a long at archive
    * scale; `div` (IntegralDivide) is exact on decimals and returns long. */
  def microMeanHalfUp(sMilli: Column, n: Column): Column = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = call_function("div",
      dec(abs(sMilli)) * lit(2000L) + dec(n), dec(n) * lit(2L))
    // n = 0 guard (all-null group): NULL like avg, not an ANSI div-by-zero
    when(n > 0, when(sMilli < 0, -q).otherwise(q)).cast("long")
  }

  /** Exact HALF_UP rounding of the integer ratio `num/den` (`den > 0`;
    * NULL otherwise, mirroring `// 0 → NULL`), DECIMAL(38,0) exact —
    * the generic form behind [[microMeanHalfUp]], for integer-space
    * interpolation/proration chains (e.g. q_interp_linear's
    * `Δmicro·Δt/Δspan`). */
  def ratioHalfUp(num: Column, den: Column): Column = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val q = call_function("div",
      dec(abs(num)) * lit(2L) + dec(den), dec(den) * lit(2L))
    when(den > 0, when(num < 0, -q).otherwise(q)).cast("long")
  }

  /** Mean as a single aggregate expression — plain `avg` or the
    * determinism-grade exact-milli form ([[microMeanHalfUp]] over
    * `(Σ round(v·1000) longs, count)`), selected by flag so an operator
    * can expose both without duplicating its grouping logic. The milli
    * form assumes ≤3-decimal values (SchemaCanarySpec pins the events
    * table's precision contract) and emits the round-6 mean exactly. */
  def meanOf(v: Column, exactMilli: Boolean): Column =
    if (!exactMilli) avg(v)
    else microMeanHalfUp(sum(round(v * 1000, 0).cast("long")), count(v))
      .cast("double") / 1e6

  /** [[resampleMean]] in determinism-grade form for archives whose value
    * column carries fixed ≤3-decimal precision (the synthetic events
    * table; hydrophone PSD archives quantized at write): the per-bucket
    * sum accumulates as exact milli-unit longs and the round-6 mean is
    * [[microMeanHalfUp]] — bit-identical across engines and aggregation
    * orders, where a double `avg` drifts by a final ulp once bucket
    * populations grow. Same single hash-aggregate shape as
    * [[resampleMean]] (one extra integer agg column, still map-side
    * combined); the general-precision service path keeps [[resampleMean]]. */
  def resampleMeanMilli(df: DataFrame, tsCol: String, valueCol: String, interval: String): DataFrame =
    df.groupBy(bucket(col(tsCol), interval).as("bucket_start"))
      .agg(sum(round(nanToNull(col(valueCol)) * 1000, 0).cast("long")).as("s_milli"),
           count(nanToNull(col(valueCol))).as("point_count"))
      .filter(col("point_count") > 0)
      .select(col("bucket_start"),
        (microMeanHalfUp(col("s_milli"), col("point_count")).cast("double") / 1e6)
          .as("mean_value"),
        col("point_count"))

  /** A2 — PSD resample over the long form `(ts, band, value)`: bucketed mean
    * per (bucket, band). Band-set agnostic (SURVEY §1.2); pivot to the wide
    * matrix only at the serving edge. */
  def resampleBandsMean(df: DataFrame, tsCol: String, bandCol: String, valueCol: String,
                        interval: String, exactMilli: Boolean = false): DataFrame =
    df.groupBy(bucket(col(tsCol), interval).as("bucket_start"), col(bandCol).as("band"))
      .agg(meanOf(nanToNull(col(valueCol)), exactMilli).as("mean_value"),
           count(nanToNull(col(valueCol))).as("point_count"))
      .filter(col("point_count") > 0)
}
