package graft.ops

import java.time.Instant
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raw time-window point extraction (reference: `app/services/get_timeseries.py`).
  *
  * Reference semantics: window predicate is start-inclusive / end-exclusive
  * (`app/api/timeseries.py:21-22`); non-finite values are dropped before
  * serialization (`app/services/get_aggregations.py:78-85`); empty results
  * are success, not error (`app/services/get_timeseries.py:255-271`).
  *
  * Scale notes: the window predicate is a plain comparison on the timestamp
  * column, so Catalyst pushes it into the parquet scan (row-group min/max
  * skipping). On a partitioned archive the same predicate prunes partitions.
  * Nothing here shuffles.
  */
object TimeseriesOps {

  /** P1 — `start <= ts < end`, pushed down to the scan.
    *
    * When the frame carries a raw-nanos shadow column (events: `ts` is
    * DERIVED from TIMESTAMP(NANOS), so a predicate on it cannot reach the
    * parquet reader), a slightly-relaxed equivalent predicate is ALSO
    * applied to the raw column — that one pushes down and restores
    * row-group/partition skipping; the exact µs-space predicate still
    * defines the semantics. */
  def windowFilter(df: DataFrame, tsCol: String, start: Instant, end: Instant): DataFrame = {
    val exact = col(tsCol) >= lit(java.sql.Timestamp.from(start)) &&
                col(tsCol) <  lit(java.sql.Timestamp.from(end))
    val nsCol = graft.tables.Tables.EventsTsNanosCol
    if (tsCol == "ts" && df.columns.contains(nsCol)) {
      // relaxed bounds (floor start / ceil end to µs) keep this a superset
      // of the exact predicate even for sub-µs instants
      val startNs = start.getEpochSecond * 1000000000L + (start.getNano / 1000L) * 1000L
      val endNano = end.getNano.toLong
      val endNs = end.getEpochSecond * 1000000000L +
        ((endNano + 999L) / 1000L) * 1000L
      df.filter(col(nsCol) >= lit(startNs) && col(nsCol) < lit(endNs) && exact)
    } else df.filter(exact)
  }

  /** P4 — keep only finite values (drops NULL, NaN, ±Inf), matching the
    * reference's `math.isfinite` filters (`app/services/get_aggregations.py:78-85`). */
  def finiteOnly(df: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.filter(v.isNotNull && !isnan(v) &&
              v =!= Double.PositiveInfinity && v =!= Double.NegativeInfinity)
  }

  /** F4 — ISO-8601 second-resolution timestamp label, matching
    * `isoformat()` output for naive-UTC timestamps (ref `get_timeseries.py:259`). */
  def isoTs(ts: Column): Column = date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")

  /** A9 — expected point count `ceil((end - start) / delta_t)`
    * (ref `app/services/get_timeseries.py:36-40`). Pure arithmetic; no data touched. */
  def expectedPointCount(start: Instant, end: Instant, deltaTSeconds: Long): Long = {
    val dur = end.getEpochSecond - start.getEpochSecond
    if (dur <= 0) 0L else (dur + deltaTSeconds - 1) / deltaTSeconds
  }
}
