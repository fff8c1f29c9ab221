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

  /** P1 — `start <= ts < end`, pushed down to the scan. */
  def windowFilter(df: DataFrame, tsCol: String, start: Instant, end: Instant): DataFrame =
    df.filter(col(tsCol) >= lit(java.sql.Timestamp.from(start)) &&
              col(tsCol) <  lit(java.sql.Timestamp.from(end)))

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
