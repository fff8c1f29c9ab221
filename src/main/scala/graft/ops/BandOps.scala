package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band-range operations over the long PSD form `(ts, band, value)`
  * (reference: `_mean_band_range` / `_is_in_band`,
  * `app/services/get_aggregations.py:57-75`).
  *
  * The reference works on a wide matrix and selects columns whose *label*
  * parses as a number inside `[low, high]`. Our canonical long form makes
  * that a plain row predicate — band-set agnostic, prunable, and pushdown-
  * friendly (SURVEY §4.2.3).
  */
object BandOps {

  /** P2 — keep rows whose numeric band label lies in `[low, high]`;
    * non-numeric labels (cast → NULL) are excluded, matching `_is_in_band`'s
    * try/float (`app/services/get_aggregations.py:70-75`). */
  def bandRange(df: DataFrame, bandCol: String, low: Double, high: Double): DataFrame = {
    val b = col(bandCol).try_cast("double") // non-numeric label → NULL → excluded, never an ANSI error

    df.filter(b.isNotNull && b >= low && b <= high)
  }

  /** A3 — per-timestamp mean across the selected bands (pandas
    * `mean(axis=1, skipna=True)`, ref `:67`). In long form this is a
    * grouped mean over `ts` — NaNs normalized to NULL first so skipna
    * semantics hold (SURVEY §7.5.2). */
  def rowMeanAcrossBands(df: DataFrame, tsCol: String, valueCol: String,
      exactMilli: Boolean = false): DataFrame =
    df.groupBy(col(tsCol))
      .agg(ResampleOps.meanOf(ResampleOps.nanToNull(col(valueCol)), exactMilli)
        .as("mean_value"))
      .filter(col("mean_value").isNotNull)

  /** Serving-edge pivot long → wide matrix. Band cardinality is small and
    * bounded (≤ a few dozen 1/3-octave bands), so an explicit `pivot` with
    * collected distinct values stays a single shuffle. */
  def toWide(df: DataFrame, tsCol: String, bandCol: String, valueCol: String): DataFrame = {
    val bands = df.select(bandCol).distinct()
      .collect().map(_.get(0))
      // numeric column order where labels parse as numbers (63 < 125 even
      // though "125" < "63" lexicographically); non-numeric labels last
      .sortBy(v => (scala.util.Try(v.toString.toDouble).getOrElse(Double.MaxValue),
        v.toString))
    df.groupBy(col(tsCol))
      .pivot(bandCol, bands.toIndexedSeq)
      .agg(first(col(valueCol)))
  }

  /** Inverse of [[toWide]]: wide matrix → long `(ts, band, value)` via the
    * built-in `unpivot` — map-only, no shuffle, so the long form is free to
    * re-derive at any scale. NULL cells (bands absent at a timestamp) drop,
    * matching the long frame the pivot consumed. */
  def toLong(df: DataFrame, tsCol: String, bandCol: String,
      valueCol: String): DataFrame = {
    val bands = df.columns.filter(_ != tsCol)
    df.unpivot(Array(col(tsCol)), bands.map(col), bandCol, valueCol)
      .filter(col(valueCol).isNotNull)
  }
}
