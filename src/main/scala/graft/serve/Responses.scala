package graft.serve

/** Response shapes mirroring the reference's Pydantic models
  * (`app/models/responses.py:1-129`). Collected driver-side at the serving
  * edge only — everything upstream of these is a DataFrame.
  *
  * PRECISION NOTE: served aggregation values are GENERAL-PRECISION double
  * means (pandas `.resample().mean()` parity — the reference serves raw
  * floats, unrounded), while the contract/oracle queries compute round-6
  * means in exact integer space (`ResampleOps.microMeanHalfUp`) for
  * cross-engine bit-identity. On a bucket whose mean is an exactly-halfway
  * 7-decimal rational the two paths differ by up to one unit of the 6th
  * decimal — by design, pinned with a live fixture in HttpApiSpec
  * ("exact-halfway bucket"). */
object Responses {

  /** One (iso-timestamp, value) point (`responses.py:32-36`). */
  final case class TimeseriesPoint(timestamp: String, value: Double)

  /** `/timeseries/broadband` envelope (`responses.py:39-49`): empty results
    * are SUCCESS with point_count=0 (SURVEY §7.5.7). */
  final case class BroadbandTimeseriesResponse(
      hydrophone: String, startTime: String, endTime: String, deltaT: Int,
      pointCount: Long, expectedPointCount: Long, points: Seq[TimeseriesPoint])

  /** `/timeseries/psd` matrix envelope (`responses.py:120-129`). */
  final case class PsdMatrixResponse(
      hydrophone: String, startTime: String, endTime: String,
      deltaT: Int, deltaF: String,
      times: Seq[String], frequencies: Seq[Double], values: Seq[Seq[Double]])

  /** One aggregated bucket point. */
  final case class AggregationPoint(timestamp: String, value: Double, count: Long)

  /** `/aggregations/broadband` envelope. */
  final case class BroadbandAggregationResponse(
      hydrophone: String, interval: String, pointCount: Long,
      points: Seq[AggregationPoint])

  /** `/aggregations/psd` heatmap envelope. */
  final case class PsdHeatmapResponse(
      hydrophone: String, interval: String,
      times: Seq[String], frequencies: Seq[Double], values: Seq[Seq[Double]])

  /** `/aggregations/daily-summary`: four parallel typical-day series
    * (`get_aggregations.py:310-396`). */
  final case class DailySummarySeries(labels: Seq[String], mean: Seq[Double],
      min: Seq[Double], max: Seq[Double], count: Seq[Double])
  final case class DailySummaryResponse(
      hydrophone: String, interval: String, bandLow: Double, bandHigh: Double,
      series: DailySummarySeries)

  /** `/aggregations/daily-broadband-summary`. */
  final case class DailyBroadbandResponse(
      hydrophone: String, days: Seq[String], values: Seq[Double])

  /** `/options` coverage entry + envelope (`responses.py:10-29`). */
  final case class CoverageOption(freqType: String, deltaF: Option[Int],
      deltaT: Int, firstStart: Option[String], lastEnd: Option[String],
      fileCount: Long)
  final case class HydrophoneOptions(hydrophone: String, options: Seq[CoverageOption])
  final case class OptionsResponse(hydrophones: Seq[HydrophoneOptions])
}
