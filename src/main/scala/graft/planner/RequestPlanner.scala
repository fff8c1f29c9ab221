package graft.planner

import java.time.Instant
import graft.ops.ResampleOps

/** Error taxonomy mirroring the reference's HTTP mapping
  * (`app/api/timeseries.py:33-38`, `app/api/aggregations.py:45-50`;
  * SURVEY §7.5.6). A sealed ADT so a serving layer maps exhaustively. */
object Errors {
  sealed abstract class EngineError(msg: String) extends RuntimeException(msg)
  /** invalid request → HTTP 400 */
  final case class ValidationError(msg: String) extends EngineError(msg)
  /** catalog/options backend unavailable → HTTP 503 */
  final case class OptionsDependencyError(msg: String) extends EngineError(msg)
  /** upstream data lookup failed → HTTP 502 */
  final case class LookupError(msg: String) extends EngineError(msg)
  /** aggregation-stage failure (e.g. inconsistent chunk schemas) → HTTP 502 */
  final case class AggregationError(msg: String) extends EngineError(msg)
  /** files matched the window but produced no rows → integrity error
    * (ref `app/services/get_timeseries.py:223-229`) */
  final case class DataIntegrityError(msg: String) extends EngineError(msg)
}

/** Request-time planning rules that act BEFORE a Spark plan exists
  * (SURVEY §4.3): auto-interval selection, the point cap, window-sanity
  * checks. Pure arithmetic on request parameters — deliberately plain
  * Scala, not a Catalyst `Rule` (nothing here sees data).
  */
object RequestPlanner {

  /** Auto targets ≤ 1000 points; hard cap 2000 (ref `get_aggregations.py:40-41`). */
  val AutoTargetPoints = 1000L
  val MaxAggregationPoints = 2000L
  /** Raw timeseries window cap, days (ref `get_timeseries.py:19`). */
  val MaxRawWindowDays = 31L

  /** F9 — resolve `interval=auto`: finest interval whose estimated bucket
    * count `ceil(window / interval)` is ≤ 1000, else the coarsest; reject
    * windows shorter than the finest interval
    * (ref `_resolve_interval`, `app/services/get_aggregations.py:138-163`). */
  def resolveInterval(interval: String, start: Instant, end: Instant): String = {
    val windowSecs = end.getEpochSecond - start.getEpochSecond
    if (windowSecs <= 0)
      throw Errors.ValidationError(s"empty window [$start, $end)")
    interval match {
      case "auto" =>
        if (windowSecs < ResampleOps.IntervalSeconds("10s"))
          throw Errors.ValidationError(s"window shorter than 10s: ${windowSecs}s")
        ResampleOps.IntervalOrder
          .find(iv => estimatedPoints(start, end, iv) <= AutoTargetPoints)
          .getOrElse(ResampleOps.IntervalOrder.last)
      case iv if ResampleOps.IntervalSeconds.contains(iv) =>
        if (windowSecs < ResampleOps.IntervalSeconds(iv))
          throw Errors.ValidationError(
            s"window ${windowSecs}s shorter than interval $iv")
        iv
      case other => throw Errors.ValidationError(s"unknown interval '$other'")
    }
  }

  /** A9 applied to an interval label: `ceil(window / interval_seconds)`. */
  def estimatedPoints(start: Instant, end: Instant, interval: String): Long = {
    val secs = ResampleOps.IntervalSeconds(interval)
    val dur = end.getEpochSecond - start.getEpochSecond
    if (dur <= 0) 0L else (dur + secs - 1) / secs
  }

  /** O4 — the 2000-point cap ERRORS rather than truncates
    * (ref `:370-374,506-510,596-600`); never `limit()`. */
  def enforcePointCap(points: Long): Unit =
    if (points > MaxAggregationPoints)
      throw Errors.ValidationError(
        s"result would have $points points, exceeding cap $MaxAggregationPoints")

  /** Raw-window guard (ref `_load_timeseries_df`, `get_timeseries.py:43-53`). */
  def enforceRawWindow(start: Instant, end: Instant): Unit = {
    val days = (end.getEpochSecond - start.getEpochSecond) / 86400.0
    if (days > MaxRawWindowDays)
      throw Errors.ValidationError(f"raw window $days%.1f d exceeds $MaxRawWindowDays d cap")
  }

  /** F1 — hydrophone-name normalization (ref `get_options.py:22-26`). */
  def normalizeName(raw: String): String = {
    val s = raw.trim
    if (s.isEmpty) throw Errors.ValidationError("empty hydrophone name")
    s.toUpperCase.replace(" ", "_").replace("-", "_")
  }

  /** F2 — PSD `delta_f` selector: `"3oct"` → (octave_bands, 3);
    * `"500hz"` → (delta_hz, 500) (ref `_parse_psd_delta_f`,
    * `get_timeseries.py:84-98`). */
  private val DeltaFPattern = "^(\\d+)(oct|hz)$".r
  def parseDeltaF(raw: String): (String, Int) = raw.trim.toLowerCase match {
    case DeltaFPattern(n, "oct") => ("octave_bands", n.toInt)
    case DeltaFPattern(n, "hz")  => ("delta_hz", n.toInt)
    case other => throw Errors.ValidationError(s"bad delta_f selector '$other'")
  }
}
