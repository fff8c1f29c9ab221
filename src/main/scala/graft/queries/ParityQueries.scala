package graft.queries

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.ops._

/** The reference-parity operator surface (SURVEY §2), embodied as concrete
  * queries over the driver testdata. `events(ts, value)` plays the
  * broadband-series role; `event_type` and `user_id` play the band /
  * hydrophone partition roles (FIXTURES.md §5).
  *
  * Every query here has a DuckDB oracle in [[oracleSql]] with IDENTICAL
  * output column names and rounding (floating-point aggregates are rounded
  * to 6 decimals on both sides so summation-order noise cannot flip the
  * driver's hash compare).
  */
object ParityQueries {

  // Shared request-window constants (events spans 2024-01-01 → 2024-01-31).
  private val WStart = Instant.parse("2024-01-05T00:00:00Z")
  private val WEnd   = Instant.parse("2024-01-12T00:00:00Z")

  private def events(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1/P3/O1/F4 — raw window point extraction, start-inclusive/end-exclusive.
    "q_ts_points" -> ((s, dir) =>
      TimeseriesOps.windowFilter(events(s, dir), "ts", WStart, WEnd)
        .select(col("event_id"), col("ts"),
          TimeseriesOps.isoTs(col("ts")).as("iso_ts"), col("value"))
        .orderBy("event_id")),

    // A1 — broadband resample to 1h buckets (epoch == day aligned).
    "q_resample_broadband" -> ((s, dir) =>
      ResampleOps.resampleMean(events(s, dir), "ts", "value", "1h")
        .withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("bucket_start")),

    // A2 — per-band resample (long PSD form; event_type as band) on a 3-day window.
    "q_resample_bands" -> ((s, dir) =>
      ResampleOps.resampleBandsMean(
          TimeseriesOps.windowFilter(events(s, dir), "ts", WStart,
            Instant.parse("2024-01-08T00:00:00Z")),
          "ts", "event_type", "value", "5m")
        .withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("bucket_start", "band")),

    // P2/A3 — band-range filter (user_id as numeric band label) + per-ts mean.
    "q_band_range_mean" -> ((s, dir) =>
      BandOps.rowMeanAcrossBands(
          BandOps.bandRange(events(s, dir), "user_id", 30, 90), "ts", "value")
        .withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("ts")),

    // A4 — time-of-day summary: four stats per (HH:mm:ss, band) in one pass.
    "q_daily_summary" -> ((s, dir) =>
      DailySummaryOps.timeOfDaySummary(events(s, dir), "ts", "event_type", "value")
        .withColumn("mean_value", round(col("mean_value"), 6))
        .withColumn("min_value", round(col("min_value"), 6))
        .withColumn("max_value", round(col("max_value"), 6))
        .orderBy("tod", "band")),

    // A5 — re-anchored typical-day bucketing (15m buckets of second-of-day).
    "q_tod_bucket_mean" -> ((s, dir) =>
      DailySummaryOps.todBucketMean(events(s, dir), "ts", "value", 900)
        .withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("tod_bucket")),

    // A6 — daily broadband mean.
    "q_daily_broadband" -> ((s, dir) =>
      DailySummaryOps.dailyMean(events(s, dir), "ts", "value")
        .withColumn("mean_value", round(col("mean_value"), 6))
        .orderBy("day")),

    // A7 — inventory/coverage catalog (user_id×event_type as the product key).
    "q_catalog_inventory" -> ((s, dir) =>
      events(s, dir).groupBy(col("user_id"), col("event_type"))
        .agg(min("ts").as("first_start"), max("ts").as("last_end"),
             count(lit(1)).as("file_count"))
        .orderBy("user_id", "event_type")),

    // A8 — distinct + sort.
    "q_distinct_sorted" -> ((s, dir) =>
      events(s, dir).select("event_type").distinct().orderBy("event_type")),

    // A2+pivot — the serving-edge wide matrix (`/aggregations/psd` shape):
    // long per-band means pivoted to one column per band label.
    "q_psd_matrix" -> ((s, dir) =>
      events(s, dir)
        .groupBy(ResampleOps.bucket(col("ts"), "1d").as("bucket_start"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(round(avg(ResampleOps.nanToNull(col("value"))), 6))
        .orderBy("bucket_start")),

    // P4 — non-finite drop: synthesize NaN/Inf, then keep only finite values.
    "q_finite_filter" -> ((s, dir) => {
      val withBad = events(s, dir).withColumn("v",
        when(col("user_id") % 11 === 0, lit(Double.NaN))
          .when(col("user_id") % 13 === 0, lit(Double.PositiveInfinity))
          .otherwise(col("value")))
      TimeseriesOps.finiteOnly(withBad, "v")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_kept"), round(avg(col("v")), 6).as("mean_value"))
        .orderBy("event_type")
    }),

    // J3/U1 — last-wins chunk merge: two overlapping daily aggregates, the
    // later chunk (restricted to value<400) overrides on collision.
    "q_merge_lastwins" -> ((s, dir) => {
      val ev = events(s, dir)
      val c1 = DailySummaryOps.dailyMean(
          ev.filter(col("ts") < lit("2024-01-16 00:00:00")), "ts", "value")
        .withColumn("mean_value", round(col("mean_value"), 6))
      val c2 = DailySummaryOps.dailyMean(
          ev.filter(col("ts") >= lit("2024-01-10 00:00:00") && col("value") < 400),
          "ts", "value")
        .withColumn("mean_value", round(col("mean_value"), 6))
      MergeOps.lastWinsMerge(Seq(c1, c2), Seq("day")).orderBy("day")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "q_ts_points" ->
      """SELECT event_id, ts, strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_ts, value
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
        |ORDER BY event_id""".stripMargin,

    "q_resample_broadband" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket_start,
        |       round(avg(value), 6) AS mean_value, count(value) AS point_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_resample_bands" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS bucket_start,
        |       event_type AS band,
        |       round(avg(value), 6) AS mean_value, count(value) AS point_count
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_band_range_mean" ->
      """SELECT ts, round(avg(value), 6) AS mean_value
        |FROM events
        |WHERE CAST(user_id AS DOUBLE) >= 30 AND CAST(user_id AS DOUBLE) <= 90
        |GROUP BY ts ORDER BY ts""".stripMargin,

    "q_daily_summary" ->
      """SELECT strftime(ts, '%H:%M:%S') AS tod, event_type AS band,
        |       round(avg(value), 6) AS mean_value,
        |       round(min(value), 6) AS min_value,
        |       round(max(value), 6) AS max_value,
        |       count(value) AS point_count
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_tod_bucket_mean" ->
      """SELECT printf('%02d:%02d:%02d', CAST(b // 3600 AS INT),
        |              CAST((b % 3600) // 60 AS INT), CAST(b % 60 AS INT)) AS tod_bucket,
        |       round(avg(value), 6) AS mean_value
        |FROM (SELECT ((hour(ts) * 3600 + minute(ts) * 60 + second(ts)) // 900) * 900 AS b,
        |             value
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_daily_broadband" ->
      """SELECT CAST(ts AS DATE) AS day, round(avg(value), 6) AS mean_value,
        |       count(value) AS point_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_catalog_inventory" ->
      """SELECT user_id, event_type, min(ts) AS first_start, max(ts) AS last_end,
        |       count(*) AS file_count
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_distinct_sorted" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q_psd_matrix" ->
      """SELECT time_bucket(INTERVAL '1 day', ts) AS bucket_start,
        |       round(avg(value) FILTER (WHERE event_type = 'click'), 6) AS click,
        |       round(avg(value) FILTER (WHERE event_type = 'error'), 6) AS error,
        |       round(avg(value) FILTER (WHERE event_type = 'purchase'), 6) AS purchase,
        |       round(avg(value) FILTER (WHERE event_type = 'signup'), 6) AS signup,
        |       round(avg(value) FILTER (WHERE event_type = 'view'), 6) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_finite_filter" ->
      """WITH bad AS (
        |  SELECT event_type,
        |         CASE WHEN user_id % 11 = 0 THEN CAST('NaN' AS DOUBLE)
        |              WHEN user_id % 13 = 0 THEN CAST('Infinity' AS DOUBLE)
        |              ELSE value END AS v
        |  FROM events)
        |SELECT event_type, count(*) AS n_kept, round(avg(v), 6) AS mean_value
        |FROM bad WHERE isfinite(v)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_merge_lastwins" ->
      """WITH c1 AS (
        |  SELECT CAST(ts AS DATE) AS day, round(avg(value), 6) AS mean_value,
        |         count(value) AS point_count
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY 1),
        |c2 AS (
        |  SELECT CAST(ts AS DATE) AS day, round(avg(value), 6) AS mean_value,
        |         count(value) AS point_count
        |  FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND value < 400 GROUP BY 1),
        |u AS (SELECT *, 0 AS chunk FROM c1 UNION ALL SELECT *, 1 AS chunk FROM c2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY day ORDER BY chunk DESC) AS rn FROM u)
        |SELECT day, mean_value, point_count FROM r WHERE rn = 1 ORDER BY day""".stripMargin,
  )
}
