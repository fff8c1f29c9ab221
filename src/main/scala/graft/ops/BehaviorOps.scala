package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over an event stream — funnel conversion,
  * cohort retention, robust outlier flagging. The product-analytics
  * trio every event warehouse serves (the Amplitude/Mixpanel shape),
  * expressed as plain grouped aggregates and same-key joins so Catalyst
  * keeps everything in a handful of hash exchanges.
  *
  * Scale notes, common to all three:
  *  - every stage aggregates BY USER first (map-side combinable), so
  *    the shuffled row count is O(users), never O(events);
  *  - the stage-to-stage joins are all on the user key the previous
  *    aggregate just shuffled on — one partitioning reused across the
  *    chain, no broadcast needed at any corpus size;
  *  - no windows: a window over (user, ts) would sort every event, and
  *    funnel/retention only need per-user minima.
  */
object BehaviorOps {

  /** Strictly-ordered 3-stage funnel: for each user, the first
    * `stage1` event, the first `stage2` event AFTER it, and the first
    * `stage3` event after THAT (classic first-touch funnel semantics —
    * re-entries don't reset progress). Returns one row per user who
    * entered the funnel: `(user, t1, t2, t3)` with nullable t2/t3.
    *
    * Shape: one conditional aggregate for t1 (single scan), then for
    * each later stage one filtered aggregate joined back on the user
    * key — `k` stages cost `k` same-key exchanges, not a sort. */
  def funnel3(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, stage1: String, stage2: String,
              stage3: String): DataFrame = {
    val u = col(userCol)
    // each stage frame is used twice (next stage's join + the final
    // assembly) and ReuseExchange does NOT dedupe them (the inner-join
    // use acquires pushed filters the left-join use lacks), so without
    // pinning, a k-stage funnel re-scans the event table 2(k−1) times.
    // localCheckpoint(true) caps it at k scans; the pinned frames are
    // O(users) rows of (key, timestamp) — executor-storage scale, the
    // same call pageRank makes per round.
    val entered = events
      .groupBy(u.as("user"))
      .agg(min(when(col(typeCol) === stage1, col(tsCol))).as("t1"))
      .filter(col("t1").isNotNull)
      .localCheckpoint(true)
    val s2 = events.filter(col(typeCol) === stage2)
      .select(u.as("user"), col(tsCol).as("ts2"))
      .join(entered, "user")
      .filter(col("ts2") > col("t1"))
      .groupBy("user").agg(min(col("ts2")).as("t2"))
      .localCheckpoint(true)
    val s3 = events.filter(col(typeCol) === stage3)
      .select(u.as("user"), col(tsCol).as("ts3"))
      .join(s2, "user")
      .filter(col("ts3") > col("t2"))
      .groupBy("user").agg(min(col("ts3")).as("t3"))
    entered.join(s2, Seq("user"), "left").join(s3, Seq("user"), "left")
  }

  /** Day-grain cohort retention: cohort = each user's first active day,
    * offset = days since cohort day; emits
    * `(cohort_day, day_offset, n_active)` — the retention matrix.
    * Distinct (user, day) first, so a user's 1000 events on one day
    * count once and the join input is O(users × active days). */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cohort = active.groupBy("user").agg(min(col("day")).as("cohort_day"))
    active.join(cohort, "user")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Robust per-group outlier summary via the median/MAD rule (Iglewicz
    * & Hoaglin 1993): a value is an outlier when
    * `|v − median| > cut · 1.4826 · MAD` (1.4826 ≈ 1/Φ⁻¹(3/4) makes MAD
    * a consistent σ estimate). Mean/stddev z-scores let one wild value
    * drag the threshold toward itself; the median pair doesn't.
    *
    * Determinism discipline: values quantize to integer micro-units
    * BEFORE the percentiles, so both engines interpolate over identical
    * exact integers — medians land on exact halves, |v−med| on exact
    * halves, and the comparison sees bit-identical doubles on both
    * sides (the 013aa67 nano-unit rule applied to order statistics).
    * Exact `percentile` sorts per group — right for grouped telemetry;
    * the sketch path for a single monster group is q_quantile_sketch.
    * Order statistics force a multi-pass shape (median → deviations →
    * MAD → flag); a production caller persists the deviation frame to
    * pay one source scan + one cached re-read instead of two scans.
    *
    * Returns `(group, n, med, mad, n_outliers)` in original units. */
  def madOutlierSummary(df: DataFrame, groupCol: String, valCol: String,
                        cut: Double = 3.0): DataFrame = {
    val g = col(groupCol)
    val micro = df.select(g.as("g"),
      round(col(valCol) * 1e6, 0).cast("long").as("mv"))
    val med = micro.groupBy("g")
      .agg(expr("percentile(mv, 0.5)").as("med_micro"),
           count(lit(1)).as("n"))
    val dev = micro.join(med, "g")
      .withColumn("ad", abs(col("mv") - col("med_micro")))
    val mad = dev.groupBy("g")
      .agg(expr("percentile(ad, 0.5)").as("mad_micro"))
    dev.join(mad, "g")
      .groupBy(col("g"), col("med_micro"), col("n"), col("mad_micro"))
      .agg(sum(when(col("ad") > lit(cut * 1.4826) * col("mad_micro"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col("g").as(groupCol), col("n"),
        round(col("med_micro") / 1e6, 6).as("med"),
        round(col("mad_micro") / 1e6, 6).as("mad"),
        col("n_outliers"))
  }

  /** Last-touch attribution: every `purchase` row credited to the same
    * user's most recent NON-purchase event within `lookbackHours`,
    * else `'direct'`. One window per user ordered by `(ts, event_id)`
    * — the only exception to this file's no-window rule, because
    * attribution genuinely needs the previous row, and the window state
    * is bounded by one user's history (the q_top_paths contract), never
    * global. The ignore-nulls `last()` carries the latest touchpoint's
    * type and time past intervening purchases, so a purchase chain
    * attributes every purchase to the same preceding touch (industry
    * semantics), not to the previous purchase.
    *
    * Returns the purchase rows with `channel` attached; callers
    * aggregate. */
  def attributeLastTouch(events: DataFrame, userCol: String,
      typeCol: String, tsCol: String, tieCol: String, valueCol: String,
      lookbackHours: Long): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(W.unboundedPreceding, -1)
    events
      .withColumn("touch_type", last(
        when(col(typeCol) =!= "purchase", col(typeCol)),
        ignoreNulls = true).over(w))
      .withColumn("touch_ts", last(
        when(col(typeCol) =!= "purchase", col(tsCol)),
        ignoreNulls = true).over(w))
      .filter(col(typeCol) === "purchase")
      .withColumn("channel",
        when(col("touch_ts").isNotNull &&
          unix_micros(col(tsCol)) - unix_micros(col("touch_ts")) <=
            lit(lookbackHours * 3600L * 1000000L),
          col("touch_type")).otherwise(lit("direct")))
      .select(col(userCol), col(tsCol), col("channel"), col(valueCol))
  }
}
