package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.BehaviorOps

/** Hand-case pins for the behavioral analytics trio
  * ([[graft.ops.BehaviorOps]]): funnel stage ordering, retention
  * offsets, and the median/MAD outlier rule — the semantics the DuckDB
  * oracles restate, pinned here on inputs small enough to check by
  * eye. */
class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel3: strict after-previous-stage ordering, first-touch, no reset") {
    import spark.implicits._
    val ev = Seq(
      // u1 converts fully; the pre-view click at 09:00 must NOT count
      (1L, "click", "2024-01-01 09:00:00"),
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "click", "2024-01-01 12:00:00"), // later click ignored (first-touch)
      (1L, "purchase", "2024-01-01 13:00:00"),
      // u2 purchases BEFORE its first post-view click → stage 3 not reached
      (2L, "view", "2024-01-02 10:00:00"),
      (2L, "purchase", "2024-01-02 11:00:00"),
      (2L, "click", "2024-01-02 12:00:00"),
      // u3 never views → not in the funnel at all
      (3L, "click", "2024-01-03 10:00:00"),
      (3L, "purchase", "2024-01-03 11:00:00"))
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"), col("s").cast("timestamp").as("ts"))
    val got = BehaviorOps.funnel3(ev, "user_id", "event_type", "ts",
        "view", "click", "purchase")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)))).toSet
    assert(got == Set(
      (1L, ts("2024-01-01 10:00:00"), Some(ts("2024-01-01 11:00:00")),
        Some(ts("2024-01-01 13:00:00"))),
      (2L, ts("2024-01-02 10:00:00"), Some(ts("2024-01-02 12:00:00")), None)))
  }

  test("cohortRetention: offsets from first active day; within-day dedup") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 08:00:00"), (1L, "2024-01-01 09:00:00"), // one active day
      (1L, "2024-01-03 09:00:00"),
      (2L, "2024-01-01 23:59:59"), (2L, "2024-01-02 00:00:01"),
      (3L, "2024-01-02 12:00:00"))
      .toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = BehaviorOps.cohortRetention(ev, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      ("2024-01-01", 0L, 2L),  // u1+u2 day-0
      ("2024-01-01", 1L, 1L),  // u2 on Jan 2
      ("2024-01-01", 2L, 1L),  // u1 on Jan 3
      ("2024-01-02", 0L, 1L))) // u3's own cohort
  }

  test("madOutlierSummary: hand median/MAD; one wild value flagged, not absorbing") {
    import spark.implicits._
    // values 1..9 plus a 1000 spike: median 5.5, deviations
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} → MAD 2.5;
    // cutoff 3·1.4826·2.5 = 11.1195 → only the spike exceeds it.
    // (A mean/stddev z-score would put the cutoff past 900 — the spike
    // dragging the threshold is exactly what MAD resists.)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0)
      .map(("g", _)).toDF("grp", "value")
    val r = BehaviorOps.madOutlierSummary(df, "grp", "value").collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 10L)               // n
    assert(r(0).getDouble(2) == 5.5)             // med
    assert(r(0).getDouble(3) == 2.5)             // mad
    assert(r(0).getLong(4) == 1L)                // n_outliers: the spike only
  }

  test("q_acf: correlations bounded, every type × lag populated, " +
      "pair counts shrink with lag") {
    val rows = SparkEntry.queries("q_acf")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, lag, n, acf) =>
      assert(lag >= 1 && lag <= 3)
      assert(n > 0, s"$et lag $lag has no pairs")
      assert(acf >= -1.0 && acf <= 1.0, s"$et lag $lag acf $acf")
    }
    // a lag-L pair needs BOTH hours present: on a gapped series the
    // lag-1 pair count weakly dominates any longer lag's... per type
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val byLag = rs.map(r => r._2 -> r._3).toMap
      assert(byLag.keySet == Set(1, 2, 3), s"$et missing a lag")
    }
  }

  test("q_seasonal_decomp: additive identity, complete windows only, " +
      "per-dow residuals cancel") {
    val rows = SparkEntry.queries("q_seasonal_decomp")(
        spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getDate(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // 30 days of events, 7-day centered window ⇒ exactly 24 full frames
    assert(rows.length == 24)
    rows.foreach { case (d, x, t, s0, res) =>
      // x = trend + seasonal + residual up to the three 1e-6 roundings
      assert(math.abs(x - (t + s0 + res)) < 5e-6,
        s"$d additive identity broke: $x vs ${t + s0 + res}")
    }
    // seasonal is the per-dow mean of detrended ⇒ residuals sum to ~0
    // within each dow (exact in rationals; ≤ n·1e-6 after rounding)
    val cal = java.util.Calendar.getInstance(
      java.util.TimeZone.getTimeZone("UTC"))
    rows.groupBy { case (d, _, _, _, _) =>
      cal.setTime(d); cal.get(java.util.Calendar.DAY_OF_WEEK)
    }.foreach { case (dow, rs) =>
      val s = rs.map(_._5).sum
      assert(math.abs(s) < rs.length * 2e-6,
        s"dow $dow residual sum $s not ~0")
    }
  }

  test("q_changepoint: one peak per type, peak dominates, CUSUM " +
      "closes at zero") {
    val rows = SparkEntry.queries("q_changepoint")(
        spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val peaks = rs.filter(_._4 == 1)
      assert(peaks.length == 1, s"$et has ${peaks.length} peaks")
      val pk = math.abs(peaks.head._3)
      rs.foreach { r => assert(math.abs(r._3) <= pk + 1e-9,
        s"$et day ${r._2} |cusum| ${math.abs(r._3)} exceeds peak $pk") }
      // Σ over the whole series of (x_i − mean) telescopes to exactly 0
      val last = rs.maxBy(_._2.getTime)
      assert(last._3 == 0.0, s"$et final CUSUM ${last._3} ≠ 0")
    }
  }

  test("q_theilsen: pair counts are exactly C(days,2) per type; " +
      "slopes finite and modest on the stationary corpus") {
    val rows = SparkEntry.queries("q_theilsen")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    val days = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"), to_date(col("ts")).as("d")).distinct()
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (et, np, slope) =>
      val d = days(et)
      assert(np == d * (d - 1) / 2, s"$et pairs $np ≠ C($d,2)")
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }

  test("q_benford: all nine digits, probabilities close, counts " +
      "partition the orders table") {
    val rows = SparkEntry.queries("q_benford")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1 to 9))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    val nOrders = graft.tables.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(_._2).sum == nOrders)
  }

  test("q_ab_welch: cohorts partition each type, dof inside the Welch " +
      "bracket, parity split shows no phantom effect") {
    val rows = SparkEntry.queries("q_ab_welch")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val totals = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (et, na, nb, _, t, dof) =>
      assert(na + nb == totals(et), s"$et cohorts don't partition")
      // Welch dof ∈ [min(nA,nB)−1, nA+nB−2]
      assert(dof >= math.min(na, nb) - 1 && dof <= na + nb - 2,
        s"$et dof $dof outside bracket")
      // user-id parity is independent of value: a |t| that clears ~5
      // on this null split would mean the moment math is broken
      assert(math.abs(t) < 5.0, s"$et phantom effect t=$t")
    }
  }

  test("q_ols_trend: R² in [0,1], finite fit, month counts match the " +
      "per-nation distinct-month rollup") {
    val rows = SparkEntry.queries("q_ols_trend")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val months = graft.tables.Tables.orders(spark, TestSpark.Sf0001)
      .join(graft.tables.Tables.customer(spark, TestSpark.Sf0001),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), trunc(col("o_orderdate"), "month").as("m"))
      .distinct().groupBy("c_nationkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (nk, n, slope, icept, r2) =>
      assert(n == months(nk), s"nation $nk months $n ≠ ${months(nk)}")
      assert(r2 >= 0.0 && r2 <= 1.0, s"nation $nk r2 $r2 outside [0,1]")
      assert(!slope.isNaN && !icept.isNaN)
    }
  }

  test("q_chi2_indep: observed and expected both partition the orders " +
      "table; contributions non-negative") {
    val rows = SparkEntry.queries("q_chi2_indep")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nOrders = graft.tables.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(_._3).sum == nOrders)
    // marginal construction forces Σ expected == Σ observed exactly
    assert(math.abs(rows.map(_._4).sum - nOrders.toDouble) < 1e-3)
    rows.foreach { case (p, st, _, e, c) =>
      assert(e > 0.0, s"($p,$st) zero expected")
      assert(c >= 0.0, s"($p,$st) negative contribution")
    }
  }

  test("q_rank_ztest: rank sums partition N(N+1)/2, groups partition N, " +
      "null split shows no phantom effect") {
    val rows = SparkEntry.queries("q_rank_ztest")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    assert(n == graft.tables.Tables.events(spark, TestSpark.Sf0001).count())
    // mid-ranks are a rank assignment: group rank sums partition the
    // total rank mass exactly (ties redistribute within, never across)
    assert(math.abs(rows.map(_._3).sum - n.toDouble * (n + 1) / 2) < 1e-6,
      s"rank sums ${rows.map(_._3).sum} ≠ N(N+1)/2")
    rows.foreach { case (et, _, _, mr, z) =>
      assert(mr > 0 && mr < n, s"$et mean rank $mr outside (0,N)")
      // event_type is independent of value on the synthetic corpus
      assert(math.abs(z) < 5.0, s"$et phantom effect z=$z")
    }
  }

  test("q_l_diversity: classes partition customers; entropy inside " +
      "[0, ln 3]; l_ok iff all three bands present") {
    val rows = SparkEntry.queries("q_l_diversity")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    val nCust = graft.tables.Tables.customer(spark, TestSpark.Sf0001).count()
    assert(rows.map(_._3).sum == nCust, "classes don't partition customers")
    rows.foreach { case (seg, nk, n, l, h, ok) =>
      assert(l >= 1 && l <= 3, s"($seg,$nk) l=$l")
      assert(h >= -1e-9 && h <= math.log(3.0) + 1e-9,
        s"($seg,$nk) entropy $h outside [0, ln 3]")
      assert(ok == (l == 3), s"($seg,$nk) l_ok inconsistent")
      // entropy-l criterion coherence: 1 distinct value ⇒ entropy 0
      if (l == 1) assert(math.abs(h) < 1e-9, s"($seg,$nk) l=1 but h=$h")
      assert(n >= l, s"($seg,$nk) fewer rows than distinct bands")
    }
  }

  test("attributeLastTouch: 24h gate, carry past purchases, direct " +
      "fallback — hand case") {
    import spark.implicits._
    val ev = Seq(
      // u1: view 10:00 → purchase 11:00 (view), purchase 12:00 must
      // ALSO credit the view (carry past the intervening purchase)
      (1L, "view", "2024-01-01 10:00:00", 1L, 10.0),
      (1L, "purchase", "2024-01-01 11:00:00", 2L, 20.0),
      (1L, "purchase", "2024-01-01 12:00:00", 3L, 30.0),
      // u1: click 13:00 supersedes the view for the 14:00 purchase
      (1L, "click", "2024-01-01 13:00:00", 4L, 0.0),
      (1L, "purchase", "2024-01-01 14:00:00", 5L, 40.0),
      // u2: touch 25h before the purchase → outside the gate → direct
      (2L, "click", "2024-01-01 09:00:00", 6L, 0.0),
      (2L, "purchase", "2024-01-02 10:00:00", 7L, 50.0),
      // u3: no touch at all → direct
      (3L, "purchase", "2024-01-01 10:00:00", 8L, 60.0)
    ).map { case (u, t, s, id, v) => (u, t, ts(s), id, v) }
      .toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = BehaviorOps.attributeLastTouch(ev, "user_id", "event_type",
        "ts", "event_id", "value", lookbackHours = 24)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        r.getString(2), r.getDouble(3)))
      .map { case (u, t, c, v) => (u, t.toString, c) -> v }.toMap
    assert(got == Map(
      (1L, "2024-01-01 11:00:00.0", "view") -> 20.0,
      (1L, "2024-01-01 12:00:00.0", "view") -> 30.0,
      (1L, "2024-01-01 14:00:00.0", "click") -> 40.0,
      (2L, "2024-01-02 10:00:00.0", "direct") -> 50.0,
      (3L, "2024-01-01 10:00:00.0", "direct") -> 60.0), got.toString)
  }

  test("q_gini: counts partition orders, gini in [0,1), and one class " +
      "matches an independent sorted-values recompute") {
    val rows = SparkEntry.queries("q_gini")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val nOrders = graft.tables.Tables.orders(spark, TestSpark.Sf0001).count()
    assert(rows.map(_._2).sum == nOrders)
    rows.foreach { case (p, _, mean, g) =>
      assert(g >= 0.0 && g < 1.0, s"$p gini $g outside [0,1)")
      assert(mean > 0.0, s"$p non-positive mean")
    }
    // independent recompute for the first class: mid-rank Gini over the
    // sorted cent values (the textbook formula the query restates)
    val p0 = rows.head._1
    val vs = graft.tables.Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderpriority") === p0)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length.toDouble
    // mid-ranks: average 1-based rank among equal values
    val byV = vs.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map(_._2 + 1).sum.toDouble / xs.length }
    val srx = vs.map(v => byV(v) * v).sum
    val exp = 2 * srx / (n * vs.map(_.toDouble).sum) - (n + 1) / n
    assert(math.abs(rows.head._4 - exp) < 1e-6,
      s"$p0 gini ${rows.head._4} vs recompute $exp")
  }

  test("q_ewma_smooth: a type's first day has ewma ≡ raw_mean; smoothing " +
      "stays inside the window's raw range") {
    val rows = SparkEntry.queries("q_ewma_smooth")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, rs) =>
      val sorted = rs.sortBy(_._2)
      // weight renormalization: a window of one day IS that day
      assert(sorted.head._3 == sorted.head._4,
        s"$et first-day ewma ${sorted.head._4} ≠ raw ${sorted.head._3}")
      // convexity: the weighted mean of window raws can't escape them
      val raws = sorted.map(_._3)
      sorted.zipWithIndex.foreach { case ((_, _, _, e), i) =>
        val win = raws.slice(math.max(0, i - 7), i + 1)
        assert(e >= win.min - 1e-4 && e <= win.max + 1e-4,
          s"$et ewma $e escapes window [${win.min}, ${win.max}]")
      }
    }
  }
}
