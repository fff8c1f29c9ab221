package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.dedup.DedupOps

/** Statistical / analytical extensions beyond the reference surface:
  * exact percentiles, distinct cardinalities, duplicate-cluster resolution
  * (connected components over near-dup pairs), heavy-hitter shingles.
  */
object StatsQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact interpolated percentiles per group (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation).
    "q_percentiles" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
             round(expr("percentile(value, 0.95)"), 6).as("p95"),
             round(stddev_pop(col("value")), 6).as("sd"))
        .orderBy("event_type")),

    // Exact distinct cardinality per group (shuffle-dedup; the sketch
    // alternative that avoids the per-key shuffle is q_hll_distinct).
    "q_count_distinct" -> ((s, dir) =>
      Tables.events(s, dir).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
             count(lit(1)).as("n_events"))
        .orderBy("event_type")),

    // Duplicate-cluster resolution: connected components over the exact
    // near-dup pair graph; keeper = min doc_id per component. Pair graph
    // via the prefix-filtered join (bit-identical to naive, DedupSpec pins
    // it) — the contract runs the skew-safe formulation everywhere.
    "q_dedup_clusters" -> ((s, dir) => {
      val pairs = DedupOps.ngramJaccardPairsPrefix(
        Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      DedupOps.duplicateClusters(pairs).orderBy("doc_id")
    }),

    // Dedup QA: duplicate-cluster size distribution over the same
    // near-dup graph (FineWeb-style dedup diagnostics) — a fat tail
    // means boilerplate families, all-2s means noise trimming.
    "q_dedup_cluster_sizes" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = DedupOps.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      DedupOps.clusterSizeHistogram(d, "doc_id", pairs)
    }),

    // Duplicate-cluster resolution, KEEP-BEST variant: production dedup
    // keeps the best copy of each family, not the smallest id — here
    // "best" = longest text (tie → smallest doc_id), the common
    // keep-the-most-complete-copy policy. Same CC machinery; the keeper
    // pick is a row_number window PARTITIONED BY cluster (bounded by
    // family size, never global).
    "q_dedup_keep_best" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables.documents(s, dir)
      val pairs = DedupOps.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      val clusters = DedupOps.duplicateClusters(pairs)
      val keyed = d.select(col("doc_id"), length(col("text")).cast("long").as("text_len"))
        .join(clusters, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("text_len").desc, col("doc_id").asc)
      keyed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cluster_id"), col("text_len"))
        .orderBy("doc_id")
    }),

    // Leakage-aware train/val split: q_train_split hashes each DOC into
    // a fold, which lets a near-duplicate pair straddle train/val — the
    // classic eval-contamination leak (Lee et al. 2022 measured the
    // inflation). This splits by GROUP: every doc's fold key is its
    // near-dup CLUSTER id (own id for singletons), so a whole duplicate
    // family lands on one side by construction. Same CC machinery as
    // q_dedup_clusters (one extra left join against the cluster frame —
    // doc-keyed shuffle, AQE-handled); DedupSpec pins that no near-dup
    // pair crosses the fold boundary.
    "q_group_split" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = DedupOps.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b"))
      val clusters = DedupOps.duplicateClusters(pairs)
      d.select(col("doc_id"))
        .join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("gkey"))
        .withColumn("split",
          when(substring(md5(col("gkey").cast("string").cast("binary")), 1, 1)
            === "f", "val").otherwise("train"))
        .orderBy("doc_id")
    }),

    // Heavy hitters: the most document-frequent 3-gram shingles (exact
    // count, rank-limited with deterministic tie-break).
    "q_top_shingles" -> ((s, dir) => {
      val df = DedupOps.shingleSets(Tables.documents(s, dir), "doc_id", "text", 3)
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      df.orderBy(col("df").desc, col("shingle")).limit(20)
    }),

    // ANALYZE-style table statistics in one pass (CBO inputs / data-quality
    // profile): min/max/nulls/ndv per key column.
    "q_table_stats" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        graft.ops.ResampleOps.meanOf(col("l_quantity"), exactMilli = true)
          .as("avg_qty"),
        countDistinct(col("l_orderkey")).as("ndv_orderkey"),
        countDistinct(col("l_partkey")).as("ndv_partkey"),
        sum(col("l_tax").isNull.cast("long")).as("nulls_tax"),
        min(col("l_shipdate")).as("min_shipdate"),
        max(col("l_shipdate")).as("max_shipdate"))
    }),

    // Referential-integrity audit: FK violations across the star schema
    // (anti-join counts). Built LAZILY — a union of aggregated anti-joins,
    // no driver-side count() at plan-construction time.
    "q_fk_integrity" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val li = Tables.lineitem(s, dir)
      val orphanLines = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .withColumn("check", lit("lineitems_without_order"))
      val orphanOrders = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .withColumn("check", lit("orders_without_customer"))
      orphanLines.unionByName(orphanOrders)
        .select("check", "violations").orderBy("check")
    }),

    // dB-energy daily mean (SURVEY §7.6): 10·log10(mean(10^(v/10))) — the
    // physically-correct power mean the reference's upstream keeps internal.
    // Values are rescaled (v/50) so 10^x stays in double range.
    "q_db_energy_mean" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("p", pow(lit(10.0), col("value") / 500.0))
        .groupBy(to_date(col("ts")).as("day"))
        .agg(round(lit(10.0) * log(10.0, avg(col("p"))), 6).as("db_energy"),
             count(lit(1)).as("n"))
        .orderBy("day")),

    // Semi-structured extraction: JSON props column → typed bucket agg
    // (codegen'd get_json_object; at scale prefer from_json once per row
    // into a struct column at ingest).
    "q_json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          graft.ops.ResampleOps.meanOf(col("value"), exactMilli = true)
            .as("mean_value"))
        .orderBy("k_bucket")),

    // Declarative data-quality audit (the dbt-tests / Deequ shape): a
    // rule set — null keys, duplicate keys, value range, event-time
    // domain, categorical domain — evaluated in ONE scan as conditional
    // aggregates (plus one 16-byte-hash aggregate for the uniqueness
    // rule), emitting a (rule, n_violations) report. At 100 TB the
    // whole audit costs one pass however many rules there are; the
    // anti-pattern is one scan per rule.
    "q_dq_audit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dupes = ev.groupBy(col("event_id")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1)
        .agg(coalesce(sum(col("c")), lit(0L)).as("n"))
        .select(lit("duplicate_event_id").as("rule"), col("n"))
      val onePass = ev.agg(
          sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("null_key"),
          // bounds chosen so the rules actually FIRE on this archive
          // (value max ~490; 'error' events sit outside the allowed
          // domain) — an audit whose rules can't trip proves nothing
          sum(when(col("value") < 0 || col("value") > 400, 1L)
            .otherwise(0L)).as("value_range"),
          sum(when(col("ts") < lit("2024-01-01 00:00:00").cast("timestamp") ||
                   col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp"),
            1L).otherwise(0L)).as("ts_domain"),
          sum(when(!col("event_type").isin(
            "click", "view", "purchase", "signup"), 1L)
            .otherwise(0L)).as("type_domain"))
      onePass.select(explode(map(
          lit("null_key"), col("null_key"),
          lit("value_range"), col("value_range"),
          lit("ts_domain"), col("ts_domain"),
          lit("type_domain"), col("type_domain"))).as(Seq("rule", "n")))
        .unionByName(dupes)
        .orderBy("rule")
    }),

    // Malformed-input quarantine: every 50th row's JSON props is
    // corrupted in flight (deterministic stand-in for the bad records
    // every 100 TB feed contains), and the pipeline must neither die
    // (`get_json_object` is null-on-malformed — never throw-on-row, the
    // ANSI-mode trap) nor silently drop: bad rows route to a visible
    // `quarantined` bucket with full counts while good rows aggregate
    // normally. One bad record in a 6-hour job is triage material, not
    // a job kill. Oracle guards the same parse with json_valid.
    "q_quarantine" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("p", when(col("event_id") % 50 === 0,
          concat(lit("{oops"), col("props"))).otherwise(col("props")))
        .withColumn("k", get_json_object(col("p"), "$.k").cast("int"))
        .withColumn("status",
          when(col("k").isNull, "quarantined").otherwise("ok"))
        .groupBy(col("status"), (col("k") % 10).as("k_bucket"))
        // integer micro-unit mean (the dailyRollup discipline): a raw
        // double avg's last ulp is aggregation-order dependent across
        // engines, and a group mean landing on a 0.5e-6 rounding boundary
        // would flip the hash compare intermittently
        .agg(count(lit(1)).as("n"),
          round(sum(round(col("value") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("mean_value"))
        .orderBy(col("status"), asc_nulls_first("k_bucket"))),

    // Gap detection (SURVEY §2.5 extension): per-user inter-event gaps > 1h.
    "q_gap_report" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_usecs",
          unix_micros(col("ts")) - unix_micros(col("prev_ts")))
        .filter(col("gap_usecs") > 3600L * 1000000L)
        .select(col("user_id"), col("prev_ts").as("gap_start"),
          col("ts").as("gap_end"), col("gap_usecs"))
        .orderBy("user_id", "gap_start")
    }),

    // Rolling aggregation with a RANGE frame: trailing-6h mean per user at
    // every event (event-time range, not row count). Partitioned by user —
    // never a global single-partition window.
    "q_moving_avg" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-6L * 3600 * 1000000, 0)
      // exact-milli over the RANGE frame too: the windowed sum carries
      // milli longs and the round-6 mean is the shared integer HALF_UP
      val sM = sum(round(col("value") * 1000, 0).cast("long")).over(w)
      val cN = count(col("value")).over(w)
      Tables.events(s, dir)
        .withColumn("trailing_6h_avg",
          graft.ops.ResampleOps.microMeanHalfUp(sM, cN).cast("double") / 1e6)
        .withColumn("trailing_6h_n", cN)
        .select("event_id", "user_id", "ts", "trailing_6h_avg", "trailing_6h_n")
        .orderBy("event_id")
    }),

    // Fixed-width histogram of the value distribution (20 × 25-unit bins).
    "q_histogram" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(floor(col("value") / 25).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          graft.ops.ResampleOps.meanOf(col("value"), exactMilli = true)
            .as("bin_mean"))
        .orderBy("bin")),

    // Native session windows (batch mode): same 30-min-gap semantics as
    // q_sessionize but via Spark's session_window operator; the oracle
    // reconstructs the windows from the gap formulation.
    "q_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")),

    // Sessionization: 30-minute-inactivity sessions per user via running
    // sum over gap markers; one shuffle on user_id.
    "q_sessionize" -> ((s, dir) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val marked = Tables.events(s, dir)
        .withColumn("gap", when(
          unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(byUser)) > 1800L * 1000000L, 1)
          .otherwise(0))
        .withColumn("session_id", sum(col("gap")).over(
          byUser.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      marked.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_id")
    }),

    // Count-Min-Sketch frequency audit over the corpus bigram stream: one
    // pass builds the native depth×width counter matrix (CmsSketchAgg —
    // fixed 16 KiB buffer, map-side combined, exact under merge), then the
    // top estimated-frequency bigrams are reported next to their exact
    // counts (est ≥ exact always; equality unless sketch rows collide).
    // All four row hashes are 32-bit fields of ONE md5 (TextOps.md5Fields
    // — one hash pass per bigram, the split-one-strong-hash CMS
    // construction), and the field array is PRE-PROJECTED in a codegen
    // stage: an imperative aggregate evaluates its child interpreted per
    // row, and interpreted md5s per bigram were a 15× pass cost (Profile
    // scale_r8) — as a bound reference the hashing stays in whole-stage
    // codegen. The oracle rebuilds the identical counter matrix in SQL.
    // At 100 TB the sketch side stays a constant-size aggregate; the
    // exact side here is the audit benchmark, not the production path.
    "q_cms_counts" -> ((s, dir) => {
      val bgs = corpusBigrams(s, dir)
      val sketch = bgs
        .select(graft.text.TextOps.md5Fields(
          col("bg"), CmsDepth, CmsWidth).as("rc"))
        .agg(graft.functions.CmsSketchAgg.cms_sketch(
          col("rc"), CmsDepth, CmsWidth).as("sk"))
      cmsAudit(bgs, sketch)
    }),

    // Discrete churn hazard curve (the survival-analysis primitive
    // without the Kaplan–Meier float product): treating each customer's
    // LAST order month as the churn event, hazard(m) = churned(m) /
    // at-risk(m) where at-risk counts customers whose last month is
    // ≥ m. Orders span 1995-2001, so the curve has ~80 buckets — a real
    // survival table, unlike the 3-day events window. Two-level shape:
    // the only full scan collapses orders to one row per customer (max
    // month, map-side combined); the per-month counts and the
    // reverse-cumulative at-risk window run on the ~80-row monthly
    // rollup. Every hazard is ONE exact-integer division — no running
    // product, no float accumulation (the KM survivor curve is the
    // driver-side product of these; the hazard table IS the mergeable
    // scale object).
    "q_hazard_curve" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val lastMonth = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(max(trunc(col("o_orderdate"), "month")).as("last_month"))
      val monthly = lastMonth.groupBy(col("last_month").as("month"))
        .agg(count(lit(1)).as("n_churned"))
      val w = W.orderBy(col("month").desc)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      monthly
        .withColumn("n_at_risk", sum(col("n_churned")).over(w))
        .select(col("month"), col("n_at_risk"), col("n_churned"),
          round(col("n_churned").cast("double") / col("n_at_risk"), 6)
            .as("hazard"))
        .orderBy("month")
    }),

    // Benford first-digit audit (Newcomb 1881 / Benford 1938 — the
    // fabricated-data smoke test every financial DQ suite runs):
    // observed leading-digit distribution of order totals vs
    // log10(1+1/d), with per-digit χ² contributions. Determinism
    // discipline: the leading digit comes from the INTEGER cents
    // string (×100 preserves the leading significant digit; double→
    // string formatting does NOT agree cross-engine, int→string does),
    // and χ² is computed from the ROUNDED 6-dp Benford p so both
    // engines feed bit-identical inputs to the closed form (raw libm
    // log10 may differ in the last ulp). One scan → 9-row rollup;
    // everything after is digit-bounded.
    "q_benford" -> ((s, dir) => {
      val digits = Tables.orders(s, dir)
        .select(substring(round(col("o_totalprice") * 100, 0)
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val total = digits.agg(sum(col("n")).as("tot"))
      val pb = round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
      digits.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("tot"), 6).as("p_obs"),
          pb.as("p_benford"),
          round(pow(col("n").cast("double") - col("tot") * pb, 2) /
            (col("tot") * pb), 3).as("chi2_contrib"))
        .orderBy("digit")
    }),

    // Theil–Sen robust trend per event type (Theil 1950 / Sen 1968):
    // slope = MEDIAN of all pairwise day-slopes — a single outlier day
    // can't drag it the way least-squares would. The pairwise set is
    // quadratic ONLY in the daily rollup's row count (30 days → 435
    // pairs per type, calendar-bounded at any corpus size) — the same
    // two-level contract as q_acf: one full scan builds the rollup,
    // everything quadratic runs on it. Slopes are single divisions of
    // exact integers (micro Δx over integer Δdays → identical doubles
    // cross-engine), and the median is Spark percentile ≡ DuckDB
    // quantile_cont over the same multiset — the q_anomaly_mad order-
    // statistics discipline.
    "q_theilsen" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("x"))
        .withColumn("dn", datediff(col("day"),
          lit("1970-01-01").cast("date")).cast("long"))
        .localCheckpoint(true)
      daily.select(col("event_type"), col("dn").as("d1"), col("x").as("x1"))
        .join(daily.select(col("event_type").as("et2"),
            col("dn").as("d2"), col("x").as("x2")),
          col("et2") === col("event_type") && col("d2") > col("d1"))
        .withColumn("slope",
          (col("x2") - col("x1")).cast("double") /
            (col("d2") - col("d1")) / 1e6)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          round(expr("percentile(slope, 0.5)"), 6).as("slope"))
        .orderBy("event_type")
    }),

    // Two-sample Welch t-test per event type (Welch 1947), cohorts =
    // user-id parity (the A/B assignment an experimentation pipeline
    // would hash): t = (x̄A−x̄B)/√(s²A/nA + s²B/nB) with the
    // Welch–Satterthwaite dof. Same exact-moment discipline as
    // q_corr_moments — per (type, cohort) the three DECIMAL(38,0)
    // micro-unit moments (n, Σx, Σx²) accumulate order-independently in
    // ONE map-side-combined scan, and every float op after is a fixed
    // closed-form expression over 6 agreed integers per type — so a
    // SIGNIFICANCE TEST at 100 TB costs one scan + a 5-row exchange,
    // and the t statistic hash-matches DuckDB to the last rounded
    // digit. (The variance term uses the n·Σx²−(Σx)² integer numerator
    // — no catastrophic cancellation of float partials.)
    "q_ab_welch" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        (col("user_id") % 2).as("grp"),
        round(col("value") * 1e6, 0).cast("long")
          .cast("decimal(38,0)").as("x"))
      // localCheckpoint: the A and B sides below are two filters of
      // THIS 10-row table — without it Catalyst re-derives the
      // aggregate per side and the test costs two full scans
      welchFromMoments(ev.groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
        .localCheckpoint(true))
    }),

    // Experiment power sizing (the question asked BEFORE q_ab_welch's
    // test runs: what effect could this cohort split even detect?):
    // per event type, the minimal detectable effect at α=0.05/power=0.8
    // — MDE = (z_{α/2}+z_β)·√(s²A/nA + s²B/nB) with the conventional
    // 1.959964 + 0.841621 constants — absolute and relative to the A
    // mean. Same exact DECIMAL moment scan as the t-test; every float
    // is the one closed-form chain.
    "q_ab_power" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        (col("user_id") % 2).as("grp"),
        round(col("value") * 1e6, 0).cast("long")
          .cast("decimal(38,0)").as("x"))
      val mom = ev.groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
        .localCheckpoint(true)
      def side(g: Int, suf: String) = mom.filter(col("grp") === g)
        .select(col("event_type"), col("n").as(s"n$suf"),
          col("sx").as(s"sx$suf"), col("sxx").as(s"sxx$suf"))
      def vOver(n: String, sx: String, sxx: String) =
        (col(n) * col(sxx) - col(sx) * col(sx)).cast("double") /
          (col(n) * col(n) * (col(n) - 1)).cast("double") / 1e12
      val zSum = lit(1.959964 + 0.841621)
      val mde = zSum * sqrt(vOver("na", "sxa", "sxxa") +
        vOver("nb", "sxb", "sxxb"))
      side(0, "a").join(side(1, "b"), "event_type")
        .select(col("event_type"),
          col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
          round(mde, 6).as("mde_abs"),
          round(mde / (col("sxa").cast("double") / col("na").cast("double")
            / 1e6), 6).as("mde_rel"))
        .orderBy("event_type")
    }),

    // STREAMING Welch twin: the (n, Σx, Σx²) DECIMAL moments as a
    // streaming grouped aggregate — partial sums ARE the state-store
    // state, and integer sums are linear (order/batch-split invariant),
    // so the streamed moments are BIT-IDENTICAL to one batch pass and
    // the same closed form + oracle apply unchanged. Continuous
    // significance monitoring at 100 TB: constant state per (type,
    // cohort), every micro-batch updates the t statistic.
    "q_stream_welch" -> ((s, dir) =>
      welchFromMoments(
        graft.streaming.StreamingOps.runStreamWelchMomentsOnce(s, dir)
          .localCheckpoint(true))),

    // Per-nation OLS revenue trend (slope / intercept / R²) from exact
    // DECIMAL(38,0) moments — the least-squares counterpart of
    // q_theilsen's robust fit. Two-level shape: the only full scan
    // collapses orders×customer to the (nation, month) revenue rollup
    // (~25×80 rows at any corpus size); the five regression moments
    // (n, Σx, Σy, Σxx, Σxy, Σyy) accumulate over that rollup as exact
    // integer cents/months, and slope/intercept/R² are fixed closed-form
    // double chains over agreed integers — the q_corr_moments discipline,
    // so the fit hash-matches DuckDB. x = months since 1995-01 (exact
    // int), y = monthly revenue in integer cents.
    "q_ols_trend" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))
      val monthly = Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nationkey"),
          trunc(col("o_orderdate"), "month").as("month"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
          .as("y"))
        .withColumn("x", months_between(col("month"),
          lit("1995-01-01").cast("date")).cast("decimal(38,0)"))
        .localCheckpoint(true)
      val m = monthly.groupBy(col("nationkey"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      // integer numerators/denominators FIRST (no float-partial
      // cancellation), one double division chain at the end
      val numXY = col("n") * col("sxy") - col("sx") * col("sy")
      val denX  = col("n") * col("sxx") - col("sx") * col("sx")
      val denY  = col("n") * col("syy") - col("sy") * col("sy")
      val numB  = col("sy") * col("sxx") - col("sx") * col("sxy")
      m.select(col("nationkey"), col("n").cast("long").as("n_months"),
          // cents/month → dollars/month
          round(numXY.cast("double") / denX.cast("double") / 100, 2)
            .as("slope"),
          round(numB.cast("double") / denX.cast("double") / 100, 2)
            .as("intercept"),
          round(pow(numXY.cast("double"), 2) /
            (denX.cast("double") * denY.cast("double")), 6).as("r2"))
        .orderBy("nationkey")
    }),

    // Chi-square test of independence, order priority × status (the
    // categorical-drift / segment-bias audit): the ONLY full scan builds
    // the 15-cell contingency rollup; marginals, expected counts, and
    // per-cell χ² contributions are closed forms over it. The
    // contribution is computed from the exact-integer numerator
    // (n·N − r·c)² / (r·c·N) — counts never pass through a float until
    // the final division, so the statistic hash-matches DuckDB.
    "q_chi2_indep" -> ((s, dir) => {
      val cont = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // 15 rows; marginals re-derive from it
      val rowm = cont.groupBy(col("priority")).agg(sum(col("n")).as("nr"))
      val colm = cont.groupBy(col("status")).agg(sum(col("n")).as("nc"))
      val tot = cont.agg(sum(col("n")).as("nt"))
      cont.join(broadcast(rowm), Seq("priority"))
        .join(broadcast(colm), Seq("status"))
        .crossJoin(broadcast(tot))
        .select(col("priority"), col("status"), col("n").as("n_obs"),
          round(((col("nr") * col("nc")).cast("double")) / col("nt"), 6)
            .as("expected"),
          round(pow((col("n") * col("nt") - col("nr") * col("nc"))
              .cast("double"), 2) /
            ((col("nr") * col("nc")).cast("double") * col("nt")), 6)
            .as("chi2_contrib"))
        .orderBy("priority", "status")
    }),

    // Funnel latency percentiles (the "how long does view→purchase
    // take" product metric on top of q_funnel's per-user stage times):
    // per entry-day cohort, p50/p90 of the full-funnel conversion time
    // over converted users. Latencies are exact µs longs before the
    // percentile (the q_anomaly_mad interpolation discipline), nulls
    // (unconverted users) fall out of the aggregate on both engines,
    // and the per-user frame is O(users) — never a window over raw
    // events (funnel3's contract).
    "q_funnel_latency" -> ((s, dir) => {
      val f = graft.ops.BehaviorOps.funnel3(Tables.events(s, dir),
        "user_id", "event_type", "ts", "view", "click", "purchase")
      f.groupBy(to_date(col("t1")).as("cohort_day"))
        .agg(count(lit(1)).as("n_entered"),
          count(col("t3")).as("n_converted"),
          round(expr(
            "percentile(unix_micros(t3) - unix_micros(t1), 0.5)") / 1e6, 6)
            .as("p50_s"),
          round(expr(
            "percentile(unix_micros(t3) - unix_micros(t1), 0.9)") / 1e6, 6)
            .as("p90_s"))
        .orderBy("cohort_day")
    }),

    // Winsorized group statistics (the tail-robust mean the monitoring
    // dashboards want when q_anomaly_mad says the tails are wild): per
    // event type, values clip to the exact [p1, p99] of their group and
    // the stats recompute over the clipped series. The percentiles run
    // on INTEGER micro-units (the q_anomaly_mad discipline — both
    // engines interpolate identical integers), clipping is exact
    // integer clamping, and the winsorized mean is an exact-integer
    // sum — so a tail-trimmed float statistic hash-matches DuckDB.
    // Two-pass by nature (quantile → clip); a production caller
    // persists the micro frame between passes.
    "q_winsorize" -> ((s, dir) => {
      val micro = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 1e6, 0).cast("long").as("mv"))
      val cuts = micro.groupBy(col("event_type"))
        .agg(expr("percentile(mv, 0.01)").as("p1"),
          expr("percentile(mv, 0.99)").as("p99"))
        // exact integer bounds: interpolated micro percentiles round to
        // micro grid identically cross-engine before any comparison
        .select(col("event_type"), round(col("p1"), 0).cast("long").as("lo"),
          round(col("p99"), 0).cast("long").as("hi"))
      micro.join(broadcast(cuts), Seq("event_type"))
        .withColumn("cv", greatest(col("lo"), least(col("hi"), col("mv"))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("mv") < col("lo") || col("mv") > col("hi"), 1L)
            .otherwise(0L)).as("n_clipped"),
          round(first(col("lo")).cast("double") / 1e6, 6).as("p1"),
          round(first(col("hi")).cast("double") / 1e6, 6).as("p99"),
          round(sum(col("mv")).cast("double") / count(lit(1)) / 1e6, 6)
            .as("raw_mean"),
          round(sum(col("cv")).cast("double") / count(lit(1)) / 1e6, 6)
            .as("wins_mean"))
        .orderBy("event_type")
    }),

    // Category share-over-time (the mix-shift monitor: is a priority
    // class growing at the others' expense — the question behind every
    // "metric moved, did the MIX move?" incident): monthly counts per
    // priority with exact share fractions; one scan → the month×class
    // rollup, shares via a broadcast join of monthly totals.
    "q_category_share" -> ((s, dir) => {
      val cells = Tables.orders(s, dir)
        .groupBy(trunc(col("o_orderdate"), "month").as("month"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // month×5 rows; totals re-derive
      val tot = cells.groupBy(col("month")).agg(sum(col("n")).as("nm"))
      cells.join(broadcast(tot), Seq("month"))
        .select(col("month"), col("priority"), col("n"),
          round(col("n").cast("double") / col("nm"), 6).as("share"))
        .orderBy("month", "priority")
    }),

    // Cohort LTV curves (q_cohort_retention's revenue sibling — the
    // "how much has the day-X cohort spent by day-offset Y" product
    // table): cohort = first active day per user (one user-keyed
    // aggregate, map-side combined), purchase revenue lands in exact
    // micro-units per (cohort, offset) cell, and the cumulative curve
    // is a window over the CALENDAR-bounded offset axis — shuffled rows
    // O(users), window state O(days), at any corpus size.
    "q_cohort_ltv" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort_day"))
      val cells = ev.filter(col("event_type") === "purchase")
        .join(cohort, Seq("user_id")) // user-keyed, co-partitioned
        .groupBy(col("cohort_day"),
          datediff(to_date(col("ts")), col("cohort_day")).cast("long")
            .as("day_offset"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(round(col("value") * 1e6, 0).cast("long")).as("rm"))
      val w = W.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      cells.select(col("cohort_day"), col("day_offset"), col("n_purchases"),
          round(col("rm").cast("double") / 1e6, 6).as("revenue"),
          round(sum(col("rm")).over(w).cast("double") / 1e6, 6)
            .as("cum_revenue"))
        .orderBy("cohort_day", "day_offset")
    }),

    // Last-touch attribution (the marketing-analytics primitive): each
    // purchase is credited to the user's most recent NON-purchase event
    // within a 24 h lookback, else 'direct'. One window per user ordered
    // by (ts, event_id) — state bounded by a user's history, never
    // global — carrying the last touchpoint's type and time via
    // ignore-nulls last(); revenue accumulates in exact micro-units.
    // Output: per (channel, day) purchase counts + attributed revenue.
    "q_attribution" -> ((s, dir) =>
      graft.ops.BehaviorOps.attributeLastTouch(Tables.events(s, dir),
          "user_id", "event_type", "ts", "event_id", "value",
          lookbackHours = 24)
        .groupBy(col("channel"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(round(col("value") * 1e6, 0).cast("long"))
            .cast("double") / 1e6, 6).as("revenue"))
        .orderBy("channel", "day")),

    // Gini concentration of order revenue per priority class (the
    // inequality / concentration audit — "is the revenue in this segment
    // carried by a few whale orders?"): G = 2·Σrᵢxᵢ/(n·Σx) − (n+1)/n
    // with mid-ranks for ties. Ranks come from the SAME bounded-
    // histogram machinery as q_rank_ztest: totals quantize to exact
    // cents, so the per-priority rank table is bounded by the PRICE
    // DOMAIN (distinct cent values), never a global sort of raw rows;
    // Σrᵢxᵢ accumulates as DECIMAL(38,0) integer halves (t·v·r2), and
    // the Gini is one closed-form double chain over three exact
    // integers per class.
    "q_gini" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("v"))
      val buckets = o.groupBy(col("priority"), col("v"))
        .agg(count(lit(1)).as("t"))
      val wLt = W.partitionBy(col("priority")).orderBy(col("v"))
        .rowsBetween(W.unboundedPreceding, -1)
      // r2 = 2·mid-rank (exact integer); Σrx in HALVES: t·v·r2
      val ranked = buckets
        .withColumn("c_lt", coalesce(sum(col("t")).over(wLt), lit(0L)))
        .select(col("priority"), col("v"), col("t"),
          (lit(2) * col("c_lt") + col("t") + 1).as("r2"))
      ranked.groupBy(col("priority"))
        .agg(sum(col("t")).as("n"),
          sum(col("t").cast("decimal(38,0)") * col("v")).as("sx"),
          sum(col("t").cast("decimal(38,0)") * col("v") * col("r2"))
            .as("srx2")) // 2·Σ r·x
        .select(col("priority"), col("n"),
          round(col("sx").cast("double") / col("n") / 100, 2).as("mean_price"),
          round(col("srx2").cast("double") /
              (col("n").cast("double") * col("sx").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double"), 6)
            .as("gini"))
        .orderBy("priority")
    }),

    // l-diversity audit (Machanavajjhala et al. 2006 — the k-anonymity
    // complement q_k_anonymity doesn't cover: a group can be k-anonymous
    // yet leak because every member shares the SENSITIVE value):
    // per (segment, nation) equivalence class, the distinct count and
    // entropy of the account-balance band. One scan → the class×band
    // conditional-aggregate rollup; band domain is FIXED (neg/low/high),
    // so the entropy is a closed-form expression over three exact
    // integers per class — never an order-dependent float sum.
    // entropy ≥ ln(l) is the entropy-l-diversity release criterion.
    "q_l_diversity" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(
        col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nationkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("band"))
      def nOf(b: String) =
        sum(when(col("band") === b, 1L).otherwise(0L)).as(s"n_$b")
      def term(cn: String) =
        when(col(cn) > 0,
          col(cn).cast("double") * log(col(cn).cast("double")))
          .otherwise(lit(0.0))
      c.groupBy(col("segment"), col("nationkey"))
        .agg(count(lit(1)).as("n"), nOf("neg"), nOf("low"), nOf("high"))
        .select(col("segment"), col("nationkey"), col("n"),
          ((col("n_neg") > 0).cast("int") + (col("n_low") > 0).cast("int") +
            (col("n_high") > 0).cast("int")).as("l_distinct"),
          round(log(col("n").cast("double")) -
            (term("n_neg") + term("n_low") + term("n_high")) / col("n"), 6)
            .as("entropy"),
          ((col("n_neg") > 0) && (col("n_low") > 0) && (col("n_high") > 0))
            .as("l_ok"))
        .orderBy("segment", "nationkey")
    }),

    // Exponentially-weighted moving average with a 1-day half-life,
    // EXACT: α = 1/2 makes every weight a power of two, and truncating
    // at 7 lags keeps x·2⁻ᵏ sums inside 53 bits — each term is an
    // exactly-representable dyadic rational, so the windowed sum is
    // bit-identical under ANY accumulation order (the float-determinism
    // problem EWMA normally has simply doesn't arise). Two-level shape:
    // the one full scan builds the daily micro-unit rollup; the weighted
    // window is a calendar-bounded range self-join on day numbers (the
    // q_theilsen contract), weights renormalized over the days actually
    // present so gapped calendars don't dilute the average.
    "q_ewma_smooth" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("x"),
          count(lit(1)).as("n"))
        .withColumn("dn", datediff(col("day"),
          lit("1970-01-01").cast("date")).cast("long"))
        .localCheckpoint(true)
      val w = pow(lit(0.5), (col("dn") - col("dn2")).cast("double"))
      // event-weighted EWMA: Σx·w / Σn·w — both sums are integer·2⁻ᵏ
      // terms (exact dyadics), one float division at the end
      daily.join(
          daily.select(col("event_type").as("et2"), col("dn").as("dn2"),
            col("x").as("x2"), col("n").as("n2")),
          col("et2") === col("event_type") &&
            col("dn2") <= col("dn") && col("dn2") > col("dn") - 8)
        .groupBy(col("event_type"), col("day"), col("x"), col("n"))
        .agg(sum(col("x2").cast("double") * w).as("sxw"),
          sum(col("n2").cast("double") * w).as("snw"))
        .select(col("event_type"), col("day"),
          round(col("x").cast("double") / col("n") / 1e6, 6).as("raw_mean"),
          round(col("sxw") / col("snw") / 1e6, 6).as("ewma"))
        .orderBy("event_type", "day")
    }),

    // Rank-based group comparison (the Kruskal–Wallis/Dunn machinery
    // without a cross-group float sum): per event type, the exact rank
    // sum of `value` and the Dunn standardized mean rank
    // z = (r̄_g − (N+1)/2) / √((N−n_g)(N+1)/(12 n_g)). Ranks are
    // computed SCALE-CORRECTLY: values quantize to the centi-unit grid
    // (exact — the synthetic values carry 2 decimals), so the rank table
    // is bounded by the VALUE DOMAIN (~49 k buckets), not the corpus;
    // mid-ranks come from one cumulative window over that bounded
    // histogram (never a global sort of raw rows), and per-(group,
    // bucket) counts join it broadcast. Every emitted float is a fixed
    // closed form over three exact integers (2·rank-sum, n_g, N) — no
    // order-dependent float accumulation anywhere, the same discipline
    // as q_ab_welch. (The tie-corrected H statistic is a driver-side
    // fold of these same integers.)
    "q_rank_ztest" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("v"))
      // bounded histogram: one row per occupied centi-bucket
      val buckets = ev.groupBy(col("v")).agg(count(lit(1)).as("t"))
      // mid-rank in HALVES: r2 = 2·(#smaller) + t + 1, an exact integer
      // even when the mid-rank itself is *.5 (the window is a running
      // sum over the bounded bucket table — single partition is fine
      // and stays fine at 100 TB because the table is domain-bounded)
      val wLt = W.orderBy(col("v")).rowsBetween(W.unboundedPreceding, -1)
      val ranks = buckets
        .withColumn("c_lt", coalesce(sum(col("t")).over(wLt), lit(0L)))
        .select(col("v"), (lit(2) * col("c_lt") + col("t") + 1).as("r2"))
      val grp = ev.groupBy(col("event_type"), col("v"))
        .agg(count(lit(1)).as("ngv"))
      val agg = grp.join(broadcast(ranks), Seq("v"))
        .groupBy(col("event_type"))
        .agg(sum(col("ngv")).as("n_g"),
          sum(col("ngv") * col("r2")).as("s2")) // 2× the exact rank sum
        .localCheckpoint(true) // 5 rows; N re-derives from it
      val tot = agg.agg(sum(col("n_g")).as("nt"))
      agg.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n_g"),
          round(col("s2").cast("double") / 2, 1).as("rank_sum"),
          round(col("s2").cast("double") / (lit(2) * col("n_g")), 6)
            .as("mean_rank"),
          round(((col("s2") - col("n_g") * (col("nt") + 1)).cast("double") /
              (lit(2) * col("n_g")).cast("double")) /
            sqrt(((col("nt") - col("n_g")) * (col("nt") + 1)).cast("double") /
              (lit(12) * col("n_g")).cast("double")), 6).as("dunn_z"))
        .orderBy("event_type")
    }),

    // JOIN-CARDINALITY estimation from two CMS sketches (Cormode &
    // Muthukrishnan 2005 §4.2: |A ⋈ B| = Σ_k fA(k)·fB(k), estimated by
    // min_r dot(rowA_r, rowB_r) — always ≥ exact, within εN·M w.h.p.).
    // The optimizer-grade primitive: join size predicted from two
    // CONSTANT-SIZE (16 KiB) single-pass aggregates — at 100 TB each
    // side is one map-side-combined sketch scan and the "join" never
    // happens; the exact count here is the audit benchmark. Shares the
    // q_cms_counts hash recipe (md5 32-bit fields % width) so the
    // oracle rebuilds both counter matrices and the same min-of-dots.
    "q_join_card" -> ((s, dir) => {
      val (d, w) = (CmsDepth, CmsWidth)
      def sketchOf(df: DataFrame, key: org.apache.spark.sql.Column) =
        df.select(graft.text.TextOps.md5Fields(
            concat(lit("jc:"), key.cast("string")), d, w).as("rc"))
          .agg(graft.functions.CmsSketchAgg.cms_sketch(
            col("rc"), d, w).as("sk"))
      val dots = sketchOf(Tables.events(s, dir), col("user_id"))
        .select(col("sk").as("a"))
        .crossJoin(sketchOf(Tables.orders(s, dir), col("o_custkey"))
          .select(col("sk").as("b")))
      val dotCols = (0 until d).map { r =>
        aggregate(
          zip_with(slice(col("a"), r * w + 1, w),
            slice(col("b"), r * w + 1, w), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x)
      }
      val est = dots.select(least(dotCols: _*).as("est_card"))
      val exact = Tables.events(s, dir)
        .join(Tables.orders(s, dir), col("user_id") === col("o_custkey"))
        .agg(count(lit(1)).as("exact_card"))
      est.crossJoin(exact)
    }),

    // HyperLogLog distinct-cardinality sketch per language over corpus
    // bigrams: native register aggregate (512 B state, element-wise-max
    // merge) + oracle-exact register arithmetic — v_zero / integer-scaled
    // Σ2^-M / one-divide raw estimate — audited against the exact
    // distinct count. The 100 TB count-distinct: no per-key shuffle, and
    // per-partition register arrays stay mergeable after the fact.
    "q_hll_distinct" -> ((s, dir) => {
      val bgs = langBigrams(s, dir)
      val regs = bgs
        .select(col("lang"),
          graft.text.TextOps.md5Key64(col("bg"), "hll:").as("k"))
        .groupBy(col("lang"))
        .agg(graft.functions.HllRegisterAgg.hll_registers(
          col("k"), HllP).as("regs"))
      hllAudit(bgs, regs)
    }),

    // The SAME audit with the registers built by STRUCTURED STREAMING:
    // per-group state is the fixed 512-byte register array riding the
    // state store, and max-merge idempotence makes the streamed registers
    // bit-identical to batch — so this query shares q_hll_distinct's
    // oracle verbatim. Continuous-ingest distinct tracking.
    "q_stream_hll" -> ((s, dir) => {
      val regs = graft.streaming.StreamingOps.runStreamHllOnce(s, dir, HllP)
      hllAudit(langBigrams(s, dir), regs)
    }),

    // The SAME audit with the sketch built by STRUCTURED STREAMING: the
    // CmsSketchAgg buffer is the aggregation state (constant 16 KiB,
    // serialized through the state store between micro-batches), and the
    // sketch's linearity makes the streamed counter matrix identical to
    // the batch one — so this query shares q_cms_counts' oracle verbatim.
    // The continuous-ingest shape of corpus frequency tracking.
    "q_stream_cms" -> ((s, dir) => {
      val sketch = graft.streaming.StreamingOps.runStreamCmsOnce(
        s, dir, CmsDepth, CmsWidth)
      cmsAudit(corpusBigrams(s, dir), sketch)
    }),

    // Z-order (Morton) layout audit: interleave (user, hour) with the
    // native z_order kernel, cut the z-range into fixed-width "files", and
    // report each file's bounding rectangle. The point of the layout —
    // every file covers a SMALL range of BOTH dimensions, so parquet
    // min/max stats prune scans filtered on either one — is visible in the
    // output (tight x/y spans per file) and checked exactly by the oracle,
    // which re-derives the interleave bit-by-bit in SQL. Dimensions are
    // pre-scaled per the ZOrder2 contract: user_id is already narrow;
    // hours-since-2024-01-01 stays under 2^10 for this archive (the
    // oracle's 20-bit reconstruction bounds both dims at 2^20). For
    // nonnegative inputs the kernel's sign-flip arithmetic reduces to
    // pure interleave + 2^62, which the query subtracts off.
    "q_zorder_layout" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id").cast("int").as("x"),
        floor((unix_micros(col("ts")) - lit(1704067200000000L)) / lit(3.6e9))
          .cast("int").as("y"))
      ev.withColumn("z",
          graft.functions.ZOrder2.z_order(col("x"), col("y"))
            - lit(4611686018427387904L))
        .withColumn("file_id", shiftright(col("z"), 14).cast("int"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"))
        .orderBy("file_id")
    }),

    // Mergeable QUANTILE sketch (fixed-range histogram, HDR/Prometheus
    // style): exact integer counts over 64 pre-agreed buckets of
    // [0, 512) (w = 8, exactly representable), quantile = one in-bucket
    // linear interpolation at the serving edge. The 100 TB percentile:
    // q_percentiles' exact path needs a per-group sort, and Spark's
    // approx_percentile (GK) is partition-order-dependent — this sketch
    // is 512 B per group, exactly mergeable, and deterministic, so the
    // oracle replays estimate arithmetic bit-for-bit in SQL. Rank error
    // ≤ one bucket width (SketchSpec pins |est − exact| ≤ w).
    "q_quantile_sketch" -> ((s, dir) =>
      histQuantiles(
        Tables.events(s, dir).groupBy(col("event_type"))
          .agg(graft.functions.HistogramAgg.hist_sketch(
            col("value"), HistLo, HistHi, HistBins).as("h")))),

    // The SAME sketch built by STRUCTURED STREAMING: per-group state is
    // the fixed 8·bins-byte count array in the state store, and exact
    // element-wise-add merge makes the streamed counts bit-identical to
    // batch — shared oracle verbatim (the CMS/HLL contract, applied to
    // quantiles). Continuous-ingest latency percentiles.
    "q_stream_quantiles" -> ((s, dir) =>
      histQuantiles(graft.streaming.StreamingOps.runStreamHistOnce(
        s, dir, HistLo, HistHi, HistBins))),

    // KMV distinct sketch (k minimum hash values) per language: the
    // set-algebra cardinality sketch — unlike HLL registers, the k-min
    // set is a uniform sample of the key space, so sketches ALSO answer
    // intersection/Jaccard (q_kmv_overlap). Estimate = (k−1)·2^60 /
    // kth_min (one divide of exact integers — bit-identical in SQL);
    // under-full sketch = exact count. Audited vs the exact distinct
    // (the column a 100 TB run would omit).
    "q_kmv_distinct" -> ((s, dir) => {
      val bgs = langBigrams(s, dir)
      val exact = bgs.groupBy(col("lang"))
        .agg(countDistinct(col("bg")).as("n_exact"))
      kmvSketches(s, dir)
        .select(col("lang"), size(col("mins")).as("m"),
          when(size(col("mins")) >= lit(KmvK),
            element_at(col("mins"), KmvK)).as("kth_min"),
          graft.functions.KmvAgg.kmvEstimate(col("mins"), KmvK).as("est"))
        .join(broadcast(exact), Seq("lang"))
        .orderBy("lang")
    }),

    // The SAME KMV sketch built by STRUCTURED STREAMING: the ≤k-element
    // sorted key set rides the state store, and SET-union merge is
    // idempotent — streamed minima ≡ batch bit-identically (and
    // redelivered rows are absorbed, not double-counted). Shares
    // q_kmv_distinct's oracle verbatim.
    "q_stream_kmv" -> ((s, dir) => {
      val exact = langBigrams(s, dir).groupBy(col("lang"))
        .agg(countDistinct(col("bg")).as("n_exact"))
      graft.streaming.StreamingOps.runStreamKmvOnce(s, dir, KmvK)
        .select(col("lang"), size(col("mins")).as("m"),
          when(size(col("mins")) >= lit(KmvK),
            element_at(col("mins"), KmvK)).as("kth_min"),
          graft.functions.KmvAgg.kmvEstimate(col("mins"), KmvK).as("est"))
        .join(broadcast(exact), Seq("lang"))
        .orderBy("lang")
    }),

    // Pairwise Jaccard between language bigram VOCABULARIES from the
    // KMV sketches alone (Beyer et al. 2007 §5: the k smallest of the
    // union form a uniform sample; the fraction present in both
    // sketches estimates |A∩B|/|A∪B|) — the cross-corpus-overlap
    // question (contamination, source similarity) answered without
    // revisiting raw data. Audited vs the exact Jaccard.
    "q_kmv_overlap" -> ((s, dir) => {
      val sk = kmvSketches(s, dir)
      val est = sk.as("a").join(sk.as("b"), col("a.lang") < col("b.lang"))
        .select(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"),
          graft.functions.KmvAgg.kmvJaccard(
            col("a.mins"), col("b.mins"), KmvK).as("jacc_est"))
      val d = langBigrams(s, dir).distinct()
      val n = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val inter = d.as("x").join(d.as("y"),
          col("x.bg") === col("y.bg") && col("x.lang") < col("y.lang"))
        .groupBy(col("x.lang").as("lang_a"), col("y.lang").as("lang_b"))
        .agg(count(lit(1)).as("i"))
      est.join(inter, Seq("lang_a", "lang_b"), "left")
        .join(n.select(col("lang").as("lang_a"), col("n").as("na")), "lang_a")
        .join(n.select(col("lang").as("lang_b"), col("n").as("nb")), "lang_b")
        .select(col("lang_a"), col("lang_b"), col("jacc_est"),
          round(coalesce(col("i"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("i"), lit(0L))).cast("double"),
            6).as("jacc_exact"))
        .orderBy("lang_a", "lang_b")
    }),

    // First-touch funnel view→click→purchase, reported per entry-day
    // cohort: per-user conditional-aggregate stages (shuffled rows =
    // O(users), no window over events), counts rolled to the t1 day.
    // See [[graft.ops.BehaviorOps.funnel3]].
    "q_funnel" -> ((s, dir) =>
      graft.ops.BehaviorOps.funnel3(Tables.events(s, dir),
          "user_id", "event_type", "ts", "view", "click", "purchase")
        .groupBy(to_date(col("t1")).as("cohort_day"))
        .agg(count(lit(1)).as("n_entered"),
             count(col("t2")).as("n_clicked"),
             count(col("t3")).as("n_purchased"))
        .orderBy("cohort_day")),

    // Day-grain retention matrix: cohort = first active day; cell =
    // users from that cohort active `day_offset` days later.
    "q_cohort_retention" -> ((s, dir) =>
      graft.ops.BehaviorOps.cohortRetention(
          Tables.events(s, dir), "user_id", "ts")
        .orderBy("cohort_day", "day_offset")),

    // Median/MAD robust outlier summary per event_type (|v−med| >
    // 3·1.4826·MAD): integer-micro quantization ahead of the exact
    // percentiles makes both engines interpolate identical integers.
    "q_anomaly_mad" -> ((s, dir) =>
      graft.ops.BehaviorOps.madOutlierSummary(
          Tables.events(s, dir), "event_type", "value")
        .orderBy("event_type")),

    // STREAMING retention twin: 16-byte bitmask state per user,
    // min-rebase + OR — commutative, so NO ingest-order contract (the
    // funnel twin needs one; this one provably doesn't). See
    // [[graft.streaming.StreamingOps.runStreamRetentionOnce]].
    "q_stream_retention" -> ((s, dir) =>
      graft.streaming.StreamingOps.runStreamRetentionOnce(s, dir)
        .orderBy("cohort_day", "day_offset")),

    // STREAMING funnel twin: per-user (t1,t2,t3) state machine at
    // ingest (flatMapGroupsWithState, 24 bytes/user), time-ordered
    // micro-batches by construction — streamed ≡ batch exactly, so
    // q_funnel's oracle applies unchanged. See
    // [[graft.streaming.StreamingOps.runStreamFunnelOnce]].
    "q_stream_funnel" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .runStreamFunnelOnce(s, dir, "view", "click", "purchase")
        .groupBy(to_date(timestamp_micros(col("t1"))).as("cohort_day"))
        .agg(count(lit(1)).as("n_entered"),
             count(col("t2")).as("n_clicked"),
             count(col("t3")).as("n_purchased"))
        .orderBy("cohort_day")),

    // STREAMING attribution twin: one (touch_type, touch_us) pair of
    // state per user, purchases credited AT INGEST (the real-time
    // "which campaign just converted" feed) — time-ordered micro-batches
    // by construction, so streamed ≡ batch and q_attribution's oracle
    // applies unchanged. See
    // [[graft.streaming.StreamingOps.runStreamAttributionOnce]].
    "q_stream_attribution" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .runStreamAttributionOnce(s, dir, lookbackHours = 24)
        .groupBy(col("channel"),
          to_date(timestamp_micros(col("us"))).as("day"))
        .agg(count(lit(1)).as("n_purchases"),
          round(sum(col("vmicro")).cast("double") / 1e6, 6).as("revenue"))
        .orderBy("channel", "day")),

    // STREAMING funnel-latency twin: the same conversion-time
    // percentiles computed from the streamed per-user (t1,t2,t3) state
    // machine's final emissions — streamed stage times ≡ batch
    // (StreamingSpec pins element equality for the funnel), so
    // q_funnel_latency's oracle applies unchanged.
    "q_stream_funnel_latency" -> ((s, dir) =>
      graft.streaming.StreamingOps
        .runStreamFunnelOnce(s, dir, "view", "click", "purchase")
        .groupBy(to_date(timestamp_micros(col("t1"))).as("cohort_day"))
        .agg(count(lit(1)).as("n_entered"),
          count(col("t3")).as("n_converted"),
          round(expr("percentile(t3 - t1, 0.5)") / 1e6, 6).as("p50_s"),
          round(expr("percentile(t3 - t1, 0.9)") / 1e6, 6).as("p90_s"))
        .orderBy("cohort_day")),

    // Per-group key-skew diagnostic — the measurement that DECIDES
    // salting (JoinOps.saltedEquiJoin) and AQE skew thresholds instead
    // of guessing: per-key counts (map-side combinable), then
    // distribution stats per group. max/mean ratio ≈ 1 → uniform;
    // top1_share near 1 → one hot key owns the group.
    "q_skew_diag" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("c")).as("n_rows"),
          max(col("c")).as("max_n"),
          round(expr("percentile(c, 0.99)"), 6).as("p99_n"),
          round(max(col("c")).cast("double") * count(lit(1)).cast("double")
            / sum(col("c")).cast("double"), 6).as("skew_ratio"),
          round(max(col("c")).cast("double")
            / sum(col("c")).cast("double"), 6).as("top1_share"))
        .orderBy("event_type")),

    // SLIDING-WINDOW distinct via daily HLL sketches — the sketch-
    // mergeability payoff: ONE pass builds a 512-int register array per
    // day, and every 7-day window's cardinality is a max-merge of its
    // 7 daily sketches (register-wise max = HLL union). At 100 TB the
    // daily sketches are a 30-row table; answering 30 windows costs 30
    // tiny merges, never 30 re-scans — the reason sketches beat exact
    // countDistinct for overlapping windows. Audited against the exact
    // windowed distinct (same explode-to-window construction).
    "q_hll_sliding" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(
        to_date(col("ts")).as("day"),
        graft.text.TextOps.md5Key64(col("user_id"), "hll:").as("k"),
        col("user_id"))
      val daily = ev.groupBy(col("day"))
        .agg(graft.functions.HllRegisterAgg.hll_registers(col("k"), HllP)
          .as("regs"))
      // a day's sketch serves every window ENDING within the next 6 days
      val merged = daily
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("wday"), col("regs"))
        .select(col("wday"), posexplode(col("regs")).as(Seq("pos", "r")))
        .groupBy(col("wday"), col("pos")).agg(max(col("r")).as("r"))
      // same register math as hllStats, stated row-wise over the dense
      // 512 positions (scale = 60 − p + 1 = 52)
      val est = merged.groupBy(col("wday"))
        .agg(sum(when(col("r") === 0, 1).otherwise(0)).as("v_zero"),
          sum(pow(lit(2.0), lit(52) - col("r")).cast("long")).as("sum_scaled"))
        .withColumn("est_raw", round(
          lit(0.7213) / (lit(1.0) + lit(1.079) / lit(512.0)) *
            lit(512.0) * lit(512.0) * lit((1L << 52).toDouble) /
            col("sum_scaled").cast("double"), 6))
      val exact = ev
        .select(explode(sequence(col("day"), date_add(col("day"), 6)))
          .as("wday"), col("user_id"))
        .groupBy(col("wday"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      est.join(exact, "wday").orderBy("wday")
    }),

    // Exact integer-moment Pearson correlation per group: built-in
    // corr() is a float accumulation whose last ulp is aggregation-order
    // dependent — instead the five moments (Σx, Σy, Σx², Σy², Σxy)
    // accumulate in centi-unit DECIMAL(38,0) (exact under any order,
    // Σy² ≈ 2e19 overflows a long at sf0.1) and the closed form
    // n·Σxy − ΣxΣy / √((n·Σx²−Σx²)(n·Σy²−Σy²)) evaluates once per
    // group. One map-side-combined aggregate — correlation at 100 TB
    // costs exactly one scan + a 3-row exchange.
    "q_corr_moments" -> ((s, dir) => {
      def centi(c: org.apache.spark.sql.Column) =
        round(c * 100, 0).cast("decimal(38,0)")
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        centi(col("l_quantity")).as("x"),
        centi(col("l_extendedprice")).as("y"),
        centi(col("l_discount")).as("z"))
      def corrOf(sx: String, sy: String, sxx: String, syy: String,
                 sxy: String) = round(
        ((col("n") * col(sxy) - col(sx) * col(sy)).cast("double")) /
          sqrt((col("n") * col(sxx) - col(sx) * col(sx)).cast("double") *
               (col("n") * col(syy) - col(sy) * col(sy)).cast("double")), 6)
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("z")).as("sz"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("z") * col("y")).as("szy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          corrOf("sx", "sy", "sxx", "syy", "sxy").as("corr_qty_price"),
          corrOf("sz", "sy", "szz", "syy", "szy").as("corr_disc_price"))
        .orderBy("l_returnflag")
    }),

    // Top event-type TRIGRAM paths (the "common user journeys" product
    // query): per user, consecutive event triples by event time via two
    // leads over the (user, ts) window — window state is bounded by one
    // user's history, never global — then a plain count/top. Ties in ts
    // are broken by event_id so the sequence is a total order.
    "q_top_paths" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
          col("e3").as("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
        .limit(20)
    }),

    // Equal-frequency price bands per priority via NTILE — the
    // monitoring/binning companion to the exact percentiles: band
    // EDGES from ranks, deterministic under the (price, orderkey)
    // tie-break. Partition-local sort only (orders partitioned by
    // priority); the single-monster-group scale path remains the
    // mergeable quantile sketch.
    "q_deciles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("o_orderpriority"), col("decile"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy("o_orderpriority", "decile")
    }),

    // Autocorrelation of the hourly activity series at lags 1..3 per
    // event type — the seasonality probe a monitoring pipeline runs
    // before picking a forecast window. Two-level shape: (1) the only
    // full scan builds the hourly micro-unit rollup (map-side combined,
    // one exchange on (event_type, hour)); (2) lag pairing and the
    // moment aggregate run ON the rollup, whose size is bounded by the
    // time dimension (hours × types), not corpus size — at 100 TB the
    // scan dominates and stages 2+ stay constant. Pairing is a
    // self-EQUI-join on (type, hb + lag) rather than lead(k): lead
    // counts ROWS, so a gapped hour silently misaligns every pair
    // behind it, while the join only ever matches true lag-L hour
    // pairs (sf0.01 has gapped hours; both engines join identically).
    // The rollup is localCheckpointed so the self-join's two branches
    // cost one scan, and the ACF itself is the q_corr_moments
    // discipline: exact DECIMAL(38,0) micro-unit moments (hourly sums
    // ≈ 5e9 micro; squares ≈ 2.5e19 overflow a long), one closed-form
    // division per (type, lag) — order-independent, hash-exact vs the
    // HUGEINT oracle.
    "q_acf" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hb"))
        .agg(sum(round(col("value") * 1e6, 0).cast("long"))
          .cast("decimal(38,0)").as("x"))
        .localCheckpoint(true)
      val pairs = hourly
        .withColumn("lag", explode(array((1 to 3).map(lit): _*)))
        .select(col("event_type"), col("lag"), col("hb"), col("x"))
        .join(hourly.select(col("event_type").as("et2"),
            col("hb").as("hb2"), col("x").as("y")),
          col("et2") === col("event_type") &&
            col("hb2") === col("hb") + col("lag"))
      def m(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
      pairs.groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("lag"),
          col("n").cast("long").as("n_pairs"),
          round((m(col("n") * col("sxy") - col("sx") * col("sy"))
              .cast("double")) /
            sqrt(m(col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
              m(col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double")), 6).as("acf"))
        .orderBy("event_type", "lag")
    }),

    // Additive seasonal decomposition (STL-lite: Cleveland et al. 1990
    // shape without loess) of the daily activity total: trend = 7-day
    // centered moving average, seasonal = day-of-week mean of the
    // detrended series, residual = remainder. Everything runs on the
    // DAILY rollup — one full scan, then windows over rows bounded by
    // the calendar, the same two-level contract as q_acf. Exactness
    // discipline: the window uses rangeBetween on the day NUMBER (a
    // row-frame over a gapped calendar would silently widen the
    // window), keeps only complete 7-day frames, and the detrended
    // series is carried as the INTEGER 7·x − Σwin (micro-units) so the
    // day-of-week mean is a single exact-integer division — no double
    // accumulates across rows in either engine. weekday()+1 == DuckDB
    // isodow (Monday=1) pins the dow encoding cross-engine.
    "q_seasonal_decomp" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("xm"))
        .withColumn("dn", datediff(col("day"),
          lit("1970-01-01").cast("date")).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("dn")).rangeBetween(-3, 3)
      val trended = daily
        .withColumn("swin", sum(col("xm")).over(w))
        .withColumn("cwin", count(lit(1)).over(w))
        .filter(col("cwin") === 7)
        .withColumn("detr7", lit(7) * col("xm") - col("swin"))
        .withColumn("dow", weekday(col("day")) + 1)
        .localCheckpoint(true)
      val seasonal = trended.groupBy(col("dow"))
        .agg((sum(col("detr7")).cast("double") /
          (lit(7e6) * count(lit(1)))).as("seas"))
      trended.join(broadcast(seasonal), "dow")
        .select(col("day"),
          round(col("xm") / 1e6, 6).as("x_val"),
          round(col("swin") / 7e6, 6).as("trend"),
          round(col("seas"), 6).as("seasonal"),
          round(col("detr7") / 7e6 - col("seas"), 6).as("residual"))
        .orderBy("day")
    }),

    // CUSUM changepoint scan (Page 1954) per event type on the daily
    // series: the cumulative sum of deviations from the series mean
    // peaks at the most likely level-shift day. Same two-level contract
    // as q_acf/q_seasonal_decomp — one full scan builds the daily
    // rollup, every window below is bounded by the calendar. Exactness:
    // CUSUM_d = Σ_{i≤d}(x_i − T/n) is a rational; carried as the
    // INTEGER numerator n·prefix_d − idx_d·T (longs: n=30,
    // prefix ≤ 3e12 micro at sf0.1 → ~1e14, far under 2^63) with ONE
    // division at the end — no float accumulates anywhere, so the peak
    // argmax (tie-broken by earliest day) is bit-stable cross-engine.
    "q_changepoint" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 1e6, 0).cast("long")).as("x"))
      val wOrd = W.partitionBy("event_type").orderBy("day")
      val wCum = wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)
      val wAll = W.partitionBy("event_type")
      val scored = daily
        .withColumn("idx", row_number().over(wOrd).cast("long"))
        .withColumn("prefix", sum(col("x")).over(wCum))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("t", sum(col("x")).over(wAll))
        .withColumn("num",
          col("n") * col("prefix") - col("idx") * col("t"))
      val wPeak = W.partitionBy("event_type")
        .orderBy(abs(col("num")).desc, col("day"))
      scored.withColumn("pk", row_number().over(wPeak))
        .select(col("event_type"), col("day"),
          round(col("num").cast("double") / (col("n") * lit(1e6)), 6)
            .as("cusum"),
          when(col("pk") === 1, 1).otherwise(0).as("is_peak"))
        .orderBy("event_type", "day")
    }),
  )

  /** 512 minima — σ ≈ 1/√510 ≈ 4.4%. */
  private val KmvK = 512

  /** Per-language KMV sketches over corpus bigrams (shared by both KMV
    * queries; pre-hashed child per the interpreted-agg-child rule). */
  private def kmvSketches(s: SparkSession, dir: String): DataFrame =
    langBigrams(s, dir)
      .select(col("lang"),
        graft.text.TextOps.md5Key64(col("bg"), "kmv:").as("k"))
      .groupBy(col("lang"))
      .agg(graft.functions.KmvAgg.kmv_sketch(col("k"), KmvK).as("mins"))

  private val HistLo = 0.0
  private val HistHi = 512.0
  private val HistBins = 64

  /** Serving-edge quantile extraction shared by the batch and streaming
    * histogram queries: total + p50/p95 interpolation over the tiny
    * per-group count arrays. */
  private def histQuantiles(sketches: DataFrame): DataFrame = {
    import graft.functions.HistogramAgg.histQuantile
    sketches.select(col("event_type"),
        aggregate(col("h"), lit(0L), (a, c) => a + c).as("n"),
        histQuantile(col("h"), 0.5, HistLo, HistHi, HistBins).as("p50"),
        histQuantile(col("h"), 0.95, HistLo, HistHi, HistBins).as("p95"))
      .orderBy("event_type")
  }

  private val CmsDepth = 4
  private val CmsWidth = 512
  /** 2^9 = 512 HLL registers — σ ≈ 1.04/√512 ≈ 4.6%. */
  private val HllP = 9

  /** The corpus bigram stream both CMS queries audit. */
  private def corpusBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(
      explode(graft.functions.WordShingles.word_shingles(
        col("text"), 2, distinct = false)).as("bg"))

  /** Per-language bigram stream for the HLL queries. */
  private def langBigrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("lang"),
      explode(graft.functions.WordShingles.word_shingles(
        col("text"), 2, distinct = false)).as("bg"))

  /** Estimate-vs-exact audit over per-lang HLL register frames: derives
    * the oracle-exact stats columns from the registers and joins the
    * exact distinct count (the audit column a 100 TB run would OMIT —
    * it is the very shuffle the sketch exists to avoid). */
  private def hllAudit(bgs: DataFrame, regs: DataFrame): DataFrame = {
    val (vZero, sumScaled, estRaw) =
      graft.functions.HllRegisterAgg.hllStats(col("regs"), HllP)
    val exact = bgs.groupBy(col("lang"))
      .agg(countDistinct(col("bg")).as("n_exact"))
    regs.select(col("lang"), vZero.as("v_zero"),
        sumScaled.as("sum_scaled"), estRaw.as("est_raw"))
      .join(broadcast(exact), Seq("lang"))
      .orderBy("lang")
  }

  /** Top-30 estimated-vs-exact frequency audit over a 1-row sketch frame
    * (`sk` = the row-major depth×width counter matrix). */
  private def cmsAudit(bgs: DataFrame, sketch: DataFrame): DataFrame = {
    val fields = graft.text.TextOps.md5Fields(col("bg"), CmsDepth, CmsWidth)
    val est = least((0 until CmsDepth).map(r =>
      element_at(col("sk"),
        (element_at(fields, r + 1) + lit(r * CmsWidth) + 1).cast("int"))): _*)
    bgs.groupBy(col("bg")).agg(count(lit(1)).as("exact_count"))
      .crossJoin(broadcast(sketch))
      .select(col("bg"), est.as("est_count"), col("exact_count"))
      .orderBy(col("est_count").desc, col("bg"))
      .limit(30)
  }

  /** One SQL, two queries: the streamed sketch is bit-identical to the
    * batch one (linear sketch), so the audits share the oracle. */
  private val CmsCountsSql: String =
    """WITH tk AS (
      |  SELECT regexp_extract_all(lower(text), '\S+') AS t FROM documents),
      |bg AS (
      |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM tk WHERE len(t) >= 2),
      |exact AS (SELECT bg, count(*) AS exact_count FROM bg GROUP BY 1),
      |hc AS (
      |  SELECT e.bg, r.r,
      |         CAST(concat('0x', substr(md5(e.bg), r.r * 8 + 1, 8))
      |              AS BIGINT) % 512 AS c
      |  FROM exact e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r),
      |counters AS (
      |  SELECT h.r, h.c, CAST(sum(e.exact_count) AS BIGINT) AS n
      |  FROM hc h JOIN exact e USING (bg) GROUP BY 1, 2),
      |est AS (
      |  SELECT h.bg, min(ct.n) AS est_count
      |  FROM hc h JOIN counters ct ON h.r = ct.r AND h.c = ct.c
      |  GROUP BY 1)
      |SELECT e.bg, est_count, x.exact_count
      |FROM est e JOIN exact x ON e.bg = x.bg
      |ORDER BY est_count DESC, e.bg LIMIT 30""".stripMargin

  /** One SQL, two queries (stream registers ≡ batch registers). Rebuilds
    * the register state in pure integer/string arithmetic: the 60-bit
    * md5 key splits as `reg = key % 512`, `w = key // 512`, and the rank
    * is `rho = 52 − length(bin(w))` (`bin` has no leading zeros; `w = 0`
    * → `bin = '0'`, length 1 → the same expression yields 51, so the
    * zero case is spelled out). `sum_scaled = Σ 2^(52−M_j)` is an exact
    * BIGINT (≤ 2^61); the raw estimate is one double divide of
    * bit-agreed inputs. All float literals are CAST to DOUBLE — DuckDB
    * would otherwise parse them as DECIMAL and diverge. */
  private val HllDistinctSql: String =
    """WITH tk AS (
      |  SELECT lang, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
      |bg AS (
      |  SELECT lang, unnest(list_transform(generate_series(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM tk WHERE len(t) >= 2),
      |d AS (SELECT DISTINCT lang, bg FROM bg),
      |k AS (
      |  SELECT lang, CAST(concat('0x', substr(md5('hll:' || bg), 1, 15))
      |               AS BIGINT) AS key
      |  FROM d),
      |reg AS (SELECT lang, key % 512 AS r, key // 512 AS w FROM k),
      |rho AS (
      |  SELECT lang, r,
      |         CASE WHEN w = 0 THEN 52 ELSE 52 - length(bin(w)) END AS rho
      |  FROM reg),
      |mx AS (SELECT lang, r, max(rho) AS mrho FROM rho GROUP BY 1, 2),
      |agg AS (
      |  SELECT lang, 512 - count(*) AS v_zero,
      |         CAST(sum(1::BIGINT << (52 - mrho))
      |           + (512 - count(*)) * (1::BIGINT << 52) AS BIGINT) AS sum_scaled
      |  FROM mx GROUP BY 1),
      |ex AS (SELECT lang, count(DISTINCT bg) AS n_exact FROM bg GROUP BY 1)
      |SELECT a.lang, a.v_zero, a.sum_scaled,
      |       round(CAST(0.7213 AS DOUBLE)
      |               / (CAST(1.0 AS DOUBLE)
      |                  + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
      |             * CAST(512.0 AS DOUBLE) * CAST(512.0 AS DOUBLE)
      |             * CAST(4503599627370496.0 AS DOUBLE)
      |             / CAST(a.sum_scaled AS DOUBLE), 6) AS est_raw,
      |       e.n_exact
      |FROM agg a JOIN ex e USING (lang) ORDER BY a.lang""".stripMargin

  /** Replays the histogram sketch + interpolation exactly: same
    * bucketization (floor((v−lo)/w) clamped to the edge bins), integer
    * target rank ceil(q·N), first bucket with cumulative ≥ target,
    * same operation order in the interpolation — bit-identical doubles
    * on both engines, then the engine-standard round(…, 6). */
  private val HistQuantileSql: String =
    """WITH b AS (
      |  SELECT event_type,
      |         LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 8.0) AS INT), 0), 63) AS bin,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (
      |  SELECT event_type, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(CEIL(0.5  * CAST(sum(c) AS DOUBLE)) AS BIGINT) AS t50,
      |         CAST(CEIL(0.95 * CAST(sum(c) AS DOUBLE)) AS BIGINT) AS t95
      |  FROM b GROUP BY 1),
      |cm AS (
      |  SELECT event_type, bin, c,
      |         SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum
      |  FROM b)
      |SELECT t.event_type, t.n,
      |  (SELECT round(min_by(0.0 + CAST(bin AS DOUBLE) * 8.0
      |            + CAST(t.t50 - (cum - c) AS DOUBLE) / CAST(c AS DOUBLE) * 8.0,
      |          bin), 6)
      |     FROM cm WHERE cm.event_type = t.event_type AND cum >= t.t50) AS p50,
      |  (SELECT round(min_by(0.0 + CAST(bin AS DOUBLE) * 8.0
      |            + CAST(t.t95 - (cum - c) AS DOUBLE) / CAST(c AS DOUBLE) * 8.0,
      |          bin), 6)
      |     FROM cm WHERE cm.event_type = t.event_type AND cum >= t.t95) AS p95
      |FROM t ORDER BY t.event_type""".stripMargin

  /** Shared KMV replay prefix: distinct per-lang bigrams → 60-bit keys
    * (same `md5Key64` recipe as HLL, prefix `kmv:`) → per-lang rank
    * window keeps the 512 minima — the sketch, rebuilt exactly. */
  private val KmvBase: String =
    """WITH tk AS (
      |  SELECT lang, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
      |bg AS (
      |  SELECT lang, unnest(list_transform(generate_series(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1])) AS bg
      |  FROM tk WHERE len(t) >= 2),
      |d AS (SELECT DISTINCT lang, bg FROM bg),
      |kk AS (
      |  SELECT lang, CAST(concat('0x', substr(md5('kmv:' || bg), 1, 15))
      |               AS BIGINT) AS key
      |  FROM d),
      |dk AS (SELECT DISTINCT lang, key FROM kk),
      |r AS (SELECT lang, key,
      |        row_number() OVER (PARTITION BY lang ORDER BY key) AS rn
      |      FROM dk),
      |mins AS (SELECT lang, key, rn FROM r WHERE rn <= 512)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_kmv_distinct" -> (KmvBase +
      """,
        |agg AS (SELECT lang, count(*) AS m,
        |          max(CASE WHEN rn = 512 THEN key END) AS kth
        |        FROM mins GROUP BY 1),
        |ex AS (SELECT lang, count(DISTINCT bg) AS n_exact FROM bg GROUP BY 1)
        |SELECT a.lang, CAST(a.m AS INT) AS m, a.kth AS kth_min,
        |  CASE WHEN a.m < 512 THEN CAST(a.m AS DOUBLE)
        |       ELSE round(CAST(511.0 AS DOUBLE)
        |              * CAST(1152921504606846976.0 AS DOUBLE)
        |              / CAST(a.kth AS DOUBLE), 6) END AS est,
        |  e.n_exact
        |FROM agg a JOIN ex e USING (lang) ORDER BY a.lang""".stripMargin),

    "q_kmv_overlap" -> (KmvBase +
      """,
        |pr AS (SELECT DISTINCT a.lang AS la, b.lang AS lb
        |       FROM mins a JOIN mins b ON a.lang < b.lang),
        |u AS (SELECT DISTINCT p.la, p.lb, m.key
        |      FROM pr p JOIN mins m ON m.lang = p.la OR m.lang = p.lb),
        |ur AS (SELECT la, lb, key,
        |         row_number() OVER (PARTITION BY la, lb ORDER BY key) AS rn
        |       FROM u),
        |uk AS (SELECT la, lb, key FROM ur WHERE rn <= 512),
        |fl AS (SELECT u2.la, u2.lb,
        |         CASE WHEN EXISTS (SELECT 1 FROM mins ma
        |                           WHERE ma.lang = u2.la AND ma.key = u2.key)
        |               AND EXISTS (SELECT 1 FROM mins mb
        |                           WHERE mb.lang = u2.lb AND mb.key = u2.key)
        |         THEN 1 ELSE 0 END AS inboth
        |       FROM uk u2),
        |est AS (SELECT la AS lang_a, lb AS lang_b,
        |          round(CAST(sum(inboth) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |            AS jacc_est
        |        FROM fl GROUP BY 1, 2),
        |n AS (SELECT lang, count(*) AS n FROM d GROUP BY 1),
        |iv AS (SELECT x.lang AS la, y.lang AS lb, count(*) AS i
        |       FROM d x JOIN d y ON x.bg = y.bg AND x.lang < y.lang
        |       GROUP BY 1, 2)
        |SELECT e.lang_a, e.lang_b, e.jacc_est,
        |  round(CAST(coalesce(iv.i, 0) AS DOUBLE)
        |        / CAST(na.n + nb.n - coalesce(iv.i, 0) AS DOUBLE), 6) AS jacc_exact
        |FROM est e
        |LEFT JOIN iv ON iv.la = e.lang_a AND iv.lb = e.lang_b
        |JOIN n na ON na.lang = e.lang_a
        |JOIN n nb ON nb.lang = e.lang_b
        |ORDER BY e.lang_a, e.lang_b""".stripMargin),

    "q_stream_kmv" -> (KmvBase +
      """,
        |agg AS (SELECT lang, count(*) AS m,
        |          max(CASE WHEN rn = 512 THEN key END) AS kth
        |        FROM mins GROUP BY 1),
        |ex AS (SELECT lang, count(DISTINCT bg) AS n_exact FROM bg GROUP BY 1)
        |SELECT a.lang, CAST(a.m AS INT) AS m, a.kth AS kth_min,
        |  CASE WHEN a.m < 512 THEN CAST(a.m AS DOUBLE)
        |       ELSE round(CAST(511.0 AS DOUBLE)
        |              * CAST(1152921504606846976.0 AS DOUBLE)
        |              / CAST(a.kth AS DOUBLE), 6) END AS est,
        |  e.n_exact
        |FROM agg a JOIN ex e USING (lang) ORDER BY a.lang""".stripMargin),

    "q_quantile_sketch" -> HistQuantileSql,

    "q_stream_quantiles" -> HistQuantileSql,

    "q_hll_distinct" -> HllDistinctSql,

    "q_stream_hll" -> HllDistinctSql,

    "q_stream_cms" -> CmsCountsSql,

    "q_cms_counts" -> CmsCountsSql,

    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 6) AS p50,
        |       round(quantile_cont(value, 0.95), 6) AS p95,
        |       round(stddev_pop(value), 6) AS sd
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       count(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // class-based CC prelude (OracleSql.dupClusterPreludeSql): identical
    // output to the naive doc-pairwise replay, budget-fitting at sf1
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()}
         |SELECT doc_id, cluster_id FROM members ORDER BY doc_id""".stripMargin,

    // keeper = longest text per family (tie → min id), same CC chain
    "q_dedup_keep_best" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()},
         |keyed AS (
         |  SELECT d.doc_id, coalesce(m.cluster_id, d.doc_id) AS cluster_id,
         |         length(d.text) AS text_len
         |  FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY cluster_id
         |             ORDER BY text_len DESC, doc_id ASC) AS rn
         |  FROM keyed)
         |SELECT doc_id, cluster_id, text_len
         |FROM ranked WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // same CC chain; fold key = cluster id (own id for singletons)
    "q_group_split" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()},
         |keyed AS (
         |  SELECT d.doc_id, coalesce(m.cluster_id, d.doc_id) AS gkey
         |  FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id)
         |SELECT doc_id, gkey,
         |       CASE WHEN substr(md5(CAST(gkey AS VARCHAR)), 1, 1) = 'f'
         |            THEN 'val' ELSE 'train' END AS split
         |FROM keyed ORDER BY doc_id""".stripMargin,

    "q_dedup_cluster_sizes" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()},
        |multi AS (
        |  SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
        |  FROM (SELECT cluster_id, count(*) AS sz FROM members GROUP BY 1)
        |  GROUP BY 1),
        |single AS (
        |  SELECT CAST(1 AS BIGINT) AS cluster_size,
        |         CAST(count(*) AS BIGINT) AS n_clusters
        |  FROM documents
        |  WHERE doc_id NOT IN (SELECT doc_id FROM members))
        |SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
        |FROM (SELECT * FROM multi UNION ALL SELECT * FROM single)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_top_shingles" ->
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
        |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS shingle
        |  FROM toks WHERE len(t) >= 3)
        |SELECT shingle, count(*) AS df FROM sh
        |GROUP BY 1 ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

    "q_table_stats" ->
      s"""WITH m AS (
         |  SELECT count(*) AS n_rows,
         |         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |         ${OracleSql.sMilliSql("l_quantity")} AS s, count(l_quantity) AS n,
         |         count(DISTINCT l_orderkey) AS ndv_orderkey,
         |         count(DISTINCT l_partkey) AS ndv_partkey,
         |         CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_tax,
         |         min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate
         |  FROM lineitem)
         |SELECT n_rows, min_qty, max_qty,
         |       ${OracleSql.milliMeanSql("s", "n")} AS avg_qty,
         |       ndv_orderkey, ndv_partkey, nulls_tax, min_shipdate, max_shipdate
         |FROM m""".stripMargin,

    "q_fk_integrity" ->
      """SELECT 'lineitems_without_order' AS check, CAST(count(*) AS BIGINT) AS violations
        |FROM lineitem WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders_without_customer', CAST(count(*) AS BIGINT)
        |FROM orders WHERE NOT EXISTS
        |  (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |ORDER BY "check"""".stripMargin,

    "q_db_energy_mean" ->
      """SELECT CAST(ts AS DATE) AS day,
        |       round(10.0 * log10(avg(pow(10.0, value / 500.0))), 6) AS db_energy,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_json_props" ->
      s"""WITH m AS (
         |  SELECT CAST(json_extract_string(props, '$$.k') AS INT) % 10 AS k_bucket,
         |         count(*) AS n, ${OracleSql.sMilliSql("value")} AS s,
         |         count(value) AS nv
         |  FROM events GROUP BY 1)
         |SELECT k_bucket, n, ${OracleSql.milliMeanSql("s", "nv")} AS mean_value
         |FROM m ORDER BY 1""".stripMargin,

    // one UNION of conditional aggregates — the same single-pass shape
    "q_dq_audit" ->
      """WITH base AS (
        |  SELECT sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS null_key,
        |         sum(CASE WHEN value < 0 OR value > 400 THEN 1 ELSE 0 END)
        |           AS value_range,
        |         sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |                    OR ts >= TIMESTAMP '2024-02-01 00:00:00'
        |                  THEN 1 ELSE 0 END) AS ts_domain,
        |         sum(CASE WHEN event_type NOT IN
        |                    ('click', 'view', 'purchase', 'signup')
        |                  THEN 1 ELSE 0 END) AS type_domain
        |  FROM events),
        |dup AS (
        |  SELECT coalesce(sum(c), 0) AS n FROM (
        |    SELECT count(*) AS c FROM events GROUP BY event_id
        |    HAVING count(*) > 1)),
        |rules AS (
        |  SELECT 'null_key' AS rule, CAST(null_key AS BIGINT) AS n FROM base
        |  UNION ALL SELECT 'value_range', CAST(value_range AS BIGINT) FROM base
        |  UNION ALL SELECT 'ts_domain', CAST(ts_domain AS BIGINT) FROM base
        |  UNION ALL SELECT 'type_domain', CAST(type_domain AS BIGINT) FROM base
        |  UNION ALL SELECT 'duplicate_event_id', CAST(n AS BIGINT) FROM dup)
        |SELECT rule, n FROM rules ORDER BY rule""".stripMargin,

    // json_valid guards the parse the way null-on-malformed does in Spark
    "q_quarantine" ->
      """WITH c AS (
        |  SELECT CASE WHEN event_id % 50 = 0 THEN '{oops' || props
        |              ELSE props END AS p, value
        |  FROM events),
        |parsed AS (
        |  SELECT CASE WHEN json_valid(p)
        |              THEN CAST(json_extract_string(p, '$.k') AS INT) END AS k,
        |         value
        |  FROM c)
        |SELECT CASE WHEN k IS NULL THEN 'quarantined' ELSE 'ok' END AS status,
        |       k % 10 AS k_bucket,
        |       count(*) AS n,
        |       round(CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS DOUBLE)
        |             / count(*) / 1e6, 6) AS mean_value
        |FROM parsed GROUP BY 1, 2 ORDER BY 1, 2 NULLS FIRST""".stripMargin,

    "q_gap_report" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events)
        |SELECT user_id, prev_ts AS gap_start, ts AS gap_end,
        |       epoch_us(ts) - epoch_us(prev_ts) AS gap_usecs
        |FROM g
        |WHERE epoch_us(ts) - epoch_us(prev_ts) > 3600000000
        |ORDER BY user_id, gap_start""".stripMargin,

    "q_moving_avg" ->
      s"""WITH m AS (
         |  SELECT event_id, user_id, ts,
         |         CAST(sum(CAST(round(value * 1000, 0) AS BIGINT))
         |              OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         |                    RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
         |              AS HUGEINT) AS s,
         |         count(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
         |               RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
         |           AS trailing_6h_n
         |  FROM events)
         |SELECT event_id, user_id, ts,
         |       ${OracleSql.milliMeanSql("s", "trailing_6h_n")} AS trailing_6h_avg,
         |       trailing_6h_n
         |FROM m ORDER BY event_id""".stripMargin,

    "q_histogram" ->
      s"""WITH m AS (
         |  SELECT CAST(floor(value / 25) AS BIGINT) AS bin, count(*) AS n,
         |         ${OracleSql.sMilliSql("value")} AS s, count(value) AS nv
         |  FROM events GROUP BY 1)
         |SELECT bin, n, ${OracleSql.milliMeanSql("s", "nv")} AS bin_mean
         |FROM m ORDER BY 1""".stripMargin,

    "q_session_window" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) -
        |                   epoch_us(lag(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id)) >= 1800000000
        |              THEN 1 ELSE 0 END AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM m)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_sessionize" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN epoch_us(ts) -
        |                   epoch_us(lag(ts) OVER (PARTITION BY user_id
        |                        ORDER BY ts, event_id)) > 1800000000
        |              THEN 1 ELSE 0 END AS gap
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |         CAST(sum(gap) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM m)
        |SELECT user_id, session_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // bit-by-bit Morton reconstruction (20 bits/dim covers this archive);
    // list_sum returns HUGEINT → CAST back to BIGINT before the div
    "q_zorder_layout" ->
      """WITH e AS (
        |  SELECT CAST(user_id AS INT) AS x,
        |         CAST(floor((epoch_us(ts) - 1704067200000000) / 3600000000.0)
        |              AS INT) AS y
        |  FROM events),
        |z AS (
        |  SELECT x, y,
        |         CAST(list_sum(list_transform(range(0, 20),
        |           i -> ((CAST(x AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i))
        |              + ((CAST(y AS BIGINT) >> i) & 1) * (1::BIGINT << (2*i + 1))))
        |           AS BIGINT) AS zv
        |  FROM e)
        |SELECT CAST(zv // 16384 AS INT) AS file_id, count(*) AS n,
        |       min(x) AS x_min, max(x) AS x_max,
        |       min(y) AS y_min, max(y) AS y_max
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,

    // same strictly-ordered stage chain: min-after-previous-stage CTEs
    "q_funnel" -> FunnelSql,

    // streamed ≡ batch by the time-ordered-ingest contract
    "q_stream_funnel" -> FunnelSql,

    "q_skew_diag" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_keys,
        |       CAST(sum(c) AS BIGINT) AS n_rows, max(c) AS max_n,
        |       round(quantile_cont(c, 0.99), 6) AS p99_n,
        |       round(CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
        |             / CAST(sum(c) AS DOUBLE), 6) AS skew_ratio,
        |       round(CAST(max(c) AS DOUBLE)
        |             / CAST(sum(c) AS DOUBLE), 6) AS top1_share
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // daily-register replay + the same window fan-out and max-merge;
    // register math identical to q_hll_distinct's oracle (p=9, scale 52)
    "q_hll_sliding" ->
      """WITH k AS (
        |  SELECT CAST(ts AS DATE) AS day, user_id,
        |         CAST(concat('0x',
        |               substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))
        |           AS BIGINT) AS key
        |  FROM events),
        |reg AS (SELECT day, key % 512 AS r, key // 512 AS w FROM k),
        |rho AS (
        |  SELECT day, r,
        |         CASE WHEN w = 0 THEN 52 ELSE 52 - length(bin(w)) END AS rho
        |  FROM reg),
        |mxd AS (SELECT day, r, max(rho) AS mrho FROM rho GROUP BY 1, 2),
        |contrib AS (
        |  SELECT day + CAST(i AS INT) AS wday, r, mrho
        |  FROM mxd CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i)),
        |mx AS (SELECT wday, r, max(mrho) AS mrho FROM contrib GROUP BY 1, 2),
        |agg AS (
        |  SELECT wday, CAST(512 - count(*) AS BIGINT) AS v_zero,
        |         CAST(sum(1::BIGINT << (52 - mrho))
        |           + (512 - count(*)) * (1::BIGINT << 52) AS BIGINT)
        |           AS sum_scaled
        |  FROM mx GROUP BY 1),
        |exact AS (
        |  SELECT d.day + CAST(i.i AS INT) AS wday,
        |         count(DISTINCT d.user_id) AS n_exact
        |  FROM (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        |        FROM events) d
        |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS i) i
        |  GROUP BY 1)
        |SELECT a.wday, a.v_zero, a.sum_scaled,
        |       round(CAST(0.7213 AS DOUBLE)
        |               / (CAST(1.0 AS DOUBLE)
        |                  + CAST(1.079 AS DOUBLE) / CAST(512.0 AS DOUBLE))
        |             * CAST(512.0 AS DOUBLE) * CAST(512.0 AS DOUBLE)
        |             * CAST(4503599627370496.0 AS DOUBLE)
        |             / CAST(a.sum_scaled AS DOUBLE), 6) AS est_raw,
        |       e.n_exact
        |FROM agg a JOIN exact e USING (wday) ORDER BY a.wday""".stripMargin,

    // HUGEINT moments = the decimal(38,0) accumulation, exactly
    "q_corr_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_quantity * 100, 0) AS HUGEINT) AS x,
        |         CAST(round(l_extendedprice * 100, 0) AS HUGEINT) AS y,
        |         CAST(round(l_discount * 100, 0) AS HUGEINT) AS z
        |  FROM lineitem),
        |a AS (
        |  SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(z*z) AS szz,
        |         sum(x*y) AS sxy, sum(z*y) AS szy
        |  FROM m GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |       round(CAST(n*sxy - sx*sy AS DOUBLE)
        |             / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |                    * CAST(n*syy - sy*sy AS DOUBLE)), 6)
        |         AS corr_qty_price,
        |       round(CAST(n*szy - sz*sy AS DOUBLE)
        |             / sqrt(CAST(n*szz - sz*sz AS DOUBLE)
        |                    * CAST(n*syy - sy*sy AS DOUBLE)), 6)
        |         AS corr_disc_price
        |FROM a ORDER BY 1""".stripMargin,

    "q_top_paths" ->
      """WITH w AS (
        |  SELECT event_type AS step1,
        |         lead(event_type, 1) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS step2,
        |         lead(event_type, 2) OVER (PARTITION BY user_id
        |                                   ORDER BY ts, event_id) AS step3
        |  FROM events)
        |SELECT step1, step2, step3, count(*) AS n
        |FROM w WHERE step3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, step1, step2, step3
        |LIMIT 20""".stripMargin,

    // NTILE fills earlier tiles first in both engines; the tie-break
    // makes the assignment a total order
    "q_deciles" ->
      """WITH t AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         ntile(10) OVER (PARTITION BY o_orderpriority
        |                         ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |SELECT o_orderpriority, CAST(decile AS INT) AS decile,
        |       count(*) AS n,
        |       round(min(o_totalprice), 2) AS lo,
        |       round(max(o_totalprice), 2) AS hi
        |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_cohort_retention" -> RetentionSql,

    // order-independent state (min-rebase + OR) ⇒ the batch oracle
    // applies with no ingest-order contract at all
    "q_stream_retention" -> RetentionSql,

    // quantile_cont == Spark percentile (linear interpolation) over the
    // SAME micro-unit integers; the outlier compare then sees
    // bit-identical doubles on both engines
    "q_anomaly_mad" ->
      """WITH micro AS (
        |  SELECT event_type AS g,
        |         CAST(round(value * 1e6, 0) AS BIGINT) AS mv FROM events),
        |med AS (
        |  SELECT g, quantile_cont(mv, 0.5) AS med_micro, count(*) AS n
        |  FROM micro GROUP BY 1),
        |dev AS (
        |  SELECT m.g, abs(m.mv - d.med_micro) AS ad, d.med_micro, d.n
        |  FROM micro m JOIN med d ON m.g = d.g),
        |mad AS (SELECT g, quantile_cont(ad, 0.5) AS mad_micro FROM dev GROUP BY 1)
        |SELECT d.g AS event_type, d.n,
        |       round(d.med_micro / 1e6, 6) AS med,
        |       round(m.mad_micro / 1e6, 6) AS mad,
        |       CAST(sum(CASE WHEN d.ad > 3.0 * 1.4826 * m.mad_micro
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m ON d.g = m.g
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,

    // HUGEINT moments over the hourly micro-unit rollup; lag pairing is
    // the same (type, hb + lag) equi-join — lead(k) would misalign on
    // gapped hours (sf0.01 has them).
    "q_acf" ->
      """WITH hourly AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
        |         CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT))
        |              AS HUGEINT) AS x
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, l.lag, a.x, b.x AS y
        |  FROM hourly a
        |  JOIN (SELECT unnest(generate_series(1, 3)) AS lag) l ON true
        |  JOIN hourly b ON b.event_type = a.event_type
        |                AND b.hb = a.hb + l.lag),
        |mom AS (
        |  SELECT event_type, lag, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS INT) AS lag,
        |       CAST(n AS BIGINT) AS n_pairs,
        |       round(CAST(n*sxy - sx*sy AS DOUBLE)
        |             / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
        |                    * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS acf
        |FROM mom ORDER BY 1, 2""".stripMargin,

    // Integer 7·x − Σwin detrending replayed verbatim; range frame on
    // the day number, complete-window filter, isodow == weekday()+1.
    "q_seasonal_decomp" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |         sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS xm
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT day, xm,
        |         sum(xm) OVER (ORDER BY day
        |             RANGE BETWEEN INTERVAL 3 DAY PRECEDING
        |                       AND INTERVAL 3 DAY FOLLOWING) AS swin,
        |         count(*) OVER (ORDER BY day
        |             RANGE BETWEEN INTERVAL 3 DAY PRECEDING
        |                       AND INTERVAL 3 DAY FOLLOWING) AS cwin
        |  FROM daily),
        |tr AS (
        |  SELECT day, xm, swin, 7*xm - swin AS detr7, isodow(day) AS dow
        |  FROM win WHERE cwin = 7),
        |seas AS (
        |  SELECT dow, CAST(sum(detr7) AS DOUBLE) / (7e6 * count(*)) AS seas
        |  FROM tr GROUP BY 1)
        |SELECT t.day, round(t.xm / 1e6, 6) AS x_val,
        |       round(t.swin / 7e6, 6) AS trend,
        |       round(s.seas, 6) AS seasonal,
        |       round(t.detr7 / 7e6 - s.seas, 6) AS residual
        |FROM tr t JOIN seas s ON t.dow = s.dow ORDER BY t.day""".stripMargin,

    // per-customer max month, per-month churn counts, reverse-cumulative
    // at-risk, one exact division
    "q_hazard_curve" ->
      """WITH u AS (
        |  SELECT o_custkey, CAST(max(date_trunc('month', o_orderdate)) AS DATE) AS last_month
        |  FROM orders GROUP BY 1),
        |d AS (SELECT last_month AS month, count(*) AS n_churned
        |      FROM u GROUP BY 1),
        |r AS (
        |  SELECT month, n_churned,
        |         sum(n_churned) OVER (ORDER BY month DESC
        |             ROWS UNBOUNDED PRECEDING) AS n_at_risk
        |  FROM d)
        |SELECT month, CAST(n_at_risk AS BIGINT) AS n_at_risk,
        |       n_churned,
        |       round(CAST(n_churned AS DOUBLE) / n_at_risk, 6) AS hazard
        |FROM r ORDER BY month""".stripMargin,

    // integer-cents leading digit; χ² from the ROUNDED Benford p so
    // the closed form sees bit-identical inputs
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0)
        |           AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g),
        |p AS (
        |  SELECT g.digit, g.n, t.tot,
        |         round(log10(CAST(1.0 AS DOUBLE)
        |                     + CAST(1.0 AS DOUBLE) / g.digit), 6) AS pb
        |  FROM g CROSS JOIN t)
        |SELECT digit, n,
        |       round(CAST(n AS DOUBLE) / tot, 6) AS p_obs,
        |       pb AS p_benford,
        |       round(pow(CAST(n AS DOUBLE) - tot * pb, 2) / (tot * pb), 3)
        |         AS chi2_contrib
        |FROM p ORDER BY digit""".stripMargin,

    // identical pairwise-slope multiset; quantile_cont ≡ Spark
    // percentile over the same doubles
    "q_theilsen" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS x,
        |         CAST(ts AS DATE) - DATE '1970-01-01' AS dn
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(b.x - a.x AS DOUBLE) / (b.dn - a.dn) / 1e6 AS slope
        |  FROM daily a JOIN daily b
        |    ON b.event_type = a.event_type AND b.dn > a.dn)
        |SELECT event_type, count(*) AS n_pairs,
        |       round(quantile_cont(slope, 0.5), 6) AS slope
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,

    // HUGEINT moments, then the identical closed-form double chain in
    // the same operation order (mean = sx/n/1e6; v = num/den/1e12;
    // t = Δmean/√(vA+vB); dof = Welch–Satterthwaite)
    "q_ab_welch" -> WelchSql,

    // streamed moments ≡ batch moments by sum linearity
    "q_stream_welch" -> WelchSql,

    // same HUGEINT moments, the MDE closed form with the conventional
    // z-constant sum spelled identically
    "q_ab_power" ->
      """WITH xs AS (
        |  SELECT event_type, user_id % 2 AS grp,
        |         CAST(CAST(round(value * 1e6, 0) AS BIGINT) AS HUGEINT) AS x
        |  FROM events),
        |m AS (
        |  SELECT event_type, grp, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(x*x) AS sxx
        |  FROM xs GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type,
        |         a.n AS na, a.sx AS sxa, a.sxx AS sxxa,
        |         b.n AS nb, b.sx AS sxb, b.sxx AS sxxb
        |  FROM m a JOIN m b ON a.event_type = b.event_type
        |  WHERE a.grp = 0 AND b.grp = 1),
        |v AS (
        |  SELECT event_type, na, nb,
        |         (1.959964 + 0.841621) *
        |         sqrt(CAST(na*sxxa - sxa*sxa AS DOUBLE)
        |                / CAST(na*na*(na-1) AS DOUBLE) / 1e12
        |              + CAST(nb*sxxb - sxb*sxb AS DOUBLE)
        |                / CAST(nb*nb*(nb-1) AS DOUBLE) / 1e12) AS mde,
        |         CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 1e6 AS ma
        |  FROM j)
        |SELECT event_type,
        |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |       round(mde, 6) AS mde_abs,
        |       round(mde / ma, 6) AS mde_rel
        |FROM v ORDER BY 1""".stripMargin,

    // exact HUGEINT regression moments over the (nation, month) rollup;
    // one double chain at the end, mirroring the Spark expression order
    "q_ols_trend" ->
      """WITH cm AS (
        |  SELECT c.c_nationkey AS nationkey,
        |         CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
        |         CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
        |           AS HUGEINT) AS y
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |xy AS (
        |  SELECT nationkey,
        |         CAST(date_diff('month', DATE '1995-01-01', month)
        |           AS HUGEINT) AS x, y
        |  FROM cm),
        |m AS (
        |  SELECT nationkey, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM xy GROUP BY 1)
        |SELECT nationkey, CAST(n AS BIGINT) AS n_months,
        |       round(CAST(n*sxy - sx*sy AS DOUBLE)
        |             / CAST(n*sxx - sx*sx AS DOUBLE) / 100, 2) AS slope,
        |       round(CAST(sy*sxx - sx*sxy AS DOUBLE)
        |             / CAST(n*sxx - sx*sx AS DOUBLE) / 100, 2) AS intercept,
        |       round(pow(CAST(n*sxy - sx*sy AS DOUBLE), 2)
        |             / (CAST(n*sxx - sx*sx AS DOUBLE)
        |              * CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
        |FROM m ORDER BY 1""".stripMargin,

    // 15-cell contingency rollup; χ² contribution from the exact-integer
    // numerator (n·N − r·c)², floats only in the final division
    "q_chi2_indep" ->
      """WITH cont AS (
        |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |         count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |rm AS (SELECT priority, CAST(sum(n) AS BIGINT) AS nr
        |       FROM cont GROUP BY 1),
        |cmg AS (SELECT status, CAST(sum(n) AS BIGINT) AS nc
        |        FROM cont GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cont)
        |SELECT priority, status, n AS n_obs,
        |       round(CAST(nr*nc AS DOUBLE) / nt, 6) AS expected,
        |       round(pow(CAST(n*nt - nr*nc AS DOUBLE), 2)
        |             / (CAST(nr*nc AS DOUBLE) * nt), 6) AS chi2_contrib
        |FROM cont JOIN rm USING (priority) JOIN cmg USING (status), tt
        |ORDER BY 1, 2""".stripMargin,

    // centi-bucket histogram → integer mid-ranks (2·rank), exact
    // rank sums per group, Dunn z as a closed form over three integers
    "q_rank_ztest" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS v
        |  FROM events),
        |b AS (SELECT v, count(*) AS t FROM ev GROUP BY 1),
        |r AS (
        |  SELECT v, 2 * coalesce(sum(t) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |         + t + 1 AS r2
        |  FROM b),
        |g AS (SELECT event_type, v, count(*) AS ngv FROM ev GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, CAST(sum(ngv) AS BIGINT) AS n_g,
        |         CAST(sum(ngv * r2) AS BIGINT) AS s2
        |  FROM g JOIN r USING (v) GROUP BY 1),
        |tt AS (SELECT CAST(sum(n_g) AS BIGINT) AS nt FROM a)
        |SELECT event_type, n_g,
        |       round(CAST(s2 AS DOUBLE) / 2, 1) AS rank_sum,
        |       round(CAST(s2 AS DOUBLE) / (2 * n_g), 6) AS mean_rank,
        |       round((CAST(s2 - n_g * (nt + 1) AS DOUBLE)
        |              / CAST(2 * n_g AS DOUBLE))
        |             / sqrt(CAST((nt - n_g) * (nt + 1) AS DOUBLE)
        |                    / CAST(12 * n_g AS DOUBLE)), 6) AS dunn_z
        |FROM a, tt ORDER BY 1""".stripMargin,

    // the funnel CTEs + quantile_cont over exact µs longs (nulls — the
    // unconverted — fall out of the aggregate on both engines)
    "q_funnel_latency" -> FunnelLatencySql,

    // streamed stage times ≡ batch (the funnel twin's ordered-slices
    // contract), so the same replay applies
    "q_stream_funnel_latency" -> FunnelLatencySql,

    // quantile_cont over the same micro integers, identical rounding to
    // the integer clip bounds, exact clipped sums
    "q_winsorize" ->
      """WITH m AS (
        |  SELECT event_type, CAST(round(value * 1e6, 0) AS BIGINT) AS mv
        |  FROM events),
        |c AS (
        |  SELECT event_type,
        |         CAST(round(quantile_cont(mv, 0.01), 0) AS BIGINT) AS lo,
        |         CAST(round(quantile_cont(mv, 0.99), 0) AS BIGINT) AS hi
        |  FROM m GROUP BY 1),
        |j AS (
        |  SELECT m.event_type, m.mv, c.lo, c.hi,
        |         greatest(c.lo, least(c.hi, m.mv)) AS cv
        |  FROM m JOIN c ON m.event_type = c.event_type)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(CASE WHEN mv < lo OR mv > hi THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_clipped,
        |       round(CAST(min(lo) AS DOUBLE) / 1e6, 6) AS p1,
        |       round(CAST(min(hi) AS DOUBLE) / 1e6, 6) AS p99,
        |       round(CAST(sum(mv) AS DOUBLE) / count(*) / 1e6, 6) AS raw_mean,
        |       round(CAST(sum(cv) AS DOUBLE) / count(*) / 1e6, 6) AS wins_mean
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // month×class rollup + monthly totals, exact share divisions
    "q_category_share" ->
      """WITH cells AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         o_orderpriority AS priority, count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |tot AS (
        |  SELECT month, CAST(sum(n) AS BIGINT) AS nm FROM cells GROUP BY 1)
        |SELECT c.month, c.priority, c.n,
        |       round(CAST(c.n AS DOUBLE) / t.nm, 6) AS share
        |FROM cells c JOIN tot t ON c.month = t.month
        |ORDER BY 1, 2""".stripMargin,

    // first-active-day cohorts, micro-exact purchase sums, calendar-
    // bounded cumulative window
    "q_cohort_ltv" ->
      """WITH c AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        |  FROM events GROUP BY 1),
        |cell AS (
        |  SELECT c.cohort_day,
        |         CAST(ts AS DATE) - c.cohort_day AS day_offset,
        |         count(*) AS n_purchases,
        |         CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT)
        |           AS rm
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
        |       n_purchases,
        |       round(CAST(rm AS DOUBLE) / 1e6, 6) AS revenue,
        |       round(CAST(sum(rm) OVER (PARTITION BY cohort_day
        |           ORDER BY day_offset
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS DOUBLE) / 1e6, 6) AS cum_revenue
        |FROM cell ORDER BY 1, 2""".stripMargin,

    // the same per-user ignore-nulls carry + 24 h gate, micro-exact sums
    "q_attribution" -> AttributionSql,

    // streamed ≡ batch by the time-ordered-slices contract
    "q_stream_attribution" -> AttributionSql,

    // bounded cent-histogram mid-ranks, HUGEINT Σt·v·r2, one closed-form
    // double chain — identical operation order to the Spark side
    "q_gini" ->
      """WITH o AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS v
        |  FROM orders),
        |b AS (SELECT priority, v, count(*) AS t FROM o GROUP BY 1, 2),
        |r AS (
        |  SELECT priority, v, t,
        |         2 * coalesce(sum(t) OVER (PARTITION BY priority ORDER BY v
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + t + 1 AS r2
        |  FROM b),
        |a AS (
        |  SELECT priority, CAST(sum(t) AS BIGINT) AS n,
        |         sum(CAST(t AS HUGEINT) * v) AS sx,
        |         sum(CAST(t AS HUGEINT) * v * r2) AS srx2
        |  FROM r GROUP BY 1)
        |SELECT priority, n,
        |       round(CAST(sx AS DOUBLE) / n / 100, 2) AS mean_price,
        |       round(CAST(srx2 AS DOUBLE)
        |             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
        |             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
        |FROM a ORDER BY 1""".stripMargin,

    // fixed band domain → entropy is a closed form over three exact
    // integers per class, identical term order to the Spark expression
    "q_l_diversity" ->
      """WITH c AS (
        |  SELECT c_mktsegment AS segment, c_nationkey AS nationkey,
        |         CASE WHEN c_acctbal < 0 THEN 'neg'
        |              WHEN c_acctbal < 5000 THEN 'low'
        |              ELSE 'high' END AS band
        |  FROM customer),
        |g AS (
        |  SELECT segment, nationkey, count(*) AS n,
        |         CAST(sum(CASE WHEN band = 'neg' THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |         CAST(sum(CASE WHEN band = 'low' THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        |         CAST(sum(CASE WHEN band = 'high' THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |  FROM c GROUP BY 1, 2)
        |SELECT segment, nationkey, n,
        |       CAST(n_neg > 0 AS INT) + CAST(n_low > 0 AS INT)
        |         + CAST(n_high > 0 AS INT) AS l_distinct,
        |       round(ln(CAST(n AS DOUBLE)) -
        |         (CASE WHEN n_neg > 0
        |               THEN CAST(n_neg AS DOUBLE) * ln(CAST(n_neg AS DOUBLE))
        |               ELSE 0 END
        |          + CASE WHEN n_low > 0
        |                 THEN CAST(n_low AS DOUBLE) * ln(CAST(n_low AS DOUBLE))
        |                 ELSE 0 END
        |          + CASE WHEN n_high > 0
        |                 THEN CAST(n_high AS DOUBLE) * ln(CAST(n_high AS DOUBLE))
        |                 ELSE 0 END) / n, 6) AS entropy,
        |       (n_neg > 0 AND n_low > 0 AND n_high > 0) AS l_ok
        |FROM g ORDER BY 1, 2""".stripMargin,

    // dyadic weights pow(0.5, gap) make every Σx·w term exact — the
    // windowed sums are order-independent by representability, one
    // float division at the end
    "q_ewma_smooth" ->
      """WITH d0 AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS BIGINT) AS x,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d AS (SELECT *, day - DATE '1970-01-01' AS dn FROM d0),
        |j AS (
        |  SELECT a.event_type, a.day, a.x, a.n,
        |         sum(CAST(b.x AS DOUBLE) * pow(0.5, a.dn - b.dn)) AS sxw,
        |         sum(CAST(b.n AS DOUBLE) * pow(0.5, a.dn - b.dn)) AS snw
        |  FROM d a JOIN d b ON b.event_type = a.event_type
        |    AND b.dn <= a.dn AND b.dn > a.dn - 8
        |  GROUP BY 1, 2, 3, 4)
        |SELECT event_type, day,
        |       round(CAST(x AS DOUBLE) / n / 1e6, 6) AS raw_mean,
        |       round(sxw / snw / 1e6, 6) AS ewma
        |FROM j ORDER BY 1, 2""".stripMargin,

    // both counter matrices rebuilt with the shared md5-field recipe,
    // dot per row over matching (r,c) cells (absent cells are zeros and
    // contribute nothing), min of the four dots
    "q_join_card" ->
      """WITH rr AS (SELECT unnest(generate_series(0, 3)) AS r),
        |ec AS (
        |  SELECT r.r,
        |         CAST(concat('0x', substr(md5('jc:' ||
        |              CAST(user_id AS VARCHAR)), r.r * 8 + 1, 8))
        |              AS BIGINT) % 512 AS c,
        |         count(*) AS n
        |  FROM events CROSS JOIN rr r GROUP BY 1, 2),
        |oc AS (
        |  SELECT r.r,
        |         CAST(concat('0x', substr(md5('jc:' ||
        |              CAST(o_custkey AS VARCHAR)), r.r * 8 + 1, 8))
        |              AS BIGINT) % 512 AS c,
        |         count(*) AS n
        |  FROM orders CROSS JOIN rr r GROUP BY 1, 2),
        |dots AS (
        |  SELECT e.r, CAST(sum(e.n * o.n) AS BIGINT) AS dot
        |  FROM ec e JOIN oc o ON e.r = o.r AND e.c = o.c GROUP BY 1),
        |est AS (SELECT min(dot) AS est_card FROM dots),
        |ex AS (
        |  SELECT count(*) AS exact_card
        |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
        |SELECT est.est_card, ex.exact_card FROM est CROSS JOIN ex""".stripMargin,

    // integer numerator n·prefix − idx·T replayed verbatim; one final
    // division, earliest-day peak tie-break
    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         sum(CAST(round(value * 1e6, 0) AS BIGINT)) AS x
        |  FROM events GROUP BY 1, 2),
        |sc AS (
        |  SELECT event_type, day,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY day) AS idx,
        |         sum(x) OVER (PARTITION BY event_type ORDER BY day
        |                      ROWS UNBOUNDED PRECEDING) AS prefix,
        |         count(*) OVER (PARTITION BY event_type) AS n,
        |         sum(x) OVER (PARTITION BY event_type) AS t
        |  FROM daily),
        |nm AS (
        |  SELECT event_type, day, n,
        |         n * prefix - idx * t AS num
        |  FROM sc),
        |pk AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |            ORDER BY abs(num) DESC, day) AS pk
        |  FROM nm)
        |SELECT event_type, day,
        |       round(CAST(num AS DOUBLE) / (n * 1e6), 6) AS cusum,
        |       CASE WHEN pk = 1 THEN 1 ELSE 0 END AS is_peak
        |FROM pk ORDER BY 1, 2""".stripMargin,
  )

  /** Shared by q_ab_welch and q_stream_welch (streamed moments ≡ batch
    * moments by sum linearity): HUGEINT moments, then the identical
    * closed-form double chain in the same operation order (mean =
    * sx/n/1e6; v = num/den/1e12; t = Δmean/√(vA+vB); dof =
    * Welch–Satterthwaite). */
  private lazy val WelchSql: String =
      """WITH xs AS (
        |  SELECT event_type, user_id % 2 AS grp,
        |         CAST(CAST(round(value * 1e6, 0) AS BIGINT) AS HUGEINT) AS x
        |  FROM events),
        |m AS (
        |  SELECT event_type, grp, CAST(count(*) AS HUGEINT) AS n,
        |         sum(x) AS sx, sum(x*x) AS sxx
        |  FROM xs GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type,
        |         a.n AS na, a.sx AS sxa, a.sxx AS sxxa,
        |         b.n AS nb, b.sx AS sxb, b.sxx AS sxxb
        |  FROM m a JOIN m b ON a.event_type = b.event_type
        |  WHERE a.grp = 0 AND b.grp = 1),
        |v AS (
        |  SELECT event_type, na, nb,
        |         CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) / 1e6
        |           - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE) / 1e6
        |           AS md,
        |         CAST(na*sxxa - sxa*sxa AS DOUBLE)
        |           / CAST(na*na*(na-1) AS DOUBLE) / 1e12 AS va,
        |         CAST(nb*sxxb - sxb*sxb AS DOUBLE)
        |           / CAST(nb*nb*(nb-1) AS DOUBLE) / 1e12 AS vb
        |  FROM j)
        |SELECT event_type,
        |       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |       round(md, 6) AS mean_diff,
        |       round(md / sqrt(va + vb), 6) AS t_stat,
        |       round(pow(va + vb, 2)
        |             / (pow(va, 2) / (CAST(na AS DOUBLE) - 1)
        |              + pow(vb, 2) / (CAST(nb AS DOUBLE) - 1)), 3) AS dof
        |FROM v ORDER BY 1""".stripMargin

  /** Shared by q_attribution and its streaming twin (streamed ≡ batch
    * by the time-ordered-slices contract): per-user IGNORE NULLS carry
    * of the last non-purchase touch, 24 h gate, micro-exact revenue. */
  private lazy val AttributionSql: String =
      """WITH t AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         last_value(CASE WHEN event_type <> 'purchase'
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS touch_type,
        |         last_value(CASE WHEN event_type <> 'purchase'
        |                         THEN ts END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS touch_ts
        |  FROM events),
        |p AS (
        |  SELECT CASE WHEN touch_ts IS NOT NULL
        |              AND epoch_us(ts) - epoch_us(touch_ts)
        |                  <= CAST(86400 AS BIGINT) * 1000000
        |              THEN touch_type ELSE 'direct' END AS channel,
        |         CAST(ts AS DATE) AS day, value
        |  FROM t WHERE event_type = 'purchase')
        |SELECT channel, day, count(*) AS n_purchases,
        |       round(CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT))
        |             AS DOUBLE) / 1e6, 6) AS revenue
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The Welch closed form over a (event_type, grp, n, sx, sxx)
    * DECIMAL(38,0) moment frame — shared by q_ab_welch (batch moments)
    * and q_stream_welch (state-store moments; bit-identical by sum
    * linearity, so both feed the identical double chain). Callers
    * localCheckpoint the moment frame: the A/B sides are two filters of
    * a 10-row table, and a lazy frame would re-derive the aggregate —
    * or re-run the drained stream — once per side. */
  private def welchFromMoments(mom: DataFrame): DataFrame = {
    def side(g: Int, suf: String) = mom.filter(col("grp") === g)
      .select(col("event_type"), col("n").as(s"n$suf"),
        col("sx").as(s"sx$suf"), col("sxx").as(s"sxx$suf"))
    // per-side mean and unbiased variance from the integer moments;
    // vOver = s²/n = (n·Σx²−(Σx)²) / (n²·(n−1)) in micro² units
    def mean(n: String, sx: String) =
      col(sx).cast("double") / col(n).cast("double") / 1e6
    def vOver(n: String, sx: String, sxx: String) =
      (col(n) * col(sxx) - col(sx) * col(sx)).cast("double") /
        (col(n) * col(n) * (col(n) - 1)).cast("double") / 1e12
    side(0, "a").join(side(1, "b"), "event_type")
      .select(col("event_type"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(mean("na", "sxa") - mean("nb", "sxb"), 6).as("mean_diff"),
        round((mean("na", "sxa") - mean("nb", "sxb")) /
          sqrt(vOver("na", "sxa", "sxxa") + vOver("nb", "sxb", "sxxb")),
          6).as("t_stat"),
        round(
          pow(vOver("na", "sxa", "sxxa") + vOver("nb", "sxb", "sxxb"), 2) /
            (pow(vOver("na", "sxa", "sxxa"), 2) /
              (col("na").cast("double") - 1) +
             pow(vOver("nb", "sxb", "sxxb"), 2) /
              (col("nb").cast("double") - 1)), 3).as("dof"))
      .orderBy("event_type")
  }

  private lazy val RetentionSql: String =
      """WITH active AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (SELECT u, min(day) AS cohort_day FROM active GROUP BY 1)
        |SELECT c.cohort_day,
        |       date_diff('day', c.cohort_day, a.day) AS day_offset,
        |       count(*) AS n_active
        |FROM active a JOIN cohort c ON a.u = c.u
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // lazy: referenced by oracleSql ABOVE their declarations — an eager
  // val would still be null when the map literal is built
  /** The funnel stage CTEs, shared by q_funnel/q_stream_funnel (counts)
    * and q_funnel_latency (conversion-time percentiles). */
  private lazy val FunnelCtes: String =
      """WITH entered AS (
        |  SELECT user_id AS u,
        |         min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY 1
        |  HAVING min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL),
        |s2 AS (
        |  SELECT e.u, min(ev.ts) AS t2
        |  FROM events ev JOIN entered e ON ev.user_id = e.u
        |  WHERE ev.event_type = 'click' AND ev.ts > e.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT s.u, min(ev.ts) AS t3
        |  FROM events ev JOIN s2 s ON ev.user_id = s.u
        |  WHERE ev.event_type = 'purchase' AND ev.ts > s.t2 GROUP BY 1)""".stripMargin

  private lazy val FunnelLatencySql: String = FunnelCtes +
      """
        |SELECT CAST(e.t1 AS DATE) AS cohort_day,
        |       count(*) AS n_entered,
        |       count(s3.t3) AS n_converted,
        |       round(quantile_cont(epoch_us(s3.t3) - epoch_us(e.t1), 0.5)
        |             / 1e6, 6) AS p50_s,
        |       round(quantile_cont(epoch_us(s3.t3) - epoch_us(e.t1), 0.9)
        |             / 1e6, 6) AS p90_s
        |FROM entered e
        |LEFT JOIN s2 ON e.u = s2.u
        |LEFT JOIN s3 ON e.u = s3.u
        |GROUP BY 1 ORDER BY 1""".stripMargin

  private lazy val FunnelSql: String = FunnelCtes +
      """
        |SELECT CAST(e.t1 AS DATE) AS cohort_day,
        |       count(*) AS n_entered,
        |       count(s2.t2) AS n_clicked,
        |       count(s3.t3) AS n_purchased
        |FROM entered e
        |LEFT JOIN s2 ON e.u = s2.u
        |LEFT JOIN s3 ON e.u = s3.u
        |GROUP BY 1 ORDER BY 1""".stripMargin
}
