package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Bench.{coldContended, warmContended, selfHistoryContended,
  warmInversion, parseQueryMap, pregateRatio, pregateOk, calibrationQueries,
  quietRemeasureAdmitted, detailOutPath, Timing}

/** Pins the contended-repair decision logic against the measured
  * scenarios from rounds 6-10 (PERF.md round 10 "warm-pass inversion
  * forensics"). The bench box suffers co-tenant interference its own
  * loadavg cannot always see; these predicates decide which outlier
  * cells get a rerun-and-keep-min repair — and, as importantly, which
  * genuine costs must NOT be repaired away. */
class BenchGateSpec extends AnyFunSuite {
  private val Thresh = 8.0 // max(4, 32/4) — the 32-cpu box's threshold

  // ---- cold side: load-gated only -----------------------------------

  test("r7 scenario: cold co-load visible in loadavg → repaired") {
    // 46.6 s cold for a 2.5 s query while a competing 30-thread JVM
    // drove the 1-min loadavg past 30
    assert(coldContended(Timing(46.6, 50.0, 31.0), warmWall = 2.5, Thresh))
  }

  test("r8 scenario: genuine cold start (codegen burns real CPU, box quiet) → NOT repaired") {
    // q1_agg-style: cold 2.5 s vs warm 0.5 s from one-time codegen/JIT;
    // cpu 6x the warm pass would mimic thrash if cold used cpu signals
    assert(!coldContended(Timing(2.5, 2.4, 2.0), warmWall = 0.5, Thresh))
  }

  test("cold page-cache I/O (wall without CPU, box quiet) → NOT repaired") {
    // blocked I/O bills no process CPU — mimics the starvation
    // signature, which is exactly why cold ignores the cpu signals
    assert(!coldContended(Timing(6.0, 1.6, 2.0), warmWall = 1.5, Thresh))
  }

  test("cold gate needs the 3x ratio and the 1 s floor") {
    assert(!coldContended(Timing(2.9, 3.0, 31.0), warmWall = 1.0, Thresh))
    assert(!coldContended(Timing(0.9, 1.0, 31.0), warmWall = 0.1, Thresh))
    assert(!coldContended(Timing(46.6, 50.0, 31.0), warmWall = -1.0, Thresh))
  }

  // ---- warm side: load OR starvation OR thrash ----------------------

  test("r10 scenario: warm thrash (identical plan, 12x the cycles, loadavg quiet) → repaired") {
    // q_dedup_ngram run 2: warm 66.2 s / 109.5 cpu-s vs cold 4.2 s /
    // 9.0 cpu-s at loadavg ~3 — co-tenant memory-bandwidth interference
    assert(warmContended(Timing(66.2, 109.5, 3.4), coldRepairedWall = 4.2,
      coldBest = Timing(4.2, 9.0, 2.7), Thresh))
  }

  test("warm starvation (wall without work) → repaired") {
    // wall 10x but cpu flat vs cold: scheduling lost to processes or
    // cgroup throttling loadavg can't see
    assert(warmContended(Timing(10.0, 1.5, 2.0), coldRepairedWall = 1.0,
      coldBest = Timing(1.0, 1.4, 2.0), Thresh))
  }

  test("warm visible co-load → repaired even with ambiguous cpu") {
    assert(warmContended(Timing(9.0, 4.0, 31.0), coldRepairedWall = 2.0,
      coldBest = Timing(2.0, 1.8, 2.0), Thresh))
  }

  test("genuine warm regression (proportional CPU, quiet box) → NOT repaired") {
    // 4x wall backed by ~2.5x cpu on a quiet box: real work (e.g. a
    // state-dependent plan change) — must ship, not be repaired away
    assert(!warmContended(Timing(8.0, 25.0, 2.0), coldRepairedWall = 2.0,
      coldBest = Timing(2.0, 10.0, 2.0), Thresh))
  }

  test("r10 scenario: real-work warm growth (state accumulation) → NOT repaired") {
    // q_stream_neardup shipped 2.03 s cold → 9.74 s warm with cpu 8.93 →
    // 20.40 on a quiet box: the warm pass did MORE REAL WORK (state-store
    // providers from ~30 prior streaming drivers piling GC pressure onto
    // the pass). cpu_warm/cpu_cold = 2.28 sits between the starvation
    // (<2×) and thrash (>3×) signals — by design: the gate repairs
    // MEASUREMENT artifacts, never workload growth. The fix belongs in
    // the workload (per-query StateStoreBridge.unloadAll(), this round),
    // not in the repair logic — a gate loose enough to catch this would
    // also repair away genuine state-dependent plan regressions.
    assert(!warmContended(Timing(9.74, 20.40, 2.5), coldRepairedWall = 2.03,
      coldBest = Timing(2.03, 8.93, 2.2), Thresh))
    // and the same shape for q_stream_kmv (1.38 → 6.18 s, cpu 2.57 → 7.39):
    // cpu ratio 2.88, still inside the real-work band
    assert(!warmContended(Timing(6.18, 7.39, 2.5), coldRepairedWall = 1.38,
      coldBest = Timing(1.38, 2.57, 2.2), Thresh))
  }

  test("thrashed-cold masking: corroboration must use the REPAIRED cold timing") {
    // cold pass thrashed (66 s / 109 cpu-s), repaired to 4.2 s. A warm
    // regression at 14 s / 25 cpu-s: against the RAW cold cpu (109) the
    // starvation test (25 < 2×109) would fire and 'repair' a genuine
    // regression; against the repaired timing (9 cpu-s) neither cpu
    // signal fires (25 sits between 2×9=18 and 3×9=27) — the regression
    // correctly ships unrepaired.
    val warmReg = Timing(14.0, 25.0, 2.0)
    val rawCold = Timing(66.0, 109.0, 3.0)
    val repairedCold = Timing(4.2, 9.0, 2.5)
    assert(warmContended(warmReg, 4.2, rawCold, Thresh),
      "raw cold timing lets the regression masquerade as contended")
    assert(!warmContended(warmReg, 4.2, repairedCold, Thresh),
      "repaired cold timing correctly declines to repair a real regression")
  }

  // ---- within-run warm>cold inversion (r12 verdict "What's wrong" #2) --

  test("r12 scenario: q_video_keyframes 9.02 s warm vs 5.42 s cold in the " +
      "driver artifact — under every 3x gate, caught by the inversion flag") {
    val w = Timing(9.02, 18.0, 3.0)
    assert(!warmContended(w, coldRepairedWall = 5.42,
      coldBest = Timing(5.42, 12.0, 2.5), Thresh),
      "precondition: the 3x warm gate is blind to this shape")
    assert(warmInversion(w, coldRepairedWall = 5.42))
  }

  test("warm inversion needs the 1.5x ratio, the 1 s floor, and a live cold") {
    // normal warm speedup, and mild jitter inside 1.5x: never flag
    assert(!warmInversion(Timing(3.0, 6.0, 2.0), coldRepairedWall = 5.0))
    assert(!warmInversion(Timing(7.0, 14.0, 2.0), coldRepairedWall = 5.0))
    // sub-second noise stays exempt even at large ratios
    assert(!warmInversion(Timing(0.9, 1.0, 2.0), coldRepairedWall = 0.3))
    // failed passes never flag
    assert(!warmInversion(Timing(-1.0, -1.0, 2.0), coldRepairedWall = 5.0))
    assert(!warmInversion(Timing(9.0, 18.0, 2.0), coldRepairedWall = -1.0))
  }

  // ---- self-history corroboration (r11 blind spot) -------------------

  test("r11 scenario: q_salted_join 20.3 s cold with ~1x-wall CPU and calm " +
      "loadavg — same-run gates miss it, the quiet baseline flags it") {
    // driver artifact: cold 20.3 s / 21 cpu-s / loadavg under threshold,
    // warm 7+ s (both passes degraded together, so neither 3x-other-pass
    // gate fires); prior quiet rounds recorded ~2 s
    val c = Timing(20.3, 21.0, 6.0)
    assert(!coldContended(c, warmWall = 7.0, Thresh),
      "precondition: the same-run cold gate is blind to this shape")
    assert(selfHistoryContended(c, quietBaseline = 2.1))
  }

  test("self-history needs starvation-shaped CPU: a real 3x regression " +
      "doing proportional parallel work must NOT flag") {
    // wall 3.5x the quiet baseline but cpu 40 s ≈ 6x wall on 32 threads:
    // the run genuinely did that much work (plan change) — ship it
    assert(!selfHistoryContended(Timing(7.0, 40.0, 2.0), quietBaseline = 2.0))
  }

  test("self-history needs the 3x-baseline ratio, the 1 s floor, a " +
      "recorded baseline, and a usable cpu reading") {
    assert(!selfHistoryContended(Timing(5.5, 5.0, 2.0), quietBaseline = 2.0))
    assert(!selfHistoryContended(Timing(0.9, 0.5, 2.0), quietBaseline = 0.1))
    assert(!selfHistoryContended(Timing(20.3, 21.0, 6.0), quietBaseline = -1.0))
    assert(!selfHistoryContended(Timing(20.3, -1.0, 6.0), quietBaseline = 2.0))
  }

  test("baseline parsing: detail-line format round-trips the query maps, " +
      "missing fields and empty maps degrade to empty") {
    val line = """{"metric":"detail","value":42.0,"unit":"sec",""" +
      """"queries":{"q_a":1.25,"q_b":20.5},""" +
      """"queries_warm":{"q_a":0.75,"q_b":7.2},""" +
      """"contended":[],"sf":"/root/testdata/sf0.1"}"""
    assert(parseQueryMap(line, "queries") ==
      Map("q_a" -> 1.25, "q_b" -> 20.5))
    assert(parseQueryMap(line, "queries_warm") ==
      Map("q_a" -> 0.75, "q_b" -> 7.2))
    assert(parseQueryMap(line, "nope").isEmpty)
    assert(parseQueryMap("""{"queries":{}}""", "queries").isEmpty)
  }

  test("committed BENCH_BASELINE.json is a quiet artifact the gate can " +
      "trust: parseable, warm <= cold, and every contended flag is a " +
      "REPAIRED transient (committed reading below the recorded " +
      "pre-repair one), per the r12 protocol") {
    val p = java.nio.file.Paths.get("BENCH_BASELINE.json")
    assume(java.nio.file.Files.exists(p))
    val s = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val cold = parseQueryMap(s, "queries")
    val warm = parseQueryMap(s, "queries_warm")
    assert(cold.size >= 200 && warm.size == cold.size)
    assert(cold.values.forall(_ > 0) && warm.values.forall(_ > 0))
    assert(warm.values.sum <= cold.values.sum,
      "warm suite total must not exceed cold")
    // literal zero-flag runs are rare on this box (PERF.md r12); the
    // trust property is that a flag marks a transient the in-run gate
    // CAUGHT AND REPAIRED: the shipped reading must sit strictly below
    // the recorded pre-repair reading in repaired_cold/repaired_warm
    val contended = """"contended":\[([^\]]*)\]""".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty)
    val repC = parseQueryMap(s, "repaired_cold")
    val repW = parseQueryMap(s, "repaired_warm")
    contended.foreach { q =>
      val repaired =
        repC.get(q).exists(orig => cold.get(q).exists(_ < orig)) ||
        repW.get(q).exists(orig => warm.get(q).exists(_ < orig))
      assert(repaired, s"contended cell $q shipped without a repair " +
        "(no pre-repair reading above the committed one)")
    }
    // ...and bound every repaired reading against SELF-HISTORY (the
    // prior round's committed quiet baseline, BENCH_BASELINE_PREV.json —
    // refreshed together with BENCH_BASELINE.json each round): a repair
    // only has to improve on the transient, so without this bound a
    // still-inflated cell could ship in the baseline of record. The
    // committed reading must sit at or below the 3x self-history flag
    // threshold of its prior quiet value (cells new this round have no
    // prior and are exempt).
    // ...the calibration priors for the host-health pregate, once the
    // baseline carries them (r14+), must be complete and positive —
    // a zero/negative prior silently disables its cell's ratio
    val pg = parseQueryMap(s, "pregate_cells")
    if (pg.nonEmpty) {
      assert(pg.keySet == calibrationQueries.map(_._1).toSet,
        s"pregate_cells in the baseline (${pg.keySet}) must cover exactly " +
          "the calibration plans")
      assert(pg.values.forall(_ > 0))
      // ...and the priors must come from a pregate-clean source run (r14
      // ADVICE): a pregate_ok:false artifact spliced as baseline would
      // carry degraded-host priors that loosen every future pregate
      assert(s.contains("\"pregate_ok\":true"),
        "a baseline carrying pregate_cells must itself be pregate-clean " +
          "(pregate_ok:true) — degraded priors loosen every future gate")
    }
    val prevP = java.nio.file.Paths.get("BENCH_BASELINE_PREV.json")
    if (java.nio.file.Files.exists(prevP)) {
      val ps = new String(java.nio.file.Files.readAllBytes(prevP), "UTF-8")
      val prevCold = parseQueryMap(ps, "queries")
      val prevWarm = parseQueryMap(ps, "queries_warm")
      contended.foreach { q =>
        prevCold.get(q).foreach { p => cold.get(q).foreach { c =>
          assert(c <= 3 * p, s"contended cell $q ships cold=$c, still above " +
            s"3x its prior quiet baseline $p — the repair did not reach " +
            "quiet-class values") } }
        prevWarm.get(q).foreach { p => warm.get(q).foreach { w =>
          assert(w <= 3 * p, s"contended cell $q ships warm=$w, still above " +
            s"3x its prior quiet baseline $p — the repair did not reach " +
            "quiet-class values") } }
      }
    }
  }

  // ---- host-health pregate (r13 verdict #1) ---------------------------

  test("r13 scenario: the uniform ~1.55x degraded-host headwind trips the " +
      "pregate before a single contract cell is measured") {
    // the r13 bench of record shipped 785.3 s (2.18x the gate) from an
    // hours-long co-tenant window that inflated 240 unrelated cells by a
    // median 1.55x — per-cell repair gates can only re-run INSIDE the
    // same window; the pregate is the whole-run precondition
    val priors = Map("cal_scan_agg" -> 0.8, "cal_shuffle_join" -> 1.2,
      "cal_cpu" -> 0.5)
    val degraded = priors.view.mapValues(_ * 1.55).toMap
    val r = pregateRatio(degraded, priors)
    assert(math.abs(r - 1.55) < 1e-9)
    assert(!pregateOk(r, maxRatio = 1.3))
  }

  test("healthy host (readings at/near priors) passes the pregate") {
    val priors = Map("cal_scan_agg" -> 0.8, "cal_shuffle_join" -> 1.2,
      "cal_cpu" -> 0.5)
    val healthy = Map("cal_scan_agg" -> 0.85, "cal_shuffle_join" -> 1.1,
      "cal_cpu" -> 0.55)
    assert(pregateOk(pregateRatio(healthy, priors), maxRatio = 1.3))
  }

  test("pregate ratio is the MEDIAN: one cell tripping alone (page-cache " +
      "miss on the scan cell) must not stall the suite") {
    val priors = Map("cal_scan_agg" -> 0.8, "cal_shuffle_join" -> 1.2,
      "cal_cpu" -> 0.5)
    val oneBad = Map("cal_scan_agg" -> 4.0, // 5x on its own
      "cal_shuffle_join" -> 1.25, "cal_cpu" -> 0.5)
    val r = pregateRatio(oneBad, priors)
    assert(r < 1.3, s"median should ignore the lone outlier, got $r")
    assert(pregateOk(r, maxRatio = 1.3))
  }

  test("pregate with no usable priors returns -1 and PASSES (first round " +
      "at an sf, missing or sf-mismatched baseline): no evidence is not " +
      "degraded") {
    assert(pregateRatio(Map("cal_cpu" -> 0.5), Map.empty) == -1.0)
    assert(pregateRatio(Map.empty, Map("cal_cpu" -> 0.5)) == -1.0)
    // failed readings (-1 wall) and zero/negative priors contribute nothing
    assert(pregateRatio(Map("cal_cpu" -> -1.0), Map("cal_cpu" -> 0.5)) == -1.0)
    assert(pregateRatio(Map("cal_cpu" -> 0.5), Map("cal_cpu" -> 0.0)) == -1.0)
    assert(pregateOk(-1.0, maxRatio = 1.3))
  }

  test("calibration cells are dedicated plans, never contract queries — " +
      "running a contract query pre-suite would warm its own cold reading") {
    val cal = calibrationQueries.map(_._1).toSet
    assert(cal == Set("cal_scan_agg", "cal_shuffle_join", "cal_cpu"))
    assert(cal.intersect(SparkEntry.queries.keySet).isEmpty)
  }

  test("pregate ratio takes the UPPER median on an even count (r15): with " +
      "one prior missing, a host showing 1.2x/2.5x must NOT pass on the " +
      "lenient lower reading") {
    val priors = Map("cal_scan_agg" -> 1.0, "cal_shuffle_join" -> 1.0)
    val readings = Map("cal_scan_agg" -> 1.2, "cal_shuffle_join" -> 2.5)
    val r = pregateRatio(readings, priors)
    assert(math.abs(r - 2.5) < 1e-9, s"expected the upper median, got $r")
    assert(!pregateOk(r, maxRatio = 1.3))
    // odd counts keep the true median (lone page-cache outlier tolerated)
    assert(math.abs(pregateRatio(
      readings + ("cal_cpu" -> 1.1), priors + ("cal_cpu" -> 1.0)) - 1.2) < 1e-9)
  }

  // ---- end-of-run quiet re-measure (r14 verdict #1) -------------------

  test("quiet re-measure admission is STRICT: both probes must be green " +
      "readings against real priors") {
    // the happy path: host measurably quiet before and after the block
    assert(quietRemeasureAdmitted(0.95, 1.05, maxRatio = 1.3))
    // degraded on either side → the re-measure readings must not replace
    // the conservative flagged ones
    assert(!quietRemeasureAdmitted(1.6, 0.9, maxRatio = 1.3))
    assert(!quietRemeasureAdmitted(0.9, 1.6, maxRatio = 1.3))
    // -1 "no usable priors" PASSES the start pregate (no evidence is not
    // degraded) but must NOT admit a re-measure: an unverifiable quiet
    // window could silently lower a conservative reading
    assert(pregateOk(-1.0, maxRatio = 1.3), "precondition: -1 passes the pregate")
    assert(!quietRemeasureAdmitted(-1.0, 0.9, maxRatio = 1.3))
    assert(!quietRemeasureAdmitted(0.9, -1.0, maxRatio = 1.3))
  }

  // ---- detail-artifact destination (r14 verdict #2) --------------------

  test("subset runs never clobber BENCH_DETAIL.json: full-contract runs " +
      "keep the canonical name, subset runs get a pid-suffixed file, the " +
      "env override wins over both") {
    assert(detailOutPath(None, fullContract = true, pid = 42L) ==
      "BENCH_DETAIL.json")
    // under target/ (gitignored) since r16 — pid-suffixed litter in the
    // repo root accumulated and risked auto-commit (r15 ADVICE)
    assert(detailOutPath(None, fullContract = false, pid = 42L) ==
      "target/bench_detail_subset_42.json")
    assert(detailOutPath(Some("/tmp/x.json"), fullContract = true, pid = 42L) ==
      "/tmp/x.json")
    assert(detailOutPath(Some("/tmp/x.json"), fullContract = false, pid = 42L) ==
      "/tmp/x.json")
  }

  test("calibration plans read only the dedicated target/ dataset, never " +
      "contract inputs (r14 ADVICE: scanning lineitem/orders pre-suite " +
      "warmed the page cache for the contract cold pass)") {
    // the two scan-bearing plans ignore the sf dir entirely: resolving
    // them against a sentinel dir must reference only target/bench_cal
    // paths — pin by construction: the lambdas close over calDataDir
    assert(graft.Bench.calDataDir.startsWith("target/"),
      "calibration data must live under target/, outside every sf dir")
  }

  test("failed readings (-1 wall/cpu) never flag") {
    assert(!coldContended(Timing(-1.0, -1.0, 31.0), warmWall = 1.0, Thresh))
    assert(!warmContended(Timing(-1.0, -1.0, 31.0), coldRepairedWall = 1.0,
      coldBest = Timing(1.0, 1.0, 2.0), Thresh))
    // cpu unavailable (non-Sun bean: -1) → cpu signals disabled, load
    // still works
    assert(!warmContended(Timing(10.0, -1.0, 2.0), coldRepairedWall = 1.0,
      coldBest = Timing(1.0, -1.0, 2.0), Thresh))
    assert(warmContended(Timing(10.0, -1.0, 31.0), coldRepairedWall = 1.0,
      coldBest = Timing(1.0, -1.0, 2.0), Thresh))
  }
}
