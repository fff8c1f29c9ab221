package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serve.HeadToHead

/** Pins the serving head-to-head demo path (r14 verdict #4) at toy scale:
  * the SAME code that Profile mode `serve_h2h` runs at 22 months @ 1 s —
  * build a reference-shaped [[graft.sources.PartitionedArchive]], stand
  * up the real [[graft.serve.HttpApi]], and fire the BASELINE.md request
  * set (PSD heatmap 1 h/6 h/24 h/7 d/30 d, daily summaries, raw
  * timeseries) over actual HTTP — so the full-scale demo cannot rot.
  * Toy parameters: 1 month at the reference's 1 s resolution, 2 bands
  * (~2.7 M broadband rows, ~5.4 M PSD rows). */
class HeadToHeadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reference request set over a partitioned archive: every endpoint " +
      "200, bucket counts match the auto-interval contract, warm pass " +
      "LRU-served") {
    val root = new java.io.File("target/h2h_spec").getAbsolutePath
    graft.util.LocalFs.deleteRecursively(new java.io.File(root))
    val start = java.time.LocalDate.of(2020, 1, 1)
    // rateSec=1: the reference's daily endpoints pin delta_t=1 (no query
    // param), so the archive must be the 1 s product; 2 bands keep the
    // month at ~2.7 M broadband + 5.4 M PSD rows
    HeadToHead.buildArchive(spark, root, start, months = 1, rateSec = 1,
      bands = Seq(63.0, 8000.0), slicesPerMonth = 8)
    // the layout is the real one: directory partitions + parquet files
    assert(new java.io.File(s"$root/psd/hydrophone=ORCASOUND_LAB/" +
      "freq_type=octave_bands/delta_f=3/delta_t=1").isDirectory)
    val (bootstrap, rollupMaint, cells) = HeadToHead.run(spark, root, start,
      months = 1, rateSec = 1)
    assert(bootstrap > 0 && rollupMaint > 0)
    val byLabel = cells.map(c => c.label -> c).toMap
    assert(cells.size == 10 && cells.forall(_.status == 200),
      cells.filter(_.status != 200).toString)
    // auto-interval bucket counts (the reference's _resolve_interval
    // semantics): 30 d → 1 h buckets = 720, 7 d → 15 m = 672, 24 h →
    // 5 m = 288, 6 h/1 h → finest ≤1000 target
    assert(byLabel("psd_30d").count == 720, byLabel("psd_30d").toString)
    assert(byLabel("psd_7d").count == 672)
    assert(byLabel("psd_24h").count == 288)
    // daily summary serves its finite-valued series lengths (288 5-min
    // buckets of the typical day at full coverage)
    assert(byLabel("daily_summary_7d").count == 288)
    // the raw window: 30 min at 1 s resolution = 1800 points (under the
    // 2000-point cap, like the reference's valid raw requests)
    assert(byLabel("raw_timeseries_30m").count == 1800)
    // warm repeats are LRU-served: no Spark job, so they must be fast in
    // absolute terms even on a loaded CI box
    cells.foreach(c => assert(c.warmSec < 2.0,
      s"${c.label} warm ${c.warmSec}s — memoization not serving?"))
  }

  test("concurrent serving (FAIR pools per request class): interleaved " +
      "mixed clients get exactly the sequential answers, no errors") {
    val root = new java.io.File("target/h2h_spec").getAbsolutePath
    val start = java.time.LocalDate.of(2020, 1, 1)
    if (!new java.io.File(s"$root/psd/_SUCCESS").exists())
      HeadToHead.buildArchive(spark, root, start, months = 1, rateSec = 1,
        bands = Seq(63.0, 8000.0), slicesPerMonth = 8)
    // correctness under interleaving: drive 4 concurrent mixed clients
    // through runConcurrent (real HTTP, pools set per class), then
    // verify a heatmap and a daily request give byte-identical bodies
    // whether computed under concurrency (LRU now holds them) or by a
    // FRESH sequential service over the same archive
    val levels = HeadToHead.runConcurrent(spark, root, start, months = 1,
      rateSec = 1, clientCounts = Seq(4), perClassOverride = 2)
    assert(levels.size == 1)
    val (n, cold, warm) = levels.head
    assert(n == 4)
    assert(cold.map(_.cls).sorted == Seq("daily", "heatmap", "raw"))
    assert(cold.forall(_.errors == 0), cold.toString)
    assert(warm.forall(_.errors == 0), warm.toString)
    // every class completed all its requests at this level
    assert(cold.forall(_.count == 8), cold.toString) // 4 clients × 2 rounds
    // warm (LRU) pass must be fast in absolute terms — no recompute
    assert(warm.forall(_.p99 < 2.0), warm.toString)

    // exactness under interleaving: two threads hammer one shared
    // service with DIFFERENT request classes simultaneously; results
    // must equal a fresh service's sequential answers (the shared
    // SparkSession + FAIR pools must not leak state across requests)
    val svc = graft.serve.AmbientService.fromArchive(spark, root)
    val end = start.plusMonths(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(2)
    try {
      val fHeat = pool.submit(() => (0 until 3).map(i =>
        svc.getPsdAggregation("orcasound_lab", end.minusSeconds((i + 1) * 3600L),
          end.minusSeconds(i * 3600L), "auto", "3oct", 1)))
      val fDaily = pool.submit(() => (0 until 3).map(i =>
        svc.getDailySummary("orcasound_lab",
          start.plusDays(i.toLong), 2, 63.0, 8000.0, "auto")))
      val heats = fHeat.get(); val dailies = fDaily.get()
      val seq = graft.serve.AmbientService.fromArchive(spark, root)
      (0 until 3).foreach { i =>
        assert(heats(i) == seq.getPsdAggregation("orcasound_lab",
          end.minusSeconds((i + 1) * 3600L), end.minusSeconds(i * 3600L),
          "auto", "3oct", 1), s"heatmap $i diverged under concurrency")
        assert(dailies(i) == seq.getDailySummary("orcasound_lab",
          start.plusDays(i.toLong), 2, 63.0, 8000.0, "auto"),
          s"daily $i diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
