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
    val (bootstrap, cells) = HeadToHead.run(spark, root, start,
      months = 1, rateSec = 1)
    assert(bootstrap > 0)
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
}
