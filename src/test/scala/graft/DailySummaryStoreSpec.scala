package graft

import java.sql.Timestamp
import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.serve.{AmbientService, DailySummaryStore}
import graft.serve.Responses.DailySummaryResponse
import graft.sources.PartitionedArchive

/** Pins the r16 maintained daily-summary rollup: a service reading from
  * the store must answer EXACTLY what the raw-scan path answers (full
  * band set and narrowed ranges), the store must go stale the moment new
  * data lands in its window (fallback, still correct), and maintenance
  * must bring it back in line — maintained ≡ recompute after a new day
  * lands (r15 verdict #2's done-criterion). */
class DailySummaryStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = "ORCASOUND_LAB"
  private val DT = 60 // minute-rate product keeps the fixture tiny

  /** One day of 2-band PSD at delta_t=60: 1440 samples × 2 bands. */
  private def dayPsd(day: LocalDate): DataFrame = {
    val d0 = day.atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond
    val rows = for (s <- 0 until 1440; b <- Seq(63.0, 8000.0)) yield
      (H, "octave_bands", 3, DT,
        new Timestamp((d0 + s * 60L) * 1000L), b,
        90.0 + (s % 7) + (if (b > 100) -3.0 else 2.0) + day.getDayOfMonth)
    rows.toDF("hydrophone", "freq_type", "delta_f", "delta_t", "ts", "band", "value")
  }

  private def freshArchive(days: Seq[LocalDate]): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_dss").toString
    PartitionedArchive.writePsd(days.map(dayPsd).reduce(_ unionByName _), root)
    // the daily endpoints validate against the catalog, which needs a
    // broadband entry too for fromFrames symmetry — one token row
    PartitionedArchive.writeBroadband(
      Seq((H, DT, new Timestamp(days.head.atStartOfDay(java.time.ZoneOffset.UTC)
        .toEpochSecond * 1000L), 100.0))
        .toDF("hydrophone", "delta_t", "ts", "value"), root)
    root
  }

  private def rawService(root: String): AmbientService =
    AmbientService.fromFrames(
      PartitionedArchive.readBroadband(spark, root),
      PartitionedArchive.readPsd(spark, root))

  private def daily(s: AmbientService, start: LocalDate, n: Int,
      lo: Double = 63.0, hi: Double = 8000.0): DailySummaryResponse =
    s.getDailySummary(H, start, n, lo, hi, "1h", "3oct", DT)

  private def assertSame(a: DailySummaryResponse, b: DailySummaryResponse): Unit = {
    assert(a.series.labels == b.series.labels)
    assert(a.series.count == b.series.count)
    def close(x: Seq[Double], y: Seq[Double]) =
      x.size == y.size && x.zip(y).forall { case (u, v) => math.abs(u - v) < 1e-9 }
    // means re-aggregate over different physical partitionings between
    // the two sources, so the float merge order may differ by ulps
    assert(close(a.series.mean, b.series.mean), s"${a.series.mean}\n${b.series.mean}")
    assert(close(a.series.min, b.series.min))
    assert(close(a.series.max, b.series.max))
  }

  test("maintained window serves exactly what the raw scan computes " +
      "(full band set and narrowed range)") {
    val d1 = LocalDate.of(2024, 5, 1)
    val root = freshArchive(Seq(d1, d1.plusDays(1)))
    val store = new DailySummaryStore(spark, root)
    store.maintain(H, "octave_bands", 3, DT, d1, 2)
    val start = d1.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val end = d1.plusDays(2).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    assert(store.statsFor(H, "octave_bands", 3, DT, start, end).isDefined,
      "maintained window must be served from the store")
    val withStore = AmbientService.fromArchive(spark, root)
    assertSame(daily(withStore, d1, 2), daily(rawService(root), d1, 2))
    assertSame(daily(withStore, d1, 2, lo = 100.0, hi = 8000.0),
      daily(rawService(root), d1, 2, lo = 100.0, hi = 8000.0))
  }

  test("new data landing in the window makes the store stale (fallback, " +
      "still exact); re-maintenance restores it") {
    val d1 = LocalDate.of(2024, 6, 1)
    val root = freshArchive(Seq(d1))
    val store = new DailySummaryStore(spark, root)
    val windows = store.maintainTrailing(H, "octave_bands", 3, DT, Seq(2))
    assert(windows == Seq(2 -> d1.minusDays(1)),
      s"trailing window must anchor at the newest data: $windows")
    val start = d1.minusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    val end = d1.plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    assert(store.statsFor(H, "octave_bands", 3, DT, start, end).isDefined)
    // a new day lands inside nothing — but a batch APPEND into the
    // maintained window must flip the fingerprint
    PartitionedArchive.appendPsdBatch(dayPsd(d1.minusDays(1)), root, 0L, "t")
    assert(store.statsFor(H, "octave_bands", 3, DT, start, end).isEmpty,
      "stale stats must never be served")
    // fallback path: service still answers, and answers the recompute
    val s = AmbientService.fromArchive(spark, root)
    assertSame(daily(s, d1.minusDays(1), 2), daily(rawService(root), d1.minusDays(1), 2))
    // maintenance brings the store back; served result unchanged
    store.maintain(H, "octave_bands", 3, DT, d1.minusDays(1), 2)
    assert(store.statsFor(H, "octave_bands", 3, DT, start, end).isDefined)
    assertSame(daily(AmbientService.fromArchive(spark, root), d1.minusDays(1), 2),
      daily(rawService(root), d1.minusDays(1), 2))
  }

  test("non-maintained or non-day-aligned windows return None") {
    val d1 = LocalDate.of(2024, 7, 1)
    val root = freshArchive(Seq(d1))
    val store = new DailySummaryStore(spark, root)
    store.maintain(H, "octave_bands", 3, DT, d1, 1)
    val start = d1.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
    assert(store.statsFor(H, "octave_bands", 3, DT,
      start, start.plusSeconds(86400)).isDefined)
    assert(store.statsFor(H, "octave_bands", 3, DT,
      start, start.plusSeconds(3600)).isEmpty, "sub-day window")
    assert(store.statsFor(H, "octave_bands", 3, DT,
      start.plusSeconds(86400), start.plusSeconds(2 * 86400)).isEmpty,
      "different window")
  }
}
