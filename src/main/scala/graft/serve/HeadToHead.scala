package graft.serve

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.PartitionedArchive

/** The flagship serving head-to-head (r14 verdict #4): the engine's
  * endpoint latencies measured against the reference's PUBLISHED request
  * wall-clocks (BASELINE.md — `docs/upstream-notes.md:112-118`,
  * `docs/performance-enhancements.md:22-24` in the reference) on an
  * archive of the reference's own deployment shape.
  *
  * The north-star claim (`upstream-notes.md:122-127`): the reference's
  * cost is dominated by FULL-RESOLUTION MONTHLY READS before aggregation
  * — a 7 d and a 30 d PSD heatmap return nearly the same output size
  * (649 vs 687 buckets) yet differ ~3.6× in runtime, because every
  * request re-reads whole monthly parquet files. The Spark layout
  * eliminates that cost class by construction: directory partition
  * pruning (hydrophone/freq_type/delta_f/delta_t), parquet `ts`
  * row-group pushdown inside the ts-sorted files, and a parallel scan of
  * what remains. This driver demonstrates it END-TO-END — real HTTP
  * requests against [[HttpApi]] over a [[PartitionedArchive]] written at
  * the reference's data scale (22 months @ delta_t=1 ≈ 57.7 M broadband
  * rows and ~1.27 B PSD long rows — the reference's ~2.6 M rows/month at
  * 1 s resolution, BASELINE.md) — so the comparison is reference-shaped
  * on BOTH axes: same request set, same data extent. The reference's
  * numbers were measured against live S3 from a devcontainer and are
  * network-amplified; ours are local-disk — the honest read is "the
  * read-amplification class is gone", not a hardware-for-hardware race
  * (PERF.md carries that caveat next to the table).
  *
  * [[tools.Profile]] mode `serve_h2h` runs it at full scale;
  * HeadToHeadSpec pins the identical code path (build → serve → the same
  * request set) at toy scale, so the demo cannot rot.
  */
object HeadToHead {

  val Hydrophone = "ORCASOUND_LAB"

  /** ANSI third-octave nominal centers 63–8000 Hz — the band set behind
    * the reference's `delta_f=3oct` product and the daily-summary
    * default `band_low/band_high` of 63/8000 (22 bands). */
  val ThirdOctaveBands: Seq[Double] = Seq(
    63, 80, 100, 125, 160, 200, 250, 315, 400, 500, 630, 800,
    1000, 1250, 1600, 2000, 2500, 3150, 4000, 5000, 6300, 8000)
    .map(_.toDouble)

  /** Write the reference-shaped archive: `months` months from
    * `startDate`, one sample per `rateSec` seconds, one broadband row and
    * one PSD row per band per sample, through the [[PartitionedArchive]]
    * writers (zstd, TIMESTAMP_MICROS for row-group `ts` stats, ts-sorted
    * within files). Values are ambient-LOOKING but fully deterministic —
    * a diel sine + per-sample hash jitter + a per-band spectral tilt; no
    * `rand()`, so retried/speculative tasks write identical bytes. */
  def buildArchive(spark: SparkSession, root: String, startDate: LocalDate,
      months: Int, rateSec: Int, bands: Seq[Double] = ThirdOctaveBands,
      slicesPerMonth: Int = 16): Unit = {
    val startEpoch = startDate.atStartOfDay(ZoneOffset.UTC).toEpochSecond
    val endEpoch =
      startDate.plusMonths(months.toLong).atStartOfDay(ZoneOffset.UTC).toEpochSecond
    val n = (endEpoch - startEpoch) / rateSec
    val slices = math.max(32, months * slicesPerMonth)
    val base = spark.range(0L, n, 1L, slices)
      .select(lit(Hydrophone).as("hydrophone"),
        timestamp_seconds(lit(startEpoch) + col("id") * rateSec).as("ts"),
        col("id"))
    def level(seed: Column): Column =
      lit(35.0) +
        lit(6.0) * sin(col("id") * lit(2 * math.Pi * rateSec / 86400.0)) +
        pmod(seed * lit(2654435761L), lit(1000)).cast("double") / lit(100.0)
    PartitionedArchive.writeBroadband(
      base.select(col("hydrophone"), lit(rateSec).as("delta_t"), col("ts"),
        level(col("id")).as("value")), root)
    val psd = base
      .withColumn("band", explode(array(bands.map(lit(_)): _*)))
      .select(col("hydrophone"), lit("octave_bands").as("freq_type"),
        lit(3).as("delta_f"), lit(rateSec).as("delta_t"), col("ts"),
        col("band"),
        (level(col("id") + col("band").cast("long")) -
          log10(col("band")) * lit(3.0)).as("value"))
    PartitionedArchive.writePsd(psd, root)
  }

  /** One measured request: `refSec` is the reference's published
    * wall-clock for the same request shape (-1 = not published),
    * `count` the response's bucket/point count evidence. */
  final case class Cell(label: String, path: String, refSec: Double,
      coldSec: Double, warmSec: Double, status: Int, count: Long)

  private def isoDT(d: LocalDateTime): String =
    d.format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))

  /** The BASELINE.md request set, anchored to the archive's END (the
    * dashboard pattern: the most recent 1 h/24 h/7 d/30 d). All
    * aggregations use `interval=auto`, which resolves exactly like the
    * reference's `_resolve_interval` (finest interval with ≤1000
    * buckets) — 7 d → 15 m and 30 d → 1 h buckets, the reference's 649-
    * and 687-bucket requests. */
  def requestSet(startDate: LocalDate, months: Int, rateSec: Int)
      : Seq[(String, Double, String)] = {
    val end = startDate.plusMonths(months.toLong).atStartOfDay()
    val h = s"hydrophone=${Hydrophone.toLowerCase}"
    def psd(hours: Long) =
      s"/aggregations/psd?$h&start=${isoDT(end.minusHours(hours))}" +
        s"&end=${isoDT(end)}&interval=auto&delta_f=3oct&delta_t=$rateSec"
    // the reference's daily endpoints pin delta_t=1 (no query param,
    // app/api/aggregations.py:24-60) — so these cells require a
    // rateSec=1 archive, exactly the reference's product
    def daily(days: Int) =
      s"/aggregations/daily-summary?$h" +
        s"&start_date=${end.minusDays(days.toLong).toLocalDate}" +
        s"&num_days=$days"
    Seq(
      ("psd_1h", 6.4, psd(1)),
      ("psd_6h", 7.2, psd(6)),
      ("psd_24h", 30.5, psd(24)),
      ("psd_7d", 63.3, psd(24 * 7)),
      ("psd_30d", 226.1, psd(24 * 30)),
      ("daily_summary_1d", 25.0, daily(1)),
      ("daily_summary_7d", 25.0, daily(7)),
      ("daily_summary_30d", 25.0, daily(30)),
      ("daily_broadband_30d", 11.67,
        s"/aggregations/daily-broadband-summary?$h" +
          s"&start_date=${end.minusDays(30).toLocalDate}&num_days=30"),
      // "10-25 s for valid requests" (upstream-notes.md:71) — a 30 min
      // raw window stays under the 2000-point cap at delta_t=1
      ("raw_timeseries_30m", 10.0,
        s"/timeseries/broadband?$h&start=${isoDT(end.minusMinutes(30))}" +
          s"&end=${isoDT(end)}&delta_t=$rateSec"),
    )
  }

  /** Serve the archive and fire the request set over real HTTP — each
    * request once cold (computes + memoizes) and once warm (LRU-served,
    * the reference's `lru_cache` comparison rows). Returns
    * (catalog-bootstrap seconds, cells). */
  def run(spark: SparkSession, root: String, startDate: LocalDate,
      months: Int, rateSec: Int): (Double, Seq[Cell]) = {
    val t0 = System.nanoTime()
    val service = AmbientService.fromFrames(
      PartitionedArchive.readBroadband(spark, root),
      PartitionedArchive.readPsd(spark, root))
    val bootstrap = (System.nanoTime() - t0) / 1e9
    val api = new HttpApi(service,
      java.nio.file.Files.createTempDirectory("graft-h2h"))
    val server = api.start(0)
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      def hit(path: String): (Double, Int, Long) = {
        val u0 = System.nanoTime()
        val c = new java.net.URI(base + path).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        c.setReadTimeout(30 * 60 * 1000)
        val code = c.getResponseCode
        val body = new String(
          (if (code == 200) c.getInputStream
           else Option(c.getErrorStream).getOrElse(c.getInputStream))
            .readAllBytes(), "UTF-8")
        val sec = (System.nanoTime() - u0) / 1e9
        // response evidence: the bucket/point count header when the
        // endpoint sets one, else the first *_length/point_count field
        val count = Option(c.getHeaderField("X-Time-Count"))
          .orElse(Option(c.getHeaderField("X-Point-Count")))
          .map(_.toLong)
          .orElse("\"(?:mean_length|point_count)\":(\\d+)".r
            .findFirstMatchIn(body).map(_.group(1).toLong))
          .getOrElse(-1L)
        (sec, code, count)
      }
      val cells = requestSet(startDate, months, rateSec).map {
        case (label, ref, path) =>
          val (cold, code, count) = hit(path)
          val (warm, _, _) = hit(path)
          Cell(label, path, ref, cold, warm, code, count)
      }
      (bootstrap, cells)
    } finally { server.stop(0); api.close() }
  }
}
