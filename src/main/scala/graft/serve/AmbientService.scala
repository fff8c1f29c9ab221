package graft.serve

import java.time.{Instant, LocalDate, ZoneOffset}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.ArchiveCatalog
import graft.catalog.ArchiveCatalog.CatalogEntry
import graft.ops._
import graft.planner.{Errors, RequestPlanner}
import Responses._

/** The reference's seven endpoints as a typed service facade over the
  * engine ops (query lifecycle per SURVEY §3).
  *
  * The service holds two canonical datasets:
  *  - broadband: `(hydrophone, delta_t, ts, value)`
  *  - psd long:  `(hydrophone, freq_type, delta_f, delta_t, ts, band, value)`
  * At archive scale these leading columns are physical partition columns, so
  * every per-request filter below is partition pruning + parquet pushdown —
  * the Spark replacement for the reference's filename-based file selection
  * (`upstream-notes.md:182-186`, SURVEY §4.2.2).
  *
  * Caching mirrors §2.9: the catalog is computed once (C1), and each
  * endpoint memoizes responses by request key (C2/C3, reference lru_cache).
  */
class AmbientService(
    val broadband: DataFrame,
    val psd: DataFrame,
    catalogEntries: Seq[CatalogEntry],
    /** S5 — metadata-only matching-file probe for the integrity check (ref
      * `_matching_file_count`, get_timeseries.py:71-81): returns how many
      * archive FILES cover the requested (hydrophone, delta_t) window. The
      * reference 502s only when files matched but no rows were read; with
      * no probe (data-derived catalogs) empty windows are plain success. */
    integrityFileCount: (String, Int, Instant, Instant) => Long =
      (_, _, _, _) => 0L) {

  import AmbientService._

  // ---- request caches (C1-C3; ref lru_cache(16/64/128)) -----------------
  private val tsCache = new LruCache[Any, Any](128)
  private val aggCache = new LruCache[Any, Any](64)

  private def isoT(i: Instant): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .withZone(ZoneOffset.UTC).format(i)

  // ---- /options (SURVEY §3.3) -------------------------------------------
  def getOptions(hydrophone: Option[String]): OptionsResponse = {
    val wanted = hydrophone match {
      case Some(h) => Seq(RequestPlanner.normalizeName(h))
      // P6: default scan skips sandbox (ref get_options.py:59-64)
      case None => catalogEntries.map(_.hydrophone).distinct
        .filterNot(_.equalsIgnoreCase("SANDBOX")).sorted // O3
    }
    OptionsResponse(wanted.map { h =>
      val opts = catalogEntries.filter(_.hydrophone == h)
        .sortBy(e => (e.freqType, e.deltaF.getOrElse(-1), e.deltaT)) // O2
        .map(e => CoverageOption(e.freqType, e.deltaF, e.deltaT,
          Some(isoT(e.firstStart)), Some(isoT(e.lastEnd)), e.fileCount))
      HydrophoneOptions(h, opts)
    })
  }

  // ---- validation (J1 + J2; ref get_timeseries.py:101-184) --------------
  private def validate(h: String, freqType: String, deltaF: Option[Int],
      deltaT: Int, start: Instant, end: Instant): CatalogEntry = {
    val e = ArchiveCatalog.requireCombination(catalogEntries, h, freqType, deltaF, deltaT)
    ArchiveCatalog.requireOverlap(e, start, end)
    e
  }

  private def loadBroadband(h: String, deltaT: Int, start: Instant, end: Instant): DataFrame =
    TimeseriesOps.windowFilter(
      broadband.filter(col("hydrophone") === h && col("delta_t") === deltaT),
      "ts", start, end)

  private def loadPsd(h: String, freqType: String, deltaF: Int, deltaT: Int,
      start: Instant, end: Instant): DataFrame =
    TimeseriesOps.windowFilter(
      psd.filter(col("hydrophone") === h && col("freq_type") === freqType &&
        col("delta_f") === deltaF && col("delta_t") === deltaT),
      "ts", start, end)

  // ---- /timeseries/broadband (SURVEY §3.1) ------------------------------
  def getBroadbandTimeseries(hydrophone: String, start: Instant, end: Instant,
      deltaT: Int, doValidate: Boolean = true): BroadbandTimeseriesResponse =
    tsCache.memo(("bb", hydrophone, start, end, deltaT, doValidate)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      RequestPlanner.enforceRawWindow(start, end)
      if (doValidate) validate(h, "broadband", None, deltaT, start, end)
      val df = TimeseriesOps.finiteOnly(loadBroadband(h, deltaT, start, end), "value")
        .select(TimeseriesOps.isoTs(col("ts")).as("t"), col("value"))
        .orderBy("t")
      val pts = df.collect().map(r => TimeseriesPoint(r.getString(0), r.getDouble(1)))
      val expected = TimeseriesOps.expectedPointCount(start, end, deltaT.toLong)
      // integrity check (ref get_timeseries.py:223-229): archive FILES match
      // the window but the scan produced nothing → 502; an empty window with
      // no matching files is SUCCESS with point_count=0 (SURVEY §7.5.7)
      if (doValidate && pts.isEmpty &&
          integrityFileCount(h, deltaT, start, end) > 0)
        throw Errors.DataIntegrityError(
          s"files matched [$start,$end) for $h but no rows were read")
      BroadbandTimeseriesResponse(h, isoT(start), isoT(end), deltaT,
        pts.length.toLong, expected, pts.toIndexedSeq)
    }.asInstanceOf[BroadbandTimeseriesResponse]

  // ---- /timeseries/psd ---------------------------------------------------
  def getPsdTimeseries(hydrophone: String, start: Instant, end: Instant,
      deltaT: Int, deltaFSel: String, doValidate: Boolean = true): PsdMatrixResponse =
    tsCache.memo(("psd", hydrophone, start, end, deltaT, deltaFSel, doValidate)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      val (freqType, deltaF) = RequestPlanner.parseDeltaF(deltaFSel)
      RequestPlanner.enforceRawWindow(start, end)
      if (doValidate) validate(h, freqType, Some(deltaF), deltaT, start, end)
      val df = loadPsd(h, freqType, deltaF, deltaT, start, end)
      matrix(df, PsdMatrixResponse(h, isoT(start), isoT(end), deltaT, deltaFSel, _, _, _))
    }.asInstanceOf[PsdMatrixResponse]

  /** Long → serving matrix (times × sorted frequencies), NaN-safe (P4). */
  private def matrix[R](long: DataFrame, mk: (Seq[String], Seq[Double], Seq[Seq[Double]]) => R): R = {
    val rows = TimeseriesOps.finiteOnly(long, "value")
      .select(TimeseriesOps.isoTs(col("ts")).as("t"),
        col("band").cast("double").as("band"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val times = rows.map(_._1).distinct.sorted.toIndexedSeq
    val freqs = rows.map(_._2).distinct.sorted.toIndexedSeq
    val byCell = rows.map(r => ((r._1, r._2), r._3)).toMap
    val values = times.map(t => freqs.map(f => byCell.getOrElse((t, f), Double.NaN)))
    mk(times, freqs, values)
  }

  // ---- /aggregations/broadband (A1 + F8/F9 + O4) ------------------------
  def getBroadbandAggregation(hydrophone: String, start: Instant, end: Instant,
      interval: String, deltaT: Int = 1,
      doValidate: Boolean = true): BroadbandAggregationResponse =
    aggCache.memo(("bbagg", hydrophone, start, end, interval, deltaT, doValidate)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      if (doValidate) validate(h, "broadband", None, deltaT, start, end)
      val iv = RequestPlanner.resolveInterval(interval, start, end)
      RequestPlanner.enforcePointCap(RequestPlanner.estimatedPoints(start, end, iv))
      val agg = ResampleOps.resampleMean(
          loadBroadband(h, deltaT, start, end), "ts", "value", iv)
        .orderBy("bucket_start")
      val pts = agg.collect().map(r => AggregationPoint(
        isoT(r.getTimestamp(0).toInstant), r.getDouble(1), r.getLong(2)))
      BroadbandAggregationResponse(h, iv, pts.length.toLong, pts.toIndexedSeq)
    }.asInstanceOf[BroadbandAggregationResponse]

  // ---- /aggregations/psd (A2; one scan replaces the day-chunk loop) -----
  def getPsdAggregation(hydrophone: String, start: Instant, end: Instant,
      interval: String, deltaFSel: String, deltaT: Int = 1,
      doValidate: Boolean = true): PsdHeatmapResponse =
    aggCache.memo(("psdagg", hydrophone, start, end, interval, deltaFSel, deltaT,
        doValidate)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      val (freqType, deltaF) = RequestPlanner.parseDeltaF(deltaFSel)
      if (doValidate) validate(h, freqType, Some(deltaF), deltaT, start, end)
      val iv = RequestPlanner.resolveInterval(interval, start, end)
      RequestPlanner.enforcePointCap(RequestPlanner.estimatedPoints(start, end, iv))
      val agg = ResampleOps.resampleBandsMean(
        loadPsd(h, freqType, deltaF, deltaT, start, end), "ts", "band", "value", iv)
        .select(col("bucket_start").as("ts"), col("band"), col("mean_value").as("value"))
      matrix(agg, PsdHeatmapResponse(h, iv, _, _, _))
    }.asInstanceOf[PsdHeatmapResponse]

  // ---- /aggregations/daily-summary (A3/A4/A5 + P2) ----------------------
  def getDailySummary(hydrophone: String, startDate: LocalDate, numDays: Int,
      bandLow: Double, bandHigh: Double, interval: String,
      deltaFSel: String = "3oct", deltaT: Int = 1): DailySummaryResponse =
    aggCache.memo(("daily", hydrophone, startDate, numDays, bandLow, bandHigh,
        interval, deltaFSel, deltaT)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      val (freqType, deltaF) = RequestPlanner.parseDeltaF(deltaFSel)
      val start = startDate.atStartOfDay(ZoneOffset.UTC).toInstant
      val end = startDate.plusDays(numDays.toLong).atStartOfDay(ZoneOffset.UTC).toInstant
      validate(h, freqType, Some(deltaF), deltaT, start, end)
      val iv = RequestPlanner.resolveInterval(interval,
        Instant.EPOCH, Instant.EPOCH.plusSeconds(86400)) // bucket the 24h typical day
      val bucketSecs = ResampleOps.IntervalSeconds(iv)
      RequestPlanner.enforcePointCap(86400L / bucketSecs)
      // A4: (tod, band) stats in one pass; P2: band range; A3: mean across
      // bands per tod; A5: re-anchored bucketing of the typical day itself.
      val stats = DailySummaryOps.timeOfDaySummary(
        BandOps.bandRange(loadPsd(h, freqType, deltaF, deltaT, start, end),
          "band", bandLow, bandHigh), "ts", "band", "value")
      // second-of-day from the label by arithmetic (a to_timestamp/
      // date_format round-trip would shift on non-UTC sessions)
      val parts = split(col("tod"), ":")
      val sod = parts.getItem(0).cast("long") * 3600L +
        parts.getItem(1).cast("long") * 60L + parts.getItem(2).cast("long")
      val bucketed = stats
        .withColumn("tod_bucket", DailySummaryOps.todLabel(
          (floor(sod / bucketSecs) * bucketSecs).cast("long")))
        .groupBy("tod_bucket")
        .agg(avg("mean_value").as("mean"), avg("min_value").as("min"),
             avg("max_value").as("max"),
             // §7.5.5: the served `count` is the MEAN of per-band counts
             avg(col("point_count").cast("double")).as("count"))
        .orderBy("tod_bucket")
      val rows = bucketed.collect()
      DailySummaryResponse(h, iv, bandLow, bandHigh, DailySummarySeries(
        rows.map(_.getString(0)).toIndexedSeq,
        rows.map(_.getDouble(1)).toIndexedSeq,
        rows.map(_.getDouble(2)).toIndexedSeq,
        rows.map(_.getDouble(3)).toIndexedSeq,
        rows.map(_.getDouble(4)).toIndexedSeq))
    }.asInstanceOf[DailySummaryResponse]

  // ---- /aggregations/daily-broadband-summary (A6) -----------------------
  def getDailyBroadband(hydrophone: String, startDate: LocalDate, numDays: Int,
      deltaT: Int = 1): DailyBroadbandResponse =
    aggCache.memo(("dailybb", hydrophone, startDate, numDays, deltaT)) {
      val h = RequestPlanner.normalizeName(hydrophone)
      val start = startDate.atStartOfDay(ZoneOffset.UTC).toInstant
      val end = startDate.plusDays(numDays.toLong).atStartOfDay(ZoneOffset.UTC).toInstant
      validate(h, "broadband", None, deltaT, start, end)
      val rows = DailySummaryOps.dailyMean(
          loadBroadband(h, deltaT, start, end), "ts", "value")
        .orderBy("day").collect()
      DailyBroadbandResponse(h,
        rows.map(_.getDate(0).toString).toIndexedSeq,
        rows.map(_.getDouble(1)).toIndexedSeq)
    }.asInstanceOf[DailyBroadbandResponse]
}

object AmbientService {

  /** Bounded LRU memo (reference `lru_cache`; C1-C3). */
  final class LruCache[K, V](capacity: Int) {
    private val m = new java.util.LinkedHashMap[K, V](capacity * 2, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > capacity
    }
    /** The loader runs OUTSIDE the lock (a Spark job can take minutes —
      * holding the monitor would serialize every request behind it); two
      * concurrent misses on the same key may both compute, last write wins
      * — the same soft guarantee python's lru_cache gives under threads. */
    def memo(k: K)(f: => V): V = {
      val hit = m.synchronized {
        if (m.containsKey(k)) Some(m.get(k)) else None
      }
      hit.getOrElse {
        val v = f
        m.synchronized { m.put(k, v) }
        v
      }
    }
  }

  /** Build a service over canonical frames, deriving the catalog from the
    * data itself (min/max ts per product — the Spark replacement for the
    * reference's filename-derived coverage, which upstream data violates;
    * `docs/upstream-notes.md:27-41`). One small aggregate, computed once. */
  def fromFrames(broadband: DataFrame, psd: DataFrame): AmbientService = {
    val bbCat = broadband.groupBy("hydrophone", "delta_t")
      .agg(min("ts").as("first_start"), max("ts").as("last_end"),
        count(lit(1)).as("file_count"))
      .withColumn("freq_type", lit("broadband"))
      .withColumn("delta_f", lit(null).cast("int"))
    val psdCat = psd.groupBy("hydrophone", "freq_type", "delta_f", "delta_t")
      .agg(min("ts").as("first_start"), max("ts").as("last_end"),
        count(lit(1)).as("file_count"))
    val cat = bbCat.select("hydrophone", "freq_type", "delta_f", "delta_t",
        "first_start", "last_end", "file_count")
      .unionByName(psdCat.select("hydrophone", "freq_type", "delta_f", "delta_t",
        "first_start", "last_end", "file_count"))
    new AmbientService(broadband, psd, ArchiveCatalog.collectEntries(cat))
  }
}
