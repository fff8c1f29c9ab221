package graft.catalog

import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.planner.Errors

/** Archive inventory discovery (reference: `_scan_hydrophone_archive` +
  * options shaping, `app/services/get_options.py:86-177`).
  *
  * The reference lists S3 keys named
  * `{startTs}_{endTs}_{secs}s_{freq}.parquet` (naming
  * `docs/upstream-notes.md:23`), parses each filename, and accumulates
  * per-(freq_type, delta_f, delta_t) coverage. Here the listing is a
  * DataFrame of paths (from a filesystem listing or
  * `spark.read.format("binaryFile")` path-only scan) and the parse is a
  * single `regexp_extract` pass — malformed names are filtered, never fatal
  * (`docs/upstream-notes.md:19-25`).
  *
  * Scale notes: the catalog is metadata-only (one row per archive FILE, not
  * per data row), so even a 100 TB archive yields a catalog of ~1e5 rows —
  * always broadcastable, computed once per session and cached (ref
  * lru_cache, `get_options.py:54-56`).
  */
object ArchiveCatalog {

  /** Filename convention `{start}_{end}_{secs}s_{freq}.parquet` with
    * timestamps like `2020-01-01T00-00-00`; freq suffix `3oct`/`500hz`/`bb`
    * (broadband archives carry no band suffix in upstream; we accept both). */
  private val FileRe =
    "([0-9T\\-]+)_([0-9T\\-]+)_(\\d+)s(?:_(\\d+)(oct|hz))?\\.parquet$"

  /** S2/S3/P7 — parse a listing `(hydrophone, path)` into typed file rows;
    * skip non-parquet, `ancient*`, and malformed names
    * (ref `get_options.py:111-120`). */
  def parseListing(listing: DataFrame): DataFrame = {
    val fname = element_at(split(col("path"), "/"), -1)
    listing
      .filter(col("path").endsWith(".parquet") && !fname.startsWith("ancient"))
      .withColumn("file_start",
        try_to_timestamp(regexp_replace(regexp_extract(fname, FileRe, 1),
          "T(\\d+)-(\\d+)-(\\d+)", "T$1:$2:$3")))
      .withColumn("file_end",
        try_to_timestamp(regexp_replace(regexp_extract(fname, FileRe, 2),
          "T(\\d+)-(\\d+)-(\\d+)", "T$1:$2:$3")))
      .withColumn("delta_t",
        regexp_extract(fname, FileRe, 3).try_cast("int"))
      .withColumn("delta_f",
        regexp_extract(fname, FileRe, 4).try_cast("int"))
      .withColumn("freq_type",
        when(regexp_extract(fname, FileRe, 5) === "oct", "octave_bands")
          .when(regexp_extract(fname, FileRe, 5) === "hz", "delta_hz")
          .when(regexp_extract(fname, FileRe, 3) =!= "", "broadband"))
      .filter(col("file_start").isNotNull && col("file_end").isNotNull &&
              col("delta_t").isNotNull && col("freq_type").isNotNull)
  }

  /** A7/O2 — group parsed files into the coverage catalog:
    * `(hydrophone, freq_type, delta_f, delta_t, first_start, last_end,
    * file_count)` (ref accumulate `get_options.py:125-134`, reduce
    * `:147-177`). */
  def inventory(parsed: DataFrame): DataFrame =
    parsed.groupBy("hydrophone", "freq_type", "delta_f", "delta_t")
      .agg(min("file_start").as("first_start"),
           max("file_end").as("last_end"),
           count(lit(1)).as("file_count"))

  /** One catalog row, driver-side (the catalog is tiny — ref holds it in
    * process memory behind lru_cache). */
  final case class CatalogEntry(hydrophone: String, freqType: String,
      deltaF: Option[Int], deltaT: Int, firstStart: Instant, lastEnd: Instant,
      fileCount: Long)

  def collectEntries(catalog: DataFrame): Seq[CatalogEntry] =
    catalog.collect().toIndexedSeq.map { r =>
      CatalogEntry(
        r.getAs[String]("hydrophone"),
        r.getAs[String]("freq_type"),
        Option(r.getAs[Any]("delta_f")).map(_.asInstanceOf[Int]),
        r.getAs[Int]("delta_t"),
        r.getAs[java.sql.Timestamp]("first_start").toInstant,
        r.getAs[java.sql.Timestamp]("last_end").toInstant,
        r.getAs[Long]("file_count"))
    }

  /** J1 — validation lookup: the requested `(freq_type, delta_f, delta_t)`
    * combination must exist for the hydrophone (ref
    * `get_timeseries.py:114-121`; 400 if absent). */
  def requireCombination(entries: Seq[CatalogEntry], hydrophone: String,
      freqType: String, deltaF: Option[Int], deltaT: Int): CatalogEntry =
    entries.find(e => e.hydrophone == hydrophone && e.freqType == freqType &&
        e.deltaF == deltaF && e.deltaT == deltaT)
      .getOrElse(throw Errors.ValidationError(
        s"no archive for $hydrophone $freqType delta_f=$deltaF delta_t=$deltaT"))

  /** J2 — coverage check is OVERLAP, not containment
    * (ref `get_timeseries.py:138`; SURVEY §7.5.8). */
  def requireOverlap(e: CatalogEntry, start: Instant, end: Instant): Unit =
    if (end.isBefore(e.firstStart) || start.isAfter(e.lastEnd))
      throw Errors.ValidationError(
        s"window [$start, $end) outside coverage [${e.firstStart}, ${e.lastEnd}]")

  /** Build a listing DataFrame from an in-memory path list (tests / local
    * filesystems). Production path: a recursive FileSystem listing job. */
  def listingFromPaths(spark: SparkSession, rows: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("hydrophone", "path")
  }
}
