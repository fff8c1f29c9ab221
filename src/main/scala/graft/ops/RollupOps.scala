package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a partitioned rollup table — the ETL shape
  * that keeps a 100 TB archive's aggregates fresh without re-scanning
  * history: when a batch lands, only the partitions the batch TOUCHED are
  * recomputed (from archive ∪ batch, partition-pruned to those keys);
  * every other partition's rows carry over from the previous rollup
  * byte-for-byte, never re-read.
  *
  * Late data falls out for free: a batch carrying rows for an old day
  * marks that day changed, so the old partition recomputes — the
  * standard watermark-free backfill semantics ("reprocess any partition
  * that received data"), exactly how partition-overwrite ETL jobs
  * (Hive/Iceberg `INSERT OVERWRITE PARTITION`) behave.
  *
  * The maintained result is EXACTLY the full recompute (same aggregate
  * over changed partitions, identical prior rows elsewhere — assuming
  * `recompute` is deterministic per partition, which every rollup here
  * is by the integer-micro discipline), so the full-scan aggregate is
  * the oracle and RollupSpec pins maintained ≡ recomputed plus the
  * pruning itself. */
object RollupOps {

  /** Maintain `prev` (a rollup keyed by `keyCol`, one or more rows per
    * key) against newly-landed `batch` rows:
    * - changed keys = distinct `keyCol` in the batch (collected —
    *   metadata scale: bounded by partitions touched per batch, the
    *   same catalog-sized collect as [[graft.sources.SkipIndex.readFiles]];
    *   literal keys make the recompute's partition pruning STATIC, no
    *   DPP runtime dependency);
    * - recompute those keys from `data` (the archive-∪-batch view,
    *   filtered by a pushed `IN (changed…)` before `recompute` runs);
    * - keep every other `prev` row untouched (broadcast-anti-joined
    *   against the tiny changed-key set — no shuffle of the rollup).
    *
    * @param prev      current rollup rows (must contain `keyCol`)
    * @param data      full logical dataset (base archive ∪ batch); only
    *                  changed-key partitions of it are ever scanned
    * @param batch     the newly-landed rows (must contain `keyCol`)
    * @param keyCol    partition key column name (e.g. a `day` date)
    * @param recompute per-partition rollup: filtered data → rollup rows */
  def maintainByKey(prev: DataFrame, data: DataFrame, batch: DataFrame,
      keyCol: String, recompute: DataFrame => DataFrame): DataFrame = {
    val changed = batch.select(col(keyCol)).distinct().collect().map(_.get(0)).toSeq
    maintainByKeys(prev, data, changed, keyCol, recompute)
  }

  /** [[maintainByKey]] with the changed-key set ALREADY known — callers
    * that computed it for their own routing (the streamed maintenance
    * loop collects the batch's days to prune the archive read) pass it
    * through instead of paying a second distinct-collect job per
    * micro-batch. */
  def maintainByKeys(prev: DataFrame, data: DataFrame, changed: Seq[Any],
      keyCol: String, recompute: DataFrame => DataFrame): DataFrame = {
    if (changed.isEmpty) prev
    else {
      val carried = prev.filter(!keyMembership(changed, col(keyCol)))
      val fresh = recompute(data.filter(keyMembership(changed, col(keyCol))))
      carried.unionByName(fresh)
    }
  }

  /** DIMENSION-DELTA incremental view maintenance: when dimension rows
    * change (a user moves segment, an SCD attribute updates), the
    * partitions of a fact-side rollup that must recompute are exactly
    * those holding FACTS for the changed keys — found without a full
    * fact scan: the per-file Bloom index routes the delta keys to
    * candidate files (no false negatives, so no partition is missed; a
    * false positive only adds a file to the bounded routed read), a
    * scan of ONLY those files yields the exact affected day partitions
    * (the null day included, from null event times), and
    * [[maintainByKeys]] recomputes only those under the NEW dimension —
    * partitions with no delta-key facts join identically under old and
    * new dimension, so carrying them is exact. At 100 TB: a 3-key
    * dimension update costs a metadata-scale bloom probe + a read of
    * the files that key actually touches + a recompute of its true
    * partition footprint, never a full-view rebuild.
    *
    * @param prev      the maintained view (built under the OLD dimension)
    * @param idx       footer index of the fact archive ([[graft.sources.SkipIndex]])
    * @param bloomIdx  per-file bloom over the DIMENSION KEY as string
    * @param keyCol    the dimension-key column in the facts (cast to
    *                  string for the delta comparison, matching the
    *                  bloom build expression)
    * @param deltaKeys changed dimension keys (string form, as bloom-probed)
    * @param tsCol     fact event-time column (day-partitions the view)
    * @param recompute partition recompute under the NEW dimension
    *                  (typically broadcast-join + aggregate) */
  def maintainOnDimDelta(prev: DataFrame, idx: DataFrame, bloomIdx: DataFrame,
      keyCol: String, deltaKeys: Seq[String], tsCol: String,
      recompute: DataFrame => DataFrame): DataFrame = {
    import graft.sources.SkipIndex
    val spark = prev.sparkSession
    val routedFiles = SkipIndex.pruneFilesByKeys(bloomIdx, deltaKeys)
    // keys with no facts route nowhere; readFiles on an empty pick set
    // is a SCHEMALESS empty frame, so return before filtering on it
    if (routedFiles.isEmpty) return prev
    // EXACT affected days, by scanning only the bloom-routed files for
    // the delta keys (a null event time surfaces as the null day
    // directly). The first cut derived days from the routed files'
    // footer ZONES instead — zero extra reads, but a wide-zone file
    // (hash-clustered layouts interleave far-apart days in one file)
    // inflated the changed set toward EVERY day and the "incremental"
    // path measured 30× a full rebuild at 10× archive span (Profile
    // ivm_scale). Reading the routed files is still bloom-bounded; the
    // day set it yields is exact, so recompute work tracks the delta's
    // true partition footprint whatever the physical layout.
    val changed: Seq[Any] = SkipIndex.readFiles(spark, routedFiles)
      .filter(col(keyCol).cast("string").isInCollection(deltaKeys))
      .select(to_date(col(tsCol)).as("day"))
      .distinct().collect().map(_.get(0)).toIndexedSeq
    if (changed.isEmpty) prev
    else {
      // collect() yields java.sql.Date by default but java.time.LocalDate
      // under spark.sql.datetime.java8API.enabled — match both, and fail
      // LOUDLY on anything else (a silent non-match would empty `days`,
      // select no day files, and vanish the changed partitions)
      val days = changed.collect {
        case d: java.sql.Date        => d.toLocalDate
        case d: java.time.LocalDate  => d
      }
      val hasNull = changed.exists(_ == null)
      require(days.size + (if (hasNull) 1 else 0) == changed.size,
        s"unexpected day-key types in $changed")
      val picks = SkipIndex.picksForChangedDays(idx, days, hasNull)
      val data = SkipIndex.readFiles(spark, picks)
        .withColumn("day", to_date(col(tsCol)))
      maintainByKeys(prev, data, changed, "day", recompute)
    }
  }

  /** NULL-SAFE set membership for partition keys. NULL is a legitimate
    * partition key (e.g. a null-day group from null timestamps):
    * membership must be null-safe, or `NOT IN`'s three-valued logic
    * silently drops the NULL group from BOTH the carried and recomputed
    * sides on every maintenance run. Shared by [[maintainByKeys]] and
    * the streamed maintenance loop's no-previous-version branch — the
    * two must route the null group identically or they diverge. */
  def keyMembership(changed: Seq[Any],
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val nonNull = changed.filter(_ != null)
    val nullChanged = changed.exists(_ == null)
    val inSet =
      if (nonNull.isEmpty) lit(false)
      else coalesce(c.isInCollection(nonNull), lit(false))
    if (nullChanged) c.isNull || inSet else inSet
  }
}
