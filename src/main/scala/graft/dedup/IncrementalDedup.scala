package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTAL near-dup screening against a PERSISTED LSH band index —
  * the continuous-ingest twin of the batch MinHash pipeline
  * ([[DedupOps.lshCandidates]]) and the disk-resident twin of the
  * streaming state-store path ([[graft.streaming.StreamingOps]] near-dup
  * ingest): at 100 TB the historical corpus cannot be re-signatured (or
  * even re-shuffled) every time a new crawl batch arrives, and a state
  * store cannot hold the whole history. The FineWeb/Dolma-style answer
  * is an index you build once and join against forever:
  *
  *  - The index row is `(bkey, doc_id, sig)`: the band-bucket key
  *    (composite `xxhash64(band, bucket)` over [[DedupOps.bandBuckets]]'
  *    projection — identical banding to every other MinHash path) plus
  *    the full signature, so verification needs NO access to historical
  *    text or shingles.
  *  - Storage is a Spark BUCKETED table on `bkey`: the scan's hash
  *    bucketing already satisfies the screening join's clustering, so
  *    screening shuffles ONLY the incoming batch — zero Exchange above
  *    the index scan (IncDedupSpec pins the plan). Appending a screened
  *    batch (`insertInto`) preserves the bucket spec, so the index stays
  *    join-ready without a rewrite — the dedup analogue of the persisted
  *    IVF index's partition-pruned postings.
  *  - Verification is the MinHash AGREEMENT fraction (matching signature
  *    positions / k), whose expectation IS the Jaccard similarity — the
  *    estimator screening pipelines act on when exact re-shingling of
  *    history is off the table. Exact verify remains available for the
  *    incoming side via [[DedupOps.verifyJaccardPairs]].
  */
object IncrementalDedup {

  /** Build (overwrite) the historical band index from a signature frame
    * `(doc_id, sig)`. `numBuckets` sizes the bucketed layout — at scale,
    * pick it like shuffle partitions (the incoming side will hash into
    * the same `numBuckets` streams).
    *
    * The table is EXTERNAL at an explicit location: a managed table
    * whose warehouse directory survives a JVM restart (fresh in-memory
    * catalog, stale directory) fails creation with
    * LOCATION_ALREADY_EXISTS — external locations are allowed to
    * pre-exist, and `overwrite` replaces the data either way. */
  def buildBandIndex(spark: SparkSession, sigs: DataFrame, k: Int,
                     bands: Int, table: String, numBuckets: Int = 8): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // repartition to the bucket hash FIRST so each bucket lands as ONE
    // file: Spark only elides the merge-join SORT on the index side when
    // every bucket is a single (sorted) file — with the default task
    // layout each bucket splinters across tasks and every later screen
    // re-sorts the whole history (measured 6× superlinear at 10× history
    // in Profile inc_scale). Appends via insertInto add files and bring
    // the sort back for the appended span — periodic rebuild restores
    // the one-file invariant, same as archive compaction.
    bandKeyed(sigs, k, bands)
      .repartition(numBuckets, col("bkey"))
      .write.bucketBy(numBuckets, "bkey").sortBy("bkey")
      .option("path",
        s"${System.getProperty("java.io.tmpdir")}/graft_inc_index/$table")
      .format("parquet").mode("overwrite").saveAsTable(table)
  }

  /** Append a (screened) batch's signatures to the index; `insertInto`
    * honors the table's bucket spec, so the index stays join-ready —
    * BUT each append adds a file per touched bucket, and once a bucket
    * holds multiple files Spark can no longer elide the screening
    * join's sort on the index side (measured 6× superlinear at 10×
    * history without the one-file invariant). So the append path now
    * POLICES the invariant itself: when the fullest bucket exceeds
    * `rebuildThreshold` files, the index is compacted back to one
    * sorted file per bucket in place — a long-running ingest never
    * silently decays into the re-sort regime. Pass
    * `rebuildThreshold = Int.MaxValue` to manage compaction manually. */
  def appendBatch(spark: SparkSession, sigs: DataFrame, k: Int,
                  bands: Int, table: String,
                  rebuildThreshold: Int = 4): Unit = {
    bandKeyed(sigs, k, bands).write.insertInto(table)
    if (maxFilesPerBucket(spark, table) > rebuildThreshold)
      rebuildIndex(spark, table)
  }

  private def tableMeta(spark: SparkSession, table: String) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))

  /** Largest file count over the index's buckets — the decay metric the
    * append path polices (1 = the fast path: per-bucket sort elided at
    * every screen). Metadata-scale: one directory listing, the same
    * budget as Spark's own FileIndex. Bucket ids come from the writer's
    * `part-…_NNNNN.c000…` naming; a file without the marker counts as
    * its own bucket (conservative — forces a rebuild sooner). */
  def maxFilesPerBucket(spark: SparkSession, table: String): Int = {
    val loc = new org.apache.hadoop.fs.Path(tableMeta(spark, table).location)
    val fs = loc.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bucketId = "_(\\d{5})\\.".r
    val files = fs.listStatus(loc).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith("."))
    if (files.isEmpty) 0
    else files.groupBy(n =>
        bucketId.findFirstMatchIn(n).map(_.group(1)).getOrElse(n))
      .values.map(_.size).max
  }

  /** Compact the index back to ONE sorted file per bucket in place
    * (same table name, same external location): stage the rows out as
    * plain parquet, drop + re-create the bucketed table from the stage,
    * delete the stage. Rows are already `(bkey, doc_id, sig)`, so no
    * re-signaturing and no re-banding — the rebuild moves data exactly
    * once, the archive-compaction budget. */
  def rebuildIndex(spark: SparkSession, table: String): Unit = {
    val meta = tableMeta(spark, table)
    val numBuckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
      throw new IllegalStateException(s"$table has no bucket spec"))
    val loc = meta.location.toString
    val stage = loc.stripSuffix("/") + "__stage"
    spark.table(table).write.mode("overwrite").parquet(stage)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.read.parquet(stage)
      .repartition(numBuckets, col("bkey"))
      .write.bucketBy(numBuckets, "bkey").sortBy("bkey")
      .option("path", loc).format("parquet").mode("overwrite")
      .saveAsTable(table)
    val sp = new org.apache.hadoop.fs.Path(stage)
    sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(sp, true)
    // the rewrite replaced every file under `loc` — purge stale
    // FileStatusCache entries (the fs-mutation gotcha)
    spark.catalog.refreshByPath(loc)
  }

  /** `(bkey, doc_id, sig)` rows — bands × docs, map-only (the signature
    * rides the explode inline; joining it back on would cost two
    * doc_id exchanges before the screen even starts). The bucket hash is
    * [[DedupOps.bandBuckets]]' exact derivation, composed into one key:
    * `bkey = xxhash64(band, xxhash64(band, slice-string))`. */
  private def bandKeyed(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val rows = k / bands
    sigs.select(col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)), b =>
          xxhash64(b, xxhash64(b, concat_ws(",",
            slice(col("sig"), b * lit(rows) + lit(1), lit(rows))
              .cast("array<string>")))))).as("bkey"))
      .select(col("bkey"), col("doc_id"), col("sig"))
  }

  /** Screen an incoming signature frame `(doc_id, sig)` against the
    * index: band-bucket candidates, deduped across bands, verified by
    * signature agreement ≥ `minAgree`. Output one row per surviving
    * `(inc_id, hist_id)` pair with the rounded agreement estimate.
    * Only the incoming side shuffles; the per-pair verify touches the
    * two signatures already co-located by the join. */
  def screenBatch(spark: SparkSession, table: String, incSigs: DataFrame,
                  k: Int, bands: Int, minAgree: Double): DataFrame = {
    val idx = spark.table(table)
      .select(col("bkey"), col("doc_id").as("hist_id"), col("sig").as("hist_sig"))
    val inc = bandKeyed(incSigs, k, bands)
      .select(col("bkey"), col("doc_id").as("inc_id"), col("sig").as("inc_sig"))
    idx.join(inc, "bkey")
      .filter(col("hist_id") =!= col("inc_id"))
      .dropDuplicates("inc_id", "hist_id")
      .withColumn("agree", round(
        size(filter(zip_with(col("inc_sig"), col("hist_sig"),
          (a, b) => a === b), m => m)).cast("double") / lit(k.toDouble), 6))
      .filter(col("agree") >= lit(minAgree))
      .select("inc_id", "hist_id", "agree")
  }
}
