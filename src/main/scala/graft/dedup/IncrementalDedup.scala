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
    * honors the table's bucket spec, so the index stays join-ready. */
  def appendBatch(spark: SparkSession, sigs: DataFrame, k: Int,
                  bands: Int, table: String): Unit =
    bandKeyed(sigs, k, bands).write.insertInto(table)

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
