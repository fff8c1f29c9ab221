package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, bucket-partitioned inverted index — the lexical-retrieval
  * mirror of [[graft.sim.IndexOps]]'s IVF family: tokenize the corpus
  * ONCE into term-hash-partitioned posting lists, then every query reads
  * only the partitions its terms live in. The probe is partition pruning
  * at planning time (an `isin` literal over the query terms' buckets —
  * `PartitionFilters` on the postings scan, pinned by RetrievalSpec), so
  * query cost scales with the matched posting lists, never the corpus:
  * the difference between "re-tokenize 100 TB per query"
  * ([[RetrievalOps.bm25Scores]] — right for ad-hoc one-offs) and "serve
  * queries off a standing index" (this — right for a query workload).
  *
  * Layout under `dir`:
  *  - `postings/bucket=<h>/`: `(term, doc_id, tf, dl)` rows. A term's
  *    postings all share its hash bucket, so the term's document
  *    frequency is BUCKET-LOCAL — query-time df is an aggregate over
  *    the pruned partitions only, which is what keeps the layout
  *    append-friendly (no stored df to invalidate per batch);
  *  - `collstats/`: `(n_docs, dl_sum)` rows, one per build/append.
  *    Doc lengths are integers, so their double sums are EXACT and the
  *    derived `avgdl = Σdl_sum / Σn_docs` is bit-identical to the scan
  *    path's one-pass `avg` under any batch split.
  *
  * Bucket count trades pruning granularity against small-file count:
  * 64 here; a 100 TB index raises it with the corpus (posting lists per
  * bucket stay scannable) — the same knob as IVF's cell count.
  */
object InvertedIndex {

  private def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** The per-corpus-slice frames the index stores: bucketed postings
    * and the 1-row collection-stats increment. */
  private def indexFrames(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int): (DataFrame, DataFrame) = {
    // tokenize ONCE (eager materialization): postings explode it and the
    // collection stats aggregate it — formerly two tokenizer passes over
    // the full text per build/append (the RetrievalOps.tokenize seam)
    val tok = docs
      .select(col(idCol).as("doc_id"),
        TextOps.wsTokens(lower(col(textCol))).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("double").as("dl"),
        col("ts"))
      .localCheckpoint(true)
    val toks = tok.select(col("doc_id"), col("dl"),
      explode(col("ts")).as("term"))
    val postings = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
    val stats = tok
      .agg(count(lit(1)).cast("double").as("n_docs"),
        sum(col("dl")).as("dl_sum"))
    (postings, stats)
  }

  /** Build (or rebuild) the index at `dir`: one tokenize pass + the
    * (doc, term) tf aggregate, written bucket-partitioned. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            nBuckets: Int = 64): Unit = {
    val (postings, stats) = indexFrames(docs, idCol, textCol, nBuckets)
    // cluster by bucket before the partitioned write: one file per
    // bucket instead of (tasks × buckets) small files (guide §6 output
    // sizing — probe-side reads open 64× fewer files)
    postings.repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")
    stats.coalesce(1).write.mode("overwrite").parquet(s"$dir/collstats")
  }

  /** Replay-idempotent micro-batch append — the [[graft.sim.IndexOps
    * .appendIvfBatch]] shape for text: the batch's postings land under
    * the bucket partitions and its 1-row stats increment lands in
    * `collstats`, both through the archive writer's marker/staging/
    * deterministic-rename protocol, so a replayed `foreachBatch`
    * delivery converges to exactly-once postings AND stats (a doubled
    * stats row would silently deflate every idf). */
  def appendBatch(batch: DataFrame, idCol: String, textCol: String,
                  dir: String, nBuckets: Int, batchId: Long,
                  streamId: String): Unit = {
    val (postings, stats) = indexFrames(batch, idCol, textCol, nBuckets)
    graft.sources.PartitionedArchive.appendBatchAt(postings,
      s"$dir/postings", Seq("bucket"), Seq("term", "doc_id"),
      batchId, streamId)
    graft.sources.PartitionedArchive.appendBatchAt(stats,
      s"$dir/collstats", Seq.empty, Seq("n_docs"), batchId,
      s"$streamId-stats")
  }

  /** BM25 top-k off the standing index: `(query_id, rank, doc_id,
    * score)`, bit-identical to [[RetrievalOps.bm25TopK]] over the same
    * corpus (same tf/df/dl/stats values, same contribution expression
    * in the same association order, same nano-unit sums and
    * bounded-heap rank), so the scan path's oracle applies verbatim.
    * The bucket set is a bounded collect (≤ |query terms| values)
    * turned into a partition-pruning literal; df and the collection
    * stats are aggregates over the pruned postings / the metadata-scale
    * collstats rows. */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
                      queryTerms: DataFrame, k: Int, nBuckets: Int = 64,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms
      .select(col("query_id").cast("long").as("query_id"), col("term"),
        lit(1.0).as("w"))
      .distinct()
    val termSet = terms.select("term").distinct()
    val buckets = terms
      .select(bucketOf(col("term"), nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)) // bounded: ≤ |query terms|
    // pruned postings restricted to the query terms — identical rows to
    // bm25Scores' filtered tf aggregate
    // NOT checkpointed (unlike RetrievalOps.bm25ScoresTok's tf): both
    // references re-read the postings, but those are PARTITION-PRUNED
    // scans (the point of the index — RetrievalSpec pins the
    // PartitionFilters in this very plan), so the recompute is two
    // bounded pruned reads, not a corpus pass
    val tf = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isInCollection(buckets.toIndexedSeq))
      .join(broadcast(termSet), Seq("term"))
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
    // a term's postings are bucket-local, so this pruned count IS the
    // corpus df for these terms
    val dfreq = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    // exact integer sums in doubles → bit-identical to one-pass avg
    val stats = spark.read.parquet(s"$dir/collstats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum"))
      .select(col("n_docs"), (col("dl_sum") / col("n_docs")).as("avgdl"))
    val kk1 = lit(k1); val bb = lit(b)
    val contrib = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(terms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("c",
        col("w")
          * log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * (kk1 + lit(1.0))
          / (col("tf") + kk1 * (lit(1.0) - bb + bb * col("dl") / col("avgdl"))))
      .withColumn("cn", round(col("c") * 1e9, 0).cast("long"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("cn")).cast("double") / 1e9, 6).as("score"))
    RetrievalOps.rankTopK(scored, "query_id", "doc_id", "score", k)
  }
}
