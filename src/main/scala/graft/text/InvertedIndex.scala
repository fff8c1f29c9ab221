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
  *  - `postings/bucket=<h>/`: `(term, doc_id, tf, dl, df)` — df
  *    denormalized onto each posting row so scoring needs no second
  *    term-stats read; all stats are identical to what
  *    [[RetrievalOps.bm25Scores]] derives per query, so indexed scores
  *    are BIT-IDENTICAL to the scan path and share its oracle;
  *  - `collstats/`: one row `(n_docs, avgdl)` — the same
  *    `agg(count, avg)` expression the scan path computes, persisted.
  *
  * Bucket count trades pruning granularity against small-file count:
  * 64 here; a 100 TB index raises it with the corpus (posting lists per
  * bucket stay scannable) — the same knob as IVF's cell count.
  */
object InvertedIndex {

  private def bucketOf(term: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(term), lit(nBuckets.toLong)).cast("int")

  /** Build (or rebuild) the index at `dir`. One tokenize pass + the
    * (doc, term) tf aggregate + one term-keyed df join — the df join
    * shuffles on term, which is also the partitioning the write needs,
    * so the exchange is reused. */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
            nBuckets: Int = 64): Unit = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        TextOps.wsTokens(lower(col(textCol))).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("double").as("dl"),
        explode(col("ts")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    tf.join(dfreq, Seq("term"))
      .withColumn("bucket", bucketOf(col("term"), nBuckets))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/postings")
    // the SAME stats expression bm25Scores computes per query — persisted
    // so the serve path pays a 1-row read instead of a corpus scan
    docs.select(size(TextOps.wsTokens(lower(col(textCol))))
        .cast("double").as("dl0"))
      .agg(count(lit(1)).cast("double").as("n_docs"), avg("dl0").as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/collstats")
  }

  /** BM25 top-k off the standing index: `(query_id, rank, doc_id,
    * score)`, bit-identical to [[RetrievalOps.bm25TopK]] over the same
    * corpus (same tf/df/dl/stats, same contribution expression in the
    * same association order, same nano-unit sums and bounded-heap
    * rank), so the scan path's oracle applies verbatim. The bucket set
    * is a bounded collect (≤ |query terms| values) turned into a
    * partition-pruning literal. */
  def bm25TopKIndexed(spark: SparkSession, dir: String,
                      queryTerms: DataFrame, k: Int, nBuckets: Int = 64,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = queryTerms
      .select(col("query_id").cast("long").as("query_id"), col("term"),
        lit(1.0).as("w"))
      .distinct()
    val buckets = terms
      .select(bucketOf(col("term"), nBuckets).as("b")).distinct()
      .collect().map(_.getInt(0)) // bounded: ≤ |query terms|
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isInCollection(buckets.toIndexedSeq))
    val stats = spark.read.parquet(s"$dir/collstats")
    val kk1 = lit(k1); val bb = lit(b)
    // expression-for-expression the bm25Scores contribution, with df
    // read off the posting row instead of re-aggregated
    val contrib = postings
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
