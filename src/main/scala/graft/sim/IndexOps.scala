package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN index: the IVF inverted lists stored as a cell-
  * partitioned parquet layout, so that probing cells at query time is
  * parquet PARTITION PRUNING — the scan plans only the probed cell
  * directories and scanned bytes are proportional to the probed lists,
  * never the corpus. This is the FAISS inverted-list design re-expressed
  * in Spark's native storage idiom: the index layout IS the query plan
  * (same principle the events archive uses for time pruning —
  * PartitionedArchive — applied to vector search).
  *
  * Build once, query many: [[SimilarityOps.ivfTopKFrom]] re-assigns the
  * corpus on every search (right for one-shot jobs); this pays the
  * assignment once at build and amortizes it across every subsequent
  * query batch. At 100 TB the build is the one corpus-sized pass and a
  * partitioned write; each query batch then reads |probed cells| /
  * |cells| of the index — with nProbe=2 of 16 cells, an ~8× I/O
  * reduction before any compute, growing with the cell count.
  */
object IndexOps {

  /** Assign every corpus vector to its coarse cell
    * ([[SimilarityOps.assignCells]] — map-side `max_by`, one row per
    * vector crosses the exchange) and persist:
    * `dir/postings/cell=<c>/…` (id, v, nv per member — the norm is
    * precomputed at build so queries never recompute it) and
    * `dir/centroids` (the tiny routing table). */
  def buildIvfIndex(emb: DataFrame, idCol: String, vecCol: String,
                    centroidFrame: DataFrame, dir: String): Unit = {
    SimilarityOps.assignCells(emb, idCol, vecCol, centroidFrame)
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/postings")
    centroidFrame.select(col("cell"), col("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Search a persisted index. `queries` is a bounded frame
    * `(query_id, qv)` from OUTSIDE the index (the serving shape). The
    * probe cells per query come from the broadcast centroid table; the
    * distinct probed-cell set is a bounded collect (≤ |queries|·nProbe
    * values) turned into an `isin` literal, so Catalyst prunes the cell
    * partitions AT PLANNING TIME (`PartitionFilters` on the scan —
    * pinned by IndexSpec). Exact cosine + bounded-heap rank within the
    * probed lists, identical semantics to [[SimilarityOps.ivfTopKFrom]].
    */
  def queryIvfIndex(spark: SparkSession, dir: String, queries: DataFrame,
                    k: Int, nProbe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val qbase = queries.select(col("query_id").as("id"), col("qv").as("v"),
      SimilarityOps.l2norm(col("qv")).as("nv"))
    val probed = SimilarityOps.probeCells(qbase, centroids, nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nv").as("nq"), col("cell"))
    val cells = probed.select("cell").distinct()
      .collect().map(_.get(0)) // bounded: ≤ queries × nProbe cells
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
    val scored = postings.join(broadcast(probed), Seq("cell"))
      .filter(col("query_id") =!= col("id"))
      .withColumn("cos", round(
        SimilarityOps.dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6))
      .withColumn("cell", col("cell").cast("long"))
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos"), col("cell"))
    SimilarityOps.rankTopK(scored, "cos", k, tag = Some("cell"))
      .select("query_id", "rank", "neighbor_id", "cos", "cell")
  }

  /** Replay-idempotent micro-batch append into a persisted IVF index:
    * assign the batch against the (static, broadcast) centroid table and
    * land it under the cell partitions with the archive writer's
    * marker/staging/deterministic-rename protocol
    * ([[graft.sources.PartitionedArchive.appendBatchAt]]) — a replayed
    * `foreachBatch` delivery converges to exactly-once postings. The
    * coarse quantizer stays FIXED at ingest (the FAISS operating model:
    * retraining centroids moves every assignment, so it is an offline
    * rebuild, not an append). */
  def appendIvfBatch(batch: DataFrame, idCol: String, vecCol: String,
                     centroidFrame: DataFrame, dir: String,
                     batchId: Long, streamId: String): Unit =
    graft.sources.PartitionedArchive.appendBatchAt(
      SimilarityOps.assignCells(batch, idCol, vecCol, centroidFrame),
      s"$dir/postings", Seq("cell"), Seq("cell", "id"), batchId, streamId)

  /** IVF-PQ variant of the persisted index: what gets stored per vector
    * is the `m` PQ codes plus the cell — the 4×-to-64× compressed
    * representation — laid out as cell partitions. This is the layout a
    * 100 TB embedding store actually ships: the index (codes) is a small
    * fraction of the corpus bytes, the raw vectors stay in cold storage,
    * and a search reads `probed cells / cells` OF THE CODES. Codebooks
    * and centroids persist beside the postings. */
  def buildIvfPqIndex(emb: DataFrame, idCol: String, vecCol: String,
                      centroidFrame: DataFrame, m: Int, ksub: Int,
                      dir: String): Unit = {
    val asg = SimilarityOps.assignCells(emb, idCol, vecCol, centroidFrame)
      .select(col("id"), col("cell"))
    val books = SimilarityOps.pqCodebooks(emb, idCol, vecCol, m, ksub)
    SimilarityOps.pqEncode(emb, idCol, vecCol, books, m)
      .join(asg, Seq("id"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$dir/codes")
    books.coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    centroidFrame.select(col("cell"), col("cv"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Asymmetric-distance search over a persisted IVF-PQ index: probe
    * cells from the centroid table (partition pruning, as in
    * [[queryIvfIndex]]), build the per-query ADC table against the
    * broadcast codebooks, and rank by summed table lookups — the probed
    * CODE partitions are the only corpus-sized thing read, at m codes
    * per vector instead of the full embedding. Same arithmetic as
    * [[SimilarityOps.ivfPqTopK]] (9-decimal subspace rounding, round-6
    * distance, ascending heap rank). */
  def queryIvfPqIndex(spark: SparkSession, dir: String, queries: DataFrame,
                      k: Int, nProbe: Int, m: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$dir/centroids")
    val books = spark.read.parquet(s"$dir/codebooks")
    val qbase = queries.select(col("query_id"),
      SimilarityOps.toDouble(col("qv")).as("qv"),
      SimilarityOps.l2norm(col("qv")).as("nq"))
    val probed = SimilarityOps.probeCells(
        qbase.select(col("query_id").as("id"), col("qv").as("v"),
          col("nq").as("nv")),
        centroids, nProbe)
      .select(col("id").as("query_id"), col("cell"))
    val qtab = qbase
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("qv"))
      .select(col("query_id"), col("sub"),
        SimilarityOps.subSlice(col("qv"), col("sub"), m).as("qsv"))
      .join(broadcast(books), Seq("sub"))
      .select(col("query_id"), col("sub"), col("code"),
        round(SimilarityOps.l2sq(col("qsv"), col("cv")), 9).as("pd"))
    val cells = probed.select("cell").distinct()
      .collect().map(_.get(0)) // bounded: ≤ queries × nProbe cells
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
      .withColumn("cell", col("cell").cast("long"))
    val scored = codes.join(broadcast(probed), Seq("cell"))
      .join(broadcast(qtab), Seq("query_id", "sub", "code"))
      .filter(col("query_id") =!= col("id"))
      .groupBy(col("query_id"), col("id").as("neighbor_id"), col("cell"))
      .agg(round(sum("pd"), 6).as("d2"))
    SimilarityOps.rankTopK(scored, "d2", k, ascending = true, tag = Some("cell"))
      .select("query_id", "rank", "neighbor_id", "d2", "cell")
  }
}
