package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables
import graft.sim.SimilarityOps
import OracleFixtures.{seam, sqlPath}

/** Similarity-search query surface over `embeddings` (north-star
  * extensions). The exact paths have direct DuckDB oracles (cosine
  * recomputed in double with identical rounding); the hash-bucketed paths
  * (banded-LSH pairs, LSH ANN) split at their deterministic seam — the
  * Spark-computed signature frame is a parquet fixture, and the oracle runs
  * the whole downstream stage (band join → candidates → exact verify /
  * probe join → exact rank) in DuckDB over that fixture. SimilaritySpec
  * additionally pins LSH recall against the exact baselines.
  */
object SimQueries {

  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Banded-LSH pair-scan parameters: 32 bands × 4 planes. At the 0.4
    * threshold (hyperplane collision p ≈ 0.63) per-pair miss probability is
    * (1 − p⁴)³² ≈ 4e-3 with candidate volume ~bands/2^rows = n² — half the
    * 3-plane config's at near-equal recall; at a production near-dup
    * threshold of 0.8 (p ≈ 0.80) the same shape with 8-plane bands prunes
    * ~255/256 of the corpus per band. Tune (rows, bands) to the threshold —
    * see [[graft.sim.SimilarityOps.lshPairCandidates]]. */
  private val PairRows = 4
  private val PairBands = 32

  /** Hard-negative mining parameters shared by the query builder AND its
    * oracle SQL (interpolated into both, so they cannot desynchronize):
    * every `AnchorSelector`-th vec_id is an anchor, capped to the first
    * `MaxAnchors` such ids → the anchor predicate is
    * `vec_id % AnchorSelector = 0 AND vec_id < AnchorSelector*MaxAnchors`. */
  private val AnchorSelector = 50
  private val MaxAnchors = 100
  private val NegK = 5

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inter-class centroid similarity matrix (the label-quality /
    // class-leakage audit a curation pipeline runs before training a
    // classifier: labels whose centroids cosine ≈ 1 are candidates for
    // merging or relabel review). Cosine is scale-invariant, so the
    // per-label mean vector's 1/n cancels and the whole matrix reduces
    // to exact INTEGER micro-unit sums per (label, dim) — one explode +
    // map-side-combined aggregate over the corpus, then everything
    // (norms, 45 pairwise dots) runs on the label×64 rollup. No float
    // accumulates anywhere; one closed-form division per pair.
    "q_centroid_sim" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sums = emb(s, dir)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(round(col("col") * 1e6, 0).cast("long"))
          .cast("decimal(38,0)").as("s"))
        .localCheckpoint(true)
      val norms = sums.groupBy(col("label"))
        .agg(sum(col("s") * col("s")).as("nn"))
      val dots = sums.select(col("label").as("label_a"),
          col("pos"), col("s").as("sa"))
        .join(sums.select(col("label").as("label_b"),
            col("pos"), col("s").as("sb")),
          Seq("pos"))
        .filter(col("label_a") < col("label_b"))
        .groupBy(col("label_a"), col("label_b"))
        .agg(sum(col("sa") * col("sb")).as("dot"))
      dots
        .join(norms.select(col("label").as("label_a"), col("nn").as("nna")),
          "label_a")
        .join(norms.select(col("label").as("label_b"), col("nn").as("nnb")),
          "label_b")
        .select(col("label_a"), col("label_b"),
          round(col("dot").cast("double") /
            (sqrt(col("nna").cast("double")) *
             sqrt(col("nnb").cast("double"))), 6).as("cos"))
        .orderBy("label_a", "label_b")
    }),

    // Exact brute-force cosine top-5: every 10th vector among the first 100
    // such ids is a query — FIXED-size query set, so the broadcast side
    // stays O(100) vectors no matter the corpus size.
    "q_cosine_topk" -> ((s, dir) =>
      SimilarityOps.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, maxQueries = 100)
        .orderBy("query_id", "rank")),

    // Truncated-embedding retrieval audit (the Matryoshka question,
    // Kusupati et al. 2022: how much recall do the first 16 of 64 dims
    // keep?): top-5 by full-dim cosine vs top-5 by prefix-dim cosine
    // over the same fixed query set, reported as per-query overlap and
    // recall@5. Both rank sets come from the SAME audited
    // bruteForceTopK skeleton (broadcast queries, bounded heap, rounded
    // ties) — the truncated side just slices the vector column before
    // scoring, so the whole audit costs two corpus passes and a
    // query-sized join at any scale. This is the dimension-budget
    // decision (index memory ∝ dims) made from data, not vibes.
    "q_embed_trunc_recall" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val e = emb(s, dir)
      val full = SimilarityOps.bruteForceTopK(e, "vec_id", "embedding",
          querySelector = 10, k = 5, maxQueries = 100)
        .select(col("query_id"), col("neighbor_id"))
      val trunc = SimilarityOps.bruteForceTopK(
          e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
          "vec_id", "embedding", querySelector = 10, k = 5, maxQueries = 100)
        .select(col("query_id"), col("neighbor_id"))
      val hits = full.join(trunc, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      // zero-overlap queries must still report (left join, not the
      // hits frame alone)
      full.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / 5, 6)
            .as("recall_at_5"))
        .orderBy("query_id")
    }),

    // EXACT kNN self-join (the kNN graph): every vector's 5 nearest
    // others — block-pair equi-join pair scan, both directions through
    // the bounded-heap rank. Oracle = brute-force per-query window.
    "q_knn_join" -> ((s, dir) =>
      SimilarityOps.knnJoin(emb(s, dir), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")),

    // Sub-quadratic kNN graph via IVF cells: deterministic 16-cell
    // quantizer, each vector probes its 2 best cells, candidates = cell
    // equi-join — compare work Σ|cell|·|probes| instead of n². The
    // oracle replays assignment, probe ranking (rounded sim), and the
    // within-cell exact rank in SQL — recall<1 vs q_knn_join is the
    // CONTRACT, checked exactly, not hand-waved.
    "q_knn_join_ivf" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val e = emb(s, dir)
      val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
        .orderBy("cell").limit(16)
      SimilarityOps.knnJoinIvf(e, "vec_id", "embedding", cent,
          k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // All pairs with cosine >= 0.4 — EXACT, via the distributed block-pair
    // join (no corpus broadcast, no nested-loop node; see
    // SimilarityOps.cosinePairsBlocked).
    "q_cosine_pairs" -> ((s, dir) =>
      SimilarityOps.cosinePairsBlocked(emb(s, dir), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")),

    // The sub-quadratic pair scan: banded-LSH candidates -> exact verify.
    // The signature frame is the fixture seam; the oracle replays the band
    // join + verification in DuckDB over it.
    "q_cosine_pairs_lsh" -> ((s, dir) => {
      val sig = seam(SimilarityOps.bandedSignatures(
        emb(s, dir), "vec_id", "embedding", PairRows, PairBands),
        dir, "lshpair_sigs")
      SimilarityOps.cosinePairsLsh(sig, 0.4).orderBy("id_a", "id_b")
    }),

    // ANN: random-hyperplane LSH buckets (6 planes → 64 buckets), top-5
    // within bucket + Hamming-1 multi-probe. Plane count scales with corpus
    // size (log n). Signature frame is the fixture seam.
    "q_ann_lsh" -> ((s, dir) => {
      val sig = seam(SimilarityOps.lshSignatures(
        emb(s, dir), "vec_id", "embedding", nPlanes = 6), dir, "annlsh_sigs")
      SimilarityOps.lshTopKFrom(sig, querySelector = 10, k = 5, nPlanes = 6)
        .orderBy("query_id", "rank")
    }),

    // ANN: IVF cells (16 centroids, 2 probes), exact rank within cells.
    "q_ann_ivf" -> ((s, dir) =>
      SimilarityOps.ivfTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, nCells = 16, nProbe = 2)
        .orderBy("query_id", "rank")),

    // PERSISTED IVF index roundtrip: build the cell-partitioned parquet
    // index (inverted lists AS partitions), then search it from an
    // external query frame — probing becomes parquet partition pruning
    // (IndexSpec pins PartitionFilters and the pruned file count). Same
    // deterministic quantizer and parameters as q_ann_ivf, so the
    // persist→prune→scan roundtrip must reproduce q_ann_ivf's answer
    // exactly; the oracle SQL is shared verbatim.
    "q_ann_ivf_index" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val e = emb(s, dir)
      val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
        .orderBy("cell").limit(16)
      val sfName = new java.io.File(dir.replaceAll("/+$", "")).getName
      val idx = s"/tmp/graft_index/$sfName/ivf"
      graft.sim.IndexOps.buildIvfIndex(e, "vec_id", "embedding", cent, idx)
      val queries = e.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.sim.IndexOps.queryIvfIndex(s, idx, queries, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // STREAMED index ingest: the embeddings arrive as a stream, each
    // micro-batch is assigned and appended to the cell partitions via
    // the replay-idempotent batch appender, and the resulting index is
    // searched with the standard query set — streamed index ≡ batch
    // index ≡ recompute-per-search, so the q_ann_ivf oracle applies
    // verbatim (assignment is per-row and the appender is exactly-once,
    // so arrival batching cannot change the postings).
    "q_ann_ivf_stream" -> ((s, dir) =>
      graft.streaming.StreamingOps.runStreamIndexOnce(s, dir)
        .orderBy("query_id", "rank")),

    // ANN: IVF over a TRAINED spherical-k-means quantizer (3 Lloyd
    // rounds on a bounded sample — the r8 FAISS-discipline trainer: one
    // corpus pass total instead of one assignment pass per round). The
    // trained centroid frame is the fixture seam; the oracle replays
    // assignment + probe + exact rank from it in SQL.
    "q_ann_ivf_trained" -> ((s, dir) => {
      val cent = seam(SimilarityOps.kmeansCentroidsSampled(
        emb(s, dir), "vec_id", "embedding", k = 16, iters = 3),
        dir, "ivf_centroids")
      SimilarityOps.ivfTopKFrom(emb(s, dir), "vec_id", "embedding", cent,
          querySelector = 10, k = 5, nProbe = 2)
        .orderBy("query_id", "rank")
    }),

    // PRODUCTION-parameter IVF (r13 verdict #5): the same trained
    // quantizer and search plan as q_ann_ivf_trained but at a SERVABLE
    // operating point — nProbe 10 of 16 cells. The contract's toy cells
    // (nProbe 2) prove the algorithms bit-exactly at 6-146x above
    // chance; this cell proves the engine can be CONFIGURED to a recall
    // target: tools/check_ann_recall.py pins measured recall@5 >= 0.80
    // vs the exact top-k (measured 0.88 at nProbe 10 on the synthetic
    // corpus — near-random embeddings are the worst case for IVF, where
    // recall is bounded by probe coverage; clustered production corpora
    // reach the same recall at far lower nProbe). Search cost scales
    // with coverage (10/16 of the corpus per query), the price of a
    // recall floor on unclusterable data — the SAME index serves any
    // per-query nProbe, so the operating point is a knob, not a build.
    // Shares the ivf_centroids fixture (identical trainer), so the
    // oracle replays assignment -> 10-cell probe -> exact rank from it.
    "q_ann_ivf_prod" -> ((s, dir) => {
      val cent = seam(SimilarityOps.kmeansCentroidsSampled(
        emb(s, dir), "vec_id", "embedding", k = 16, iters = 3),
        dir, "ivf_centroids")
      SimilarityOps.ivfTopKFrom(emb(s, dir), "vec_id", "embedding", cent,
          querySelector = 10, k = 5, nProbe = 10)
        .orderBy("query_id", "rank")
    }),

    // Embedding-cosine near-dup DEDUP: the full keep/drop resolution over
    // the vector near-dup graph (the pair scan's downstream stage, mirroring
    // what q_dedup_clusters is to q_dedup_ngram). Exact block-pair scan →
    // connected components → one row per vector with its cluster id (min
    // vec_id in the component) and the keep flag. At scale, swap the exact
    // pair scan for the banded-LSH candidates + verify (cosinePairsLsh) —
    // the downstream clustering is identical.
    "q_dedup_embed" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val pairs = SimilarityOps.cosinePairsBlocked(
          emb(s, dir), "vec_id", "embedding", 0.4)
        .select(col("id_a"), col("id_b"))
      val clusters = graft.dedup.DedupOps.duplicateClusters(pairs)
        .withColumnRenamed("doc_id", "vec_id")
      emb(s, dir).select(col("vec_id"))
        .join(clusters, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
          (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id"))
            .cast("int").as("keep"))
        .orderBy("vec_id")
    }),

    // Global Gram matrix over the embedding store in ONE corpus pass —
    // the PCA/whitening/covariance precursor. The native GramMicroAgg
    // keeps one d(d+1)/2 long buffer per partition (map-side combined;
    // 16 KB at d=64, independent of row count); per-term micro-unit
    // rounding makes the integer sums engine-exact under any
    // accumulation order. Output stays integer (s_micro) — covariance
    // derives as (s/1e6 − n·mean_i·mean_j)/n downstream.
    "q_embed_gram" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      emb(s, dir)
        .agg(graft.functions.GramMicroAgg.gram_micro(col("embedding"), 64).as("g"),
          count(lit(1)).as("n"))
        .select(col("n"), explode(col("g")).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"),
          col("e.s").as("s_micro"), col("n"))
        .orderBy("i", "j")
    }),

    // PCA projection of the embedding store (the Gram aggregate's
    // consumer): ONE corpus pass collects exact second/first moments via
    // GramMicroAgg with an appended constant dimension; the driver
    // eigensolves the 64×64 covariance with deterministic cyclic Jacobi
    // (fixed sweep order, eigenvalue-desc order, sign-fixed, rounded at
    // 9); the rounded (μ, P) frame is the fixture seam; projection onto
    // the top 4 components is then MAP-ONLY (literal arrays + HOF
    // nano-unit integer terms — no shuffle, engine-exact, scales as one
    // scan at 100 TB). See graft.sim.PcaOps.
    "q_pca_project" -> ((s, dir) => {
      val model = graft.sim.PcaOps.fit(emb(s, dir), "embedding", 64, 4)
      val fx = seam(graft.sim.PcaOps.modelFrame(s, model), dir, "pca_model")
      graft.sim.PcaOps.project(emb(s, dir), "vec_id", "embedding", fx, 4)
        .orderBy("vec_id")
    }),

    // Prototypicality pruning (Sorscher et al. 2022): keep the hardest
    // 24 examples per k-means cluster by cosine distance to the assigned
    // centroid — the data-pruning metric that drops each cluster's
    // easy/redundant core first. Sampled-k-means centroids are the
    // fixture seam; assignment is one broadcast corpus pass and the rank
    // is the shared bounded heap (no corpus-sized window).
    "q_proto_prune" -> ((s, dir) => {
      val cent = seam(SimilarityOps.kmeansCentroidsSampled(
        emb(s, dir), "vec_id", "embedding", k = 16, iters = 3),
        dir, "proto_centroids")
      SimilarityOps.protoPrune(emb(s, dir), "vec_id", "embedding", cent, keepK = 24)
        .orderBy("cell", "rank")
    }),

    // Symmetric int8 quantization of the embedding store (4× compression):
    // per-vector scale + quantized-L1 + max reconstruction error. Map-only;
    // integer outputs are engine-exact, the doubles round at 6.
    "q_embed_quant" -> ((s, dir) =>
      SimilarityOps.int8Quantize(emb(s, dir), "vec_id", "embedding")
        .orderBy("vec_id")),

    // SemDeDup (Abbas et al. 2023): semantic dedup that only pair-scans
    // WITHIN a trained coarse cluster — comparisons cost Σ|cell|², not n².
    // The trained centroid frame is the fixture seam (same recipe as
    // q_ann_ivf_trained); the oracle replays assignment → within-cell pair
    // scan → connected components → keep flags in SQL.
    "q_semdedup" -> ((s, dir) => {
      val cent = seam(SimilarityOps.kmeansCentroids(
        emb(s, dir), "vec_id", "embedding", k = 16, iters = 3),
        dir, "semdedup_centroids")
      SimilarityOps.semDedup(emb(s, dir), "vec_id", "embedding", cent, 0.4)
        .orderBy("vec_id")
    }),

    // ANN via product quantization (Jégou et al. 2011): corpus stored as
    // m=4 one-byte-ish codes, queries rank by summed distance-table
    // lookups. The deterministic codebook (16 lowest-id vectors per
    // subspace) makes the whole pipeline SQL-replayable — direct oracle,
    // no fixture.
    "q_ann_pq" -> ((s, dir) =>
      SimilarityOps.pqTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, m = 4, ksub = 16, maxQueries = 100)
        .orderBy("query_id", "rank")),

    // ANN via PQ with TRAINED per-subspace codebooks: spherical k-means
    // per subvector slice (3 Lloyd rounds, deterministic lowest-id init —
    // the q_ann_ivf_trained recipe applied per subspace). The trained
    // codebook frame is the fixture seam; the oracle replays encode →
    // ADC → rank from it in SQL.
    "q_ann_pq_trained" -> ((s, dir) => {
      val books = seam(SimilarityOps.pqCodebooksTrained(
        emb(s, dir), "vec_id", "embedding", m = 4, ksub = 16, iters = 3),
        dir, "pq_codebooks")
      SimilarityOps.pqTopKFrom(emb(s, dir), "vec_id", "embedding", books,
          querySelector = 10, k = 5, m = 4, maxQueries = 100)
        .orderBy("query_id", "rank")
    }),

    // ANN via IVF-PQ (FAISS's production composition): IVF cells prune the
    // search to 2 probed cells per query, PQ codes rank within them. Both
    // quantizers deterministic (lowest-id) → direct oracle.
    "q_ann_ivfpq" -> ((s, dir) =>
      SimilarityOps.ivfPqTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = 10, k = 5, nCells = 16, nProbe = 2,
          m = 4, ksub = 16, maxQueries = 100)
        .orderBy("query_id", "rank")),

    // PERSISTED IVF-PQ index roundtrip: the stored representation is m=4
    // codes + cell per vector (the compressed layout a 100 TB embedding
    // store actually ships), cell-partitioned so the ADC search reads
    // only the probed code partitions. Same quantizers/parameters as
    // q_ann_ivfpq — oracle shared verbatim.
    "q_ann_ivfpq_index" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val e = emb(s, dir)
      val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
        .orderBy("cell").limit(16)
      val sfName = new java.io.File(dir.replaceAll("/+$", "")).getName
      val idx = s"/tmp/graft_index/$sfName/ivfpq"
      graft.sim.IndexOps.buildIvfPqIndex(e, "vec_id", "embedding", cent,
        m = 4, ksub = 16, dir = idx)
      val queries = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      graft.sim.IndexOps.queryIvfPqIndex(s, idx, queries, k = 5, nProbe = 2, m = 4)
        .orderBy("query_id", "rank")
    }),

    // ANN via RESIDUAL IVF-PQ — the FAISS-faithful IndexIVFPQ: codes
    // quantize v − centroid(cell) with TRAINED per-subspace codebooks
    // (fixture seam), and each query builds one ADC table per probed
    // cell in that cell's residual space. Closes the raw-vector
    // tradeoff q_ann_ivfpq documents.
    "q_ann_ivfpq_res" -> ((s, dir) => {
      val books = seam(SimilarityOps.ivfPqResidualBooks(
        emb(s, dir), "vec_id", "embedding", nCells = 16, m = 4, ksub = 16,
        iters = 3), dir, "pqres_codebooks")
      SimilarityOps.ivfPqResidualTopK(emb(s, dir), "vec_id", "embedding",
          books, querySelector = 10, k = 5, nCells = 16, nProbe = 2, m = 4,
          maxQueries = 100)
        .orderBy("query_id", "rank")
    }),

    // Hard-negative mining (ANCE recipe): per anchor, the top-5 most
    // cosine-similar vectors whose DOCUMENT comes from a different source
    // — same-source presumed positive, high-scoring out-source = the
    // negatives with teaching signal (q_neg_sample's hash-random picks
    // are the easy-negative baseline). Broadcast anchors + heap rank.
    "q_hard_negatives" -> ((s, dir) =>
      SimilarityOps.hardNegatives(emb(s, dir), "vec_id", "embedding",
          Tables.documents(s, dir), "doc_id", "source",
          anchorSelector = AnchorSelector, k = NegK, maxAnchors = MaxAnchors)
        .orderBy("anchor_id", "rank")),

    // Residual IVF-PQ with a TRAINED coarse quantizer — FAISS's actual
    // IndexIVFPQ composition end to end: k-means cells (so residuals
    // track real cluster structure; PERF.md round 8 measures recall
    // 0.036 → 0.166 on a clustered corpus from this alone) + residual
    // codebooks trained against the SAME cells. Both the centroid frame
    // and the books are fixture seams; the oracle replays assignment →
    // encode → per-cell ADC → rank from them.
    "q_ann_ivfpq_tc" -> ((s, dir) => {
      val cent = seam(SimilarityOps.kmeansCentroidsSampled(
        emb(s, dir), "vec_id", "embedding", k = 16, iters = 3),
        dir, "pqtc_centroids")
      val books = seam(SimilarityOps.ivfPqResidualBooks(
        emb(s, dir), "vec_id", "embedding", nCells = 16, m = 4, ksub = 16,
        iters = 3, cents = Some(cent)), dir, "pqtc_codebooks")
      SimilarityOps.ivfPqResidualTopK(emb(s, dir), "vec_id", "embedding",
          books, querySelector = 10, k = 5, nCells = 16, nProbe = 2, m = 4,
          maxQueries = 100, cents = Some(cent))
        .orderBy("query_id", "rank")
    }),

    // The SAME dedup with the sub-quadratic pair stage: banded-LSH
    // candidates + exact verify feed the identical clustering. Fixture
    // seam (signatures) + the oracle replays band join → verify → CC.
    "q_dedup_embed_lsh" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val sig = seam(SimilarityOps.bandedSignatures(
        emb(s, dir), "vec_id", "embedding", PairRows, PairBands),
        dir, "embdedup_sigs")
      val pairs = SimilarityOps.cosinePairsLsh(sig, 0.4)
        .select(col("id_a"), col("id_b"))
      val clusters = graft.dedup.DedupOps.duplicateClusters(pairs)
        .withColumnRenamed("doc_id", "vec_id")
      sig.select(col("id").as("vec_id"))
        .join(clusters, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
          (coalesce(col("cluster_id"), col("vec_id")) === col("vec_id"))
            .cast("int").as("keep"))
        .orderBy("vec_id")
    }),
  )

  /** IVF ANN with the deterministic coarse quantizer, replayed directly
    * in SQL — shared by q_ann_ivf (recompute-per-search) and
    * q_ann_ivf_index (persisted cell-partitioned index): identical
    * semantics by construction. */
  private val AnnIvfOracle: String =
    """WITH base AS (
      |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent AS (
      |  SELECT id AS cell, v AS cv FROM base ORDER BY id LIMIT 16),
      |asg AS (
      |  SELECT b.id, b.v, c.cell,
      |         row_number() OVER (PARTITION BY b.id
      |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
      |  FROM base b CROSS JOIN cent c),
      |corpus AS (SELECT id AS neighbor_id, v, cell FROM asg WHERE r = 1),
      |qs AS (SELECT id AS query_id, v AS qv, cell FROM asg
      |       WHERE r <= 2 AND id % 10 = 0),
      |pairs AS (
      |  SELECT q.query_id, c.neighbor_id,
      |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos, c.cell
      |  FROM qs q JOIN corpus c
      |    ON q.cell = c.cell AND q.query_id <> c.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos, cell,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM pairs)
      |SELECT query_id, rank, neighbor_id, cos, cell
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** Trained-quantizer IVF replay from the `ivf_centroids` fixture,
    * parameterized by probe depth — shared by q_ann_ivf_trained
    * (nProbe 2, the toy contract point) and q_ann_ivf_prod (nProbe 10,
    * the recall>=0.8 production point): identical assignment, probe and
    * exact-rank semantics by construction. */
  private def annIvfTrainedOracle(nProbe: Int): String =
    s"""WITH base AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (
       |  SELECT cell, CAST(cv AS DOUBLE[]) AS cv
       |  FROM read_parquet('${sqlPath("ivf_centroids")}')),
       |asg AS (
       |  SELECT b.id, b.v, c.cell,
       |         row_number() OVER (PARTITION BY b.id
       |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
       |  FROM base b CROSS JOIN cent c),
       |corpus AS (SELECT id AS neighbor_id, v, cell FROM asg WHERE r = 1),
       |qs AS (SELECT id AS query_id, v AS qv, cell FROM asg
       |       WHERE r <= $nProbe AND id % 10 = 0),
       |pairs AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos, c.cell
       |  FROM qs q JOIN corpus c
       |    ON q.cell = c.cell AND q.query_id <> c.neighbor_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos, cell,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM pairs)
       |SELECT query_id, rank, neighbor_id, cos, cell
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin

  /** IVF-PQ with both deterministic quantizers, replayed directly in
    * SQL — shared by q_ann_ivfpq (recompute-per-search) and
    * q_ann_ivfpq_index (persisted cell-partitioned code layout). */
  private val AnnIvfPqOracle: String =
    """WITH base AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT id AS cell, v AS cv FROM base ORDER BY id LIMIT 16),
        |cellasg AS (
        |  SELECT b.id, c.cell,
        |         row_number() OVER (PARTITION BY b.id
        |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
        |  FROM base b CROSS JOIN cent c),
        |asg AS (SELECT id, cell FROM cellasg WHERE r = 1),
        |subs AS (SELECT unnest(range(0, 4)) AS sub),
        |books AS (
        |  SELECT s.sub, b.id AS code,
        |         list_slice(b.v, CAST(s.sub * (len(b.v) // 4) + 1 AS INT),
        |                    CAST((s.sub + 1) * (len(b.v) // 4) AS INT)) AS cv
        |  FROM (SELECT id, v FROM base ORDER BY id LIMIT 16) b CROSS JOIN subs s),
        |corpus_subs AS (
        |  SELECT b.id, s.sub,
        |         list_slice(b.v, CAST(s.sub * (len(b.v) // 4) + 1 AS INT),
        |                    CAST((s.sub + 1) * (len(b.v) // 4) AS INT)) AS sv
        |  FROM base b CROSS JOIN subs s),
        |enc_ranked AS (
        |  SELECT cs.id, cs.sub, bk.code,
        |         row_number() OVER (PARTITION BY cs.id, cs.sub
        |           ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cv),
        |                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), bk.code) AS r
        |  FROM corpus_subs cs JOIN books bk ON cs.sub = bk.sub),
        |enc AS (SELECT id, sub, code FROM enc_ranked WHERE r = 1),
        |probes AS (
        |  SELECT id AS query_id, cell FROM cellasg
        |  WHERE r <= 2 AND id % 10 = 0 AND id < 1000),
        |qtab AS (
        |  SELECT q.id AS query_id, s.sub, bk.code,
        |         round(list_sum(list_transform(list_zip(
        |           list_slice(q.v, CAST(s.sub * (len(q.v) // 4) + 1 AS INT),
        |                      CAST((s.sub + 1) * (len(q.v) // 4) AS INT)), bk.cv),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS pd
        |  FROM base q CROSS JOIN subs s JOIN books bk ON s.sub = bk.sub
        |  WHERE q.id % 10 = 0 AND q.id < 1000),
        |dists AS (
        |  SELECT qt.query_id, e.id AS neighbor_id, a.cell, round(CAST(sum(CAST(round(qt.pd * 1e9, 0) AS BIGINT)) AS DOUBLE)
         |               / 1e9, 6) AS d2
        |  FROM enc e JOIN asg a ON e.id = a.id
        |  JOIN probes p ON a.cell = p.cell
        |  JOIN qtab qt ON e.sub = qt.sub AND e.code = qt.code
        |    AND qt.query_id = p.query_id
        |  WHERE qt.query_id <> e.id
        |  GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT query_id, neighbor_id, d2, cell,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY d2, neighbor_id) AS rank
        |  FROM dists)
        |SELECT query_id, rank, neighbor_id, d2, cell
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // HUGEINT micro-sums per (label, dim); the 1/n of each centroid
    // cancels in cosine, so the replay is exact integers end to end
    "q_centroid_sim" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |x AS (
        |  SELECT label, i.i - 1 AS pos,
        |         CAST(round(v[i.i] * 1e6, 0) AS BIGINT) AS nv
        |  FROM e CROSS JOIN
        |       (SELECT unnest(generate_series(1, 64)) AS i) i),
        |s AS (
        |  SELECT label, pos, CAST(sum(nv) AS HUGEINT) AS s
        |  FROM x GROUP BY 1, 2),
        |nn AS (SELECT label, sum(s*s) AS nn FROM s GROUP BY 1),
        |d AS (
        |  SELECT a.label AS label_a, b.label AS label_b,
        |         sum(a.s * b.s) AS dot
        |  FROM s a JOIN s b ON a.pos = b.pos AND a.label < b.label
        |  GROUP BY 1, 2)
        |SELECT d.label_a, d.label_b,
        |       round(CAST(dot AS DOUBLE)
        |             / (sqrt(CAST(na.nn AS DOUBLE))
        |                * sqrt(CAST(nb.nn AS DOUBLE))), 6) AS cos
        |FROM d JOIN nn na ON na.label = d.label_a
        |       JOIN nn nb ON nb.label = d.label_b
        |ORDER BY 1, 2""".stripMargin,

    // Replays PcaOps.project from the pca_model fixture: per-(dim,
    // component) nano-unit integer terms, summed, /1e9, rounded at 6 —
    // the same HALF_UP-on-doubles rounding both engines share.
    "q_pca_project" ->
      s"""WITH mdl AS (SELECT * FROM read_parquet('${sqlPath("pca_model")}')),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |xi AS (
         |  SELECT vec_id, CAST(unnest(generate_series(1, len(v))) AS INT) AS j, v
         |  FROM e),
         |x AS (SELECT vec_id, j, v[j] AS x FROM xi),
         |terms AS (
         |  SELECT x.vec_id, m.k,
         |         CAST(round((x.x - m.m) * m.p * 1e9) AS BIGINT) AS t
         |  FROM x JOIN mdl m ON x.j = m.j),
         |p AS (
         |  SELECT vec_id, k, round(CAST(sum(t) AS DOUBLE) / 1e9, 6) AS pc
         |  FROM terms GROUP BY 1, 2)
         |SELECT vec_id,
         |       max(CASE WHEN k = 1 THEN pc END) AS pc1,
         |       max(CASE WHEN k = 2 THEN pc END) AS pc2,
         |       max(CASE WHEN k = 3 THEN pc END) AS pc3,
         |       max(CASE WHEN k = 4 THEN pc END) AS pc4
         |FROM p GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_proto_prune" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT cell, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("proto_centroids")}')),
         |asg AS (
         |  SELECT b.id, c.cell, list_cosine_similarity(b.v, c.cv) AS sim,
         |         row_number() OVER (PARTITION BY b.id
         |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
         |  FROM base b CROSS JOIN cent c),
         |m AS (SELECT id, cell, round(1.0 - sim, 6) AS dist FROM asg WHERE r = 1),
         |rk AS (
         |  SELECT cell, id, dist,
         |         row_number() OVER (PARTITION BY cell
         |                            ORDER BY dist DESC, id) AS rank
         |  FROM m)
         |SELECT cell, CAST(rank AS INT) AS rank, id AS vec_id, dist
         |FROM rk WHERE rank <= 24 ORDER BY cell, rank""".stripMargin,

    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id % 10 = 0 AND vec_id < 1000),
        |e AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS v
        |      FROM embeddings),
        |pairs AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_cosine_similarity(qv, v), 6) AS cos
        |  FROM q, e WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // the q_cosine_topk ranking replayed twice — full vectors and the
    // 16-dim prefix slice — then per-query overlap of the two rank sets
    "q_embed_trunc_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qv FROM e
        |      WHERE vec_id % 10 = 0 AND vec_id < 1000),
        |fullr AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC,
        |                      e.vec_id) AS rank
        |    FROM q, e WHERE q.query_id <> e.vec_id)
        |  WHERE rank <= 5),
        |truncr AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.query_id, e.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY round(list_cosine_similarity(
        |                        q.qv[1:16], e.v[1:16]), 6) DESC,
        |                      e.vec_id) AS rank
        |    FROM q, e WHERE q.query_id <> e.vec_id)
        |  WHERE rank <= 5),
        |hits AS (
        |  SELECT f.query_id, count(*) AS n_hit
        |  FROM fullr f JOIN truncr t
        |    ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
        |  GROUP BY 1)
        |SELECT q.query_id,
        |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / 5, 6)
        |         AS recall_at_5
        |FROM q LEFT JOIN hits h ON q.query_id = h.query_id
        |ORDER BY 1""".stripMargin,

    "q_knn_join" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |         round(list_cosine_similarity(a.v, b.v), 6) AS cos
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_knn_join_ivf" ->
      """WITH base AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cent AS (
        |  SELECT id AS cell, v AS cv FROM base ORDER BY id LIMIT 16),
        |probed AS (
        |  SELECT b.id, b.v, c.cell,
        |         row_number() OVER (PARTITION BY b.id
        |           ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC,
        |                    c.cell) AS r
        |  FROM base b CROSS JOIN cent c),
        |corpus AS (SELECT id AS neighbor_id, v, cell FROM probed WHERE r = 1),
        |qs AS (SELECT id AS query_id, v AS qv, cell FROM probed WHERE r <= 2),
        |pairs AS (
        |  SELECT q.query_id, c.neighbor_id,
        |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos, c.cell
        |  FROM qs q JOIN corpus c
        |    ON q.cell = c.cell AND q.query_id <> c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos, cell,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cos DESC, neighbor_id) AS rank
        |  FROM pairs)
        |SELECT query_id, rank, neighbor_id, cos, cell
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,

    "q_cosine_pairs_lsh" ->
      s"""WITH sig AS (SELECT * FROM read_parquet('${sqlPath("lshpair_sigs")}')),
         |banded AS (
         |  SELECT id, unnest(range(0, $PairBands)) AS band, bands FROM sig),
         |bb AS (
         |  SELECT id, band, bands[CAST(band AS INT) + 1] AS bucket FROM banded),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
         |v AS (SELECT id, CAST(v AS DOUBLE[]) AS vv FROM sig)
         |SELECT id_a, id_b,
         |       round(list_cosine_similarity(va.vv, vb.vv), 6) AS cos
         |FROM cand JOIN v va ON id_a = va.id JOIN v vb ON id_b = vb.id
         |WHERE round(list_cosine_similarity(va.vv, vb.vv), 6) >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH sig AS (
         |  SELECT id, CAST(v AS DOUBLE[]) AS v, bucket
         |  FROM read_parquet('${sqlPath("annlsh_sigs")}')),
         |q AS (
         |  SELECT id AS query_id, v AS qv,
         |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
         |                 xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)]) AS bucket
         |  FROM sig WHERE id % 10 = 0),
         |pairs AS (
         |  SELECT q.query_id, c.id AS neighbor_id,
         |         round(list_cosine_similarity(q.qv, c.v), 6) AS cos, c.bucket
         |  FROM q JOIN sig c ON q.bucket = c.bucket AND q.query_id <> c.id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos, bucket,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM pairs)
         |SELECT query_id, rank, neighbor_id, cos, bucket
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivf_trained" -> annIvfTrainedOracle(nProbe = 2),

    // identical replay at the production operating point — only the
    // probe depth differs (r13 verdict #5)
    "q_ann_ivf_prod" -> annIvfTrainedOracle(nProbe = 10),

    "q_ann_ivf" -> AnnIvfOracle,

    // the persisted-index roundtrip must reproduce q_ann_ivf bit-for-bit
    // (same deterministic quantizer, same parameters — what changed is
    // only WHERE the inverted lists live), so the oracle is shared
    "q_ann_ivf_index" -> AnnIvfOracle,

    // identical per-term arithmetic: double product, micro-round, integer
    // sum (order-free) — the join explodes d² per row, which is fine for
    // an oracle but is exactly the amplification the one-buffer aggregate
    // exists to avoid
    "q_embed_gram" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |xi AS (
        |  SELECT vec_id, unnest(generate_series(1, len(v))) AS i, v FROM e),
        |x AS (SELECT vec_id, CAST(i AS INT) AS i, v[CAST(i AS INT)] AS x FROM xi),
        |tot AS (SELECT count(*) AS n FROM e)
        |SELECT a.i, b.i AS j,
        |       CAST(sum(CAST(round(a.x * b.x * 1e6) AS BIGINT)) AS BIGINT)
        |         AS s_micro, n
        |FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
        |CROSS JOIN tot
        |GROUP BY a.i, b.i, n
        |ORDER BY a.i, j""".stripMargin,

    "q_embed_quant" ->
      """WITH b AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |s AS (
        |  SELECT vec_id, v,
        |         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM b),
        |q AS (
        |  SELECT vec_id, v, scale,
        |         CASE WHEN scale > 0
        |              THEN list_transform(v, x -> CAST(greatest(-127,
        |                     least(127, floor(x/scale + 0.5))) AS INT))
        |              ELSE list_transform(v, x -> 0) END AS qv
        |  FROM s)
        |SELECT vec_id, round(scale, 6) AS scale,
        |       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS l1_q,
        |       round(list_max(list_transform(list_zip(qv, v),
        |             p -> abs(CAST(p[1] AS DOUBLE) * scale - p[2]))), 6) AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_dedup_embed" ->
      """WITH RECURSIVE prs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.4),
        |bidir AS (
        |  SELECT id_a AS src, id_b AS dst FROM prs
        |  UNION ALL SELECT id_b, id_a FROM prs),
        |reach AS (
        |  SELECT src, dst FROM bidir
        |  UNION
        |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
        |  WHERE r.src <> b.dst),
        |members AS (
        |  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
        |  FROM reach GROUP BY src)
        |SELECT e.vec_id,
        |       coalesce(m.cluster_id, e.vec_id) AS cluster_id,
        |       CAST(coalesce(m.cluster_id, e.vec_id) = e.vec_id AS INT) AS keep
        |FROM embeddings e LEFT JOIN members m ON e.vec_id = m.vec_id
        |ORDER BY e.vec_id""".stripMargin,

    "q_semdedup" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT cell, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("semdedup_centroids")}')),
         |asg AS (
         |  SELECT b.id, b.v, c.cell,
         |         row_number() OVER (PARTITION BY b.id
         |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
         |  FROM base b CROSS JOIN cent c),
         |m AS (SELECT id, v, cell FROM asg WHERE r = 1),
         |prs AS (
         |  SELECT a.id AS id_a, b.id AS id_b
         |  FROM m a JOIN m b ON a.cell = b.cell AND a.id < b.id
         |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
         |bidir AS (
         |  SELECT id_a AS src, id_b AS dst FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |reach AS (
         |  SELECT src, dst FROM bidir
         |  UNION
         |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
         |  WHERE r.src <> b.dst),
         |members AS (
         |  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT m.id AS vec_id, m.cell,
         |       coalesce(mb.cluster_id, m.id) AS cluster_id,
         |       CAST(coalesce(mb.cluster_id, m.id) = m.id AS INT) AS keep
         |FROM m LEFT JOIN members mb ON m.id = mb.vec_id
         |ORDER BY vec_id""".stripMargin,

    "q_ann_pq" ->
      """WITH base AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |subs AS (SELECT unnest(range(0, 4)) AS sub),
        |books AS (
        |  SELECT s.sub, b.id AS code,
        |         list_slice(b.v, CAST(s.sub * (len(b.v) // 4) + 1 AS INT),
        |                    CAST((s.sub + 1) * (len(b.v) // 4) AS INT)) AS cv
        |  FROM (SELECT id, v FROM base ORDER BY id LIMIT 16) b CROSS JOIN subs s),
        |corpus_subs AS (
        |  SELECT b.id, s.sub,
        |         list_slice(b.v, CAST(s.sub * (len(b.v) // 4) + 1 AS INT),
        |                    CAST((s.sub + 1) * (len(b.v) // 4) AS INT)) AS sv
        |  FROM base b CROSS JOIN subs s),
        |enc_ranked AS (
        |  SELECT cs.id, cs.sub, bk.code,
        |         row_number() OVER (PARTITION BY cs.id, cs.sub
        |           ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cv),
        |                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), bk.code) AS r
        |  FROM corpus_subs cs JOIN books bk ON cs.sub = bk.sub),
        |enc AS (SELECT id, sub, code FROM enc_ranked WHERE r = 1),
        |qtab AS (
        |  SELECT q.id AS query_id, s.sub, bk.code,
        |         round(list_sum(list_transform(list_zip(
        |           list_slice(q.v, CAST(s.sub * (len(q.v) // 4) + 1 AS INT),
        |                      CAST((s.sub + 1) * (len(q.v) // 4) AS INT)), bk.cv),
        |           p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS pd
        |  FROM base q CROSS JOIN subs s JOIN books bk ON s.sub = bk.sub
        |  WHERE q.id % 10 = 0 AND q.id < 1000),
        |dists AS (
        |  SELECT qt.query_id, e.id AS neighbor_id, round(CAST(sum(CAST(round(qt.pd * 1e9, 0) AS BIGINT)) AS DOUBLE)
         |               / 1e9, 6) AS d2
        |  FROM enc e JOIN qtab qt ON e.sub = qt.sub AND e.code = qt.code
        |  WHERE qt.query_id <> e.id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, neighbor_id, d2,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY d2, neighbor_id) AS rank
        |  FROM dists)
        |SELECT query_id, rank, neighbor_id, d2
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_ann_pq_trained" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |subs AS (SELECT unnest(range(0, 4)) AS sub),
         |books AS (
         |  SELECT sub, code, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("pq_codebooks")}')),
         |corpus_subs AS (
         |  SELECT b.id, s.sub,
         |         list_slice(b.v, CAST(s.sub * (len(b.v) // 4) + 1 AS INT),
         |                    CAST((s.sub + 1) * (len(b.v) // 4) AS INT)) AS sv
         |  FROM base b CROSS JOIN subs s),
         |enc_ranked AS (
         |  SELECT cs.id, cs.sub, bk.code,
         |         row_number() OVER (PARTITION BY cs.id, cs.sub
         |           ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cv),
         |                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), bk.code) AS r
         |  FROM corpus_subs cs JOIN books bk ON cs.sub = bk.sub),
         |enc AS (SELECT id, sub, code FROM enc_ranked WHERE r = 1),
         |qtab AS (
         |  SELECT q.id AS query_id, s.sub, bk.code,
         |         round(list_sum(list_transform(list_zip(
         |           list_slice(q.v, CAST(s.sub * (len(q.v) // 4) + 1 AS INT),
         |                      CAST((s.sub + 1) * (len(q.v) // 4) AS INT)), bk.cv),
         |           p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS pd
         |  FROM base q CROSS JOIN subs s JOIN books bk ON s.sub = bk.sub
         |  WHERE q.id % 10 = 0 AND q.id < 1000),
         |dists AS (
         |  SELECT qt.query_id, e.id AS neighbor_id, round(CAST(sum(CAST(round(qt.pd * 1e9, 0) AS BIGINT)) AS DOUBLE)
         |               / 1e9, 6) AS d2
         |  FROM enc e JOIN qtab qt ON e.sub = qt.sub AND e.code = qt.code
         |  WHERE qt.query_id <> e.id
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT query_id, neighbor_id, d2,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY d2, neighbor_id) AS rank
         |  FROM dists)
         |SELECT query_id, rank, neighbor_id, d2
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivfpq" -> AnnIvfPqOracle,

    // the persisted IVF-PQ index roundtrip shares the oracle: same
    // deterministic quantizers, same ADC arithmetic — only the storage
    // layout (cell-partitioned code parquet) differs
    "q_ann_ivfpq_index" -> AnnIvfPqOracle,

    // streamed-ingest index: per-row assignment + exactly-once append ⇒
    // identical postings to the batch build, same oracle again
    "q_ann_ivf_stream" -> AnnIvfOracle,

    "q_ann_ivfpq_res" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT id AS cell, v AS cv FROM base ORDER BY id LIMIT 16),
         |cellasg AS (
         |  SELECT b.id, c.cell,
         |         row_number() OVER (PARTITION BY b.id
         |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
         |  FROM base b CROSS JOIN cent c),
         |asg AS (SELECT id, cell FROM cellasg WHERE r = 1),
         |resid AS (
         |  SELECT b.id, a.cell,
         |         list_transform(list_zip(b.v, c.cv), p -> p[1] - p[2]) AS rv
         |  FROM base b JOIN asg a ON b.id = a.id JOIN cent c ON a.cell = c.cell),
         |subs AS (SELECT unnest(range(0, 4)) AS sub),
         |books AS (
         |  SELECT sub, code, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("pqres_codebooks")}')),
         |corpus_subs AS (
         |  SELECT r.id, s.sub,
         |         list_slice(r.rv, CAST(s.sub * (len(r.rv) // 4) + 1 AS INT),
         |                    CAST((s.sub + 1) * (len(r.rv) // 4) AS INT)) AS sv
         |  FROM resid r CROSS JOIN subs s),
         |enc_ranked AS (
         |  SELECT cs.id, cs.sub, bk.code,
         |         row_number() OVER (PARTITION BY cs.id, cs.sub
         |           ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cv),
         |                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), bk.code) AS r
         |  FROM corpus_subs cs JOIN books bk ON cs.sub = bk.sub),
         |enc AS (SELECT id, sub, code FROM enc_ranked WHERE r = 1),
         |probes AS (
         |  SELECT id AS query_id, cell FROM cellasg
         |  WHERE r <= 2 AND id % 10 = 0 AND id < 1000),
         |qres AS (
         |  SELECT p.query_id, p.cell,
         |         list_transform(list_zip(b.v, c.cv), x -> x[1] - x[2]) AS qrv
         |  FROM probes p JOIN base b ON p.query_id = b.id
         |  JOIN cent c ON p.cell = c.cell),
         |qtab AS (
         |  SELECT q.query_id, q.cell, s.sub, bk.code,
         |         round(list_sum(list_transform(list_zip(
         |           list_slice(q.qrv, CAST(s.sub * (len(q.qrv) // 4) + 1 AS INT),
         |                      CAST((s.sub + 1) * (len(q.qrv) // 4) AS INT)), bk.cv),
         |           p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS pd
         |  FROM qres q CROSS JOIN subs s JOIN books bk ON s.sub = bk.sub),
         |dists AS (
         |  SELECT qt.query_id, e.id AS neighbor_id, a.cell, round(CAST(sum(CAST(round(qt.pd * 1e9, 0) AS BIGINT)) AS DOUBLE)
         |               / 1e9, 6) AS d2
         |  FROM enc e JOIN asg a ON e.id = a.id
         |  JOIN qtab qt ON a.cell = qt.cell AND e.sub = qt.sub AND e.code = qt.code
         |  WHERE qt.query_id <> e.id
         |  GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT query_id, neighbor_id, d2, cell,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY d2, neighbor_id) AS rank
         |  FROM dists)
         |SELECT query_id, rank, neighbor_id, d2, cell
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |g AS (SELECT doc_id, source FROM documents),
         |a AS (SELECT vec_id AS anchor_id, v AS qv, source AS qg
         |      FROM e JOIN g ON vec_id = doc_id
         |      WHERE vec_id % $AnchorSelector = 0
         |        AND vec_id < ${AnchorSelector.toLong * MaxAnchors}),
         |c AS (SELECT vec_id AS neg_id, v, source AS ng
         |      FROM e JOIN g ON vec_id = doc_id),
         |s AS (SELECT anchor_id, neg_id,
         |        round(list_cosine_similarity(qv, v), 6) AS cos
         |      FROM a JOIN c ON qg <> ng),
         |r AS (SELECT anchor_id, neg_id, cos,
         |        row_number() OVER (PARTITION BY anchor_id
         |                           ORDER BY cos DESC, neg_id) AS rank
         |      FROM s)
         |SELECT anchor_id, CAST(rank AS INT) AS rank, neg_id, cos
         |FROM r WHERE rank <= $NegK ORDER BY anchor_id, rank""".stripMargin,

    // identical chain to q_ann_ivfpq_res with ONE substitution: cent reads
    // the trained-centroid fixture instead of deriving lowest-id cells
    "q_ann_ivfpq_tc" ->
      s"""WITH base AS (
         |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (
         |  SELECT cell, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("pqtc_centroids")}')),
         |cellasg AS (
         |  SELECT b.id, c.cell,
         |         row_number() OVER (PARTITION BY b.id
         |           ORDER BY list_cosine_similarity(b.v, c.cv) DESC, c.cell) AS r
         |  FROM base b CROSS JOIN cent c),
         |asg AS (SELECT id, cell FROM cellasg WHERE r = 1),
         |resid AS (
         |  SELECT b.id, a.cell,
         |         list_transform(list_zip(b.v, c.cv), p -> p[1] - p[2]) AS rv
         |  FROM base b JOIN asg a ON b.id = a.id JOIN cent c ON a.cell = c.cell),
         |subs AS (SELECT unnest(range(0, 4)) AS sub),
         |books AS (
         |  SELECT sub, code, CAST(cv AS DOUBLE[]) AS cv
         |  FROM read_parquet('${sqlPath("pqtc_codebooks")}')),
         |corpus_subs AS (
         |  SELECT r.id, s.sub,
         |         list_slice(r.rv, CAST(s.sub * (len(r.rv) // 4) + 1 AS INT),
         |                    CAST((s.sub + 1) * (len(r.rv) // 4) AS INT)) AS sv
         |  FROM resid r CROSS JOIN subs s),
         |enc_ranked AS (
         |  SELECT cs.id, cs.sub, bk.code,
         |         row_number() OVER (PARTITION BY cs.id, cs.sub
         |           ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cv),
         |                     p -> (p[1] - p[2]) * (p[1] - p[2]))), 6), bk.code) AS r
         |  FROM corpus_subs cs JOIN books bk ON cs.sub = bk.sub),
         |enc AS (SELECT id, sub, code FROM enc_ranked WHERE r = 1),
         |probes AS (
         |  SELECT id AS query_id, cell FROM cellasg
         |  WHERE r <= 2 AND id % 10 = 0 AND id < 1000),
         |qres AS (
         |  SELECT p.query_id, p.cell,
         |         list_transform(list_zip(b.v, c.cv), x -> x[1] - x[2]) AS qrv
         |  FROM probes p JOIN base b ON p.query_id = b.id
         |  JOIN cent c ON p.cell = c.cell),
         |qtab AS (
         |  SELECT q.query_id, q.cell, s.sub, bk.code,
         |         round(list_sum(list_transform(list_zip(
         |           list_slice(q.qrv, CAST(s.sub * (len(q.qrv) // 4) + 1 AS INT),
         |                      CAST((s.sub + 1) * (len(q.qrv) // 4) AS INT)), bk.cv),
         |           p -> (p[1] - p[2]) * (p[1] - p[2]))), 9) AS pd
         |  FROM qres q CROSS JOIN subs s JOIN books bk ON s.sub = bk.sub),
         |dists AS (
         |  SELECT qt.query_id, e.id AS neighbor_id, a.cell, round(CAST(sum(CAST(round(qt.pd * 1e9, 0) AS BIGINT)) AS DOUBLE)
         |               / 1e9, 6) AS d2
         |  FROM enc e JOIN asg a ON e.id = a.id
         |  JOIN qtab qt ON a.cell = qt.cell AND e.sub = qt.sub AND e.code = qt.code
         |  WHERE qt.query_id <> e.id
         |  GROUP BY 1, 2, 3),
         |ranked AS (
         |  SELECT query_id, neighbor_id, d2, cell,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY d2, neighbor_id) AS rank
         |  FROM dists)
         |SELECT query_id, rank, neighbor_id, d2, cell
         |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_dedup_embed_lsh" ->
      s"""WITH RECURSIVE sig AS (SELECT * FROM read_parquet('${sqlPath("embdedup_sigs")}')),
         |banded AS (
         |  SELECT id, unnest(range(0, $PairBands)) AS band, bands FROM sig),
         |bb AS (
         |  SELECT id, band, bands[CAST(band AS INT) + 1] AS bucket FROM banded),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
         |v AS (SELECT id, CAST(v AS DOUBLE[]) AS vv FROM sig),
         |prs AS (
         |  SELECT id_a, id_b
         |  FROM cand JOIN v va ON id_a = va.id JOIN v vb ON id_b = vb.id
         |  WHERE round(list_cosine_similarity(va.vv, vb.vv), 6) >= 0.4),
         |bidir AS (
         |  SELECT id_a AS src, id_b AS dst FROM prs
         |  UNION ALL SELECT id_b, id_a FROM prs),
         |reach AS (
         |  SELECT src, dst FROM bidir
         |  UNION
         |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
         |  WHERE r.src <> b.dst),
         |members AS (
         |  SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src)
         |SELECT s.id AS vec_id,
         |       coalesce(m.cluster_id, s.id) AS cluster_id,
         |       CAST(coalesce(m.cluster_id, s.id) = s.id AS INT) AS keep
         |FROM sig s LEFT JOIN members m ON s.id = m.vec_id
         |ORDER BY vec_id""".stripMargin,
  )
}
