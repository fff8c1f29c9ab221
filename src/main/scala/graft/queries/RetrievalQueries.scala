package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables
import graft.text.RetrievalOps
import graft.sim.SimilarityOps

/** Lexical + hybrid retrieval query surface (north-star extensions; the
  * reference has no text retrieval — see RetrievalOps scaladoc).
  *
  * Both queries are fully SQL-replayable — no hash seam. The only
  * cross-engine hazards are float summation order and math-library ulps,
  * and both are closed the same way as the PCA oracle: per-term / per-rank
  * contributions ride as exact nano-unit integers through the sums, and
  * every emitted double is a round-6 decode of an exact integer.
  */
object RetrievalQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)
  private def emb(s: SparkSession, dir: String): DataFrame = Tables.embeddings(s, dir)

  /** Fixed ad-hoc query set for q_bm25_topk, shared verbatim with the
    * oracle's VALUES list (terms drawn from the synthetic corpus's
    * working vocabulary so every query matches documents). */
  private[graft] val Bm25Queries: Seq[(Int, String)] = Seq(
    1 -> "vector", 1 -> "hash", 1 -> "filter",
    2 -> "stream", 2 -> "window", 2 -> "batch",
    3 -> "slow", 3 -> "merge", 3 -> "sort",
    4 -> "spark", 4 -> "table", 4 -> "scan",
    5 -> "customer", 5 -> "order", 5 -> "part",
    6 -> "fast", 6 -> "key", 6 -> "value")

  private val Bm25K = 10
  /** RM3 feedback depth (docs) and expansion width (terms), λ = 0.5. */
  private val Rm3M = 10
  private val Rm3E = 8
  private val Rm3Lambda = 0.5
  /** Hybrid anchors: every `AnchorStep`-th doc/vec id below `AnchorMax`
    * (8 anchors; present at every SF). Convention: embeddings row
    * `vec_id = i` is documents row `doc_id = i`'s embedding — ids beyond
    * the embeddings table compete on lexical evidence only, which RRF
    * handles by construction (missing-list entries contribute nothing). */
  private val AnchorStep = 50L
  private val AnchorMax = 400L
  private val HybridPoolK = 50 // per-system candidate list depth
  private val HybridK = 10
  private val RrfC = 60

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-10 per query: map-only tokenize pass, broadcast query-term
    // filter BEFORE the postings aggregate, 1-row broadcast corpus stats,
    // bounded-heap rank. See RetrievalOps.bm25Scores for the scale shape.
    "q_bm25_topk" -> ((s, dir) => {
      import s.implicits._
      val q = Bm25Queries.toDF("query_id", "term")
      RetrievalOps.bm25TopK(docs(s, dir), "doc_id", "text", q, Bm25K)
        .orderBy("query_id", "rank")
    }),

    // BM25 off a PERSISTED term-bucketed inverted index (the IVF-index
    // pattern applied to text: build once, probe = partition pruning on
    // the query terms' hash buckets, query cost ∝ matched posting
    // lists, never the corpus). Indexed scores are bit-identical to the
    // scan path — q_bm25_topk's oracle applies verbatim. Index rebuilt
    // per run (the q_time_travel pass-idempotence convention).
    "q_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      val sfName = new java.io.File(dir.replaceAll("/+$", "")).getName
      val idx = s"/tmp/graft_index/$sfName/bm25"
      graft.text.InvertedIndex.build(docs(s, dir), "doc_id", "text", idx)
      val q = Bm25Queries.toDF("query_id", "term")
      graft.text.InvertedIndex.bm25TopKIndexed(s, idx, q, Bm25K)
        .orderBy("query_id", "rank")
    }),

    // Inverted-index layout audit (the q_skew_diag question asked of
    // the q_bm25_indexed bucket layout: do 64 term-hash buckets balance
    // the posting mass, or does one hot bucket own the reads?): per
    // bucket, term and posting counts; plus the summary skew ratio
    // max/mean — >2 would argue for more buckets or a hot-term side
    // list. Pure rollup of the same (term → bucket) projection the
    // index writes, so the audit needs no index on disk.
    "q_index_balance" -> ((s, dir) => {
      // fixture seam at the bucketed postings (xxhash64 has no DuckDB
      // replay): the oracle rolls up exactly the frame the index writes
      val posts = OracleFixtures.seam(docs(s, dir)
        .select(col("doc_id"),
          explode(graft.text.TextOps.wsTokens(lower(col("text")))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .withColumn("bucket",
          pmod(xxhash64(col("term")), lit(64L)).cast("int")),
        dir, "index_balance_posts")
      val per = posts.groupBy(col("bucket"))
        .agg(countDistinct(col("term")).as("n_terms"),
          count(lit(1)).as("n_postings"))
        .localCheckpoint(true) // ≤64 rows; the summary re-derives
      val tot = per.agg(sum(col("n_postings")).as("np"),
        count(lit(1)).as("nb"), max(col("n_postings")).as("mx"))
      per.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n_terms"), col("n_postings"),
          round(col("mx").cast("double") * col("nb") /
            col("np").cast("double"), 6).as("skew_ratio"))
        .orderBy("bucket")
    }),

    // STREAMED inverted-index ingest: documents arrive as a stream,
    // each micro-batch appends its posting lists + an exact-integer
    // stats increment (replay-idempotent), and the standard query set
    // runs off the streamed index — streamed ≡ built ≡ scan, so the
    // same oracle applies. The text mirror of q_ann_ivf_stream.
    "q_bm25_index_stream" -> ((s, dir) => {
      import s.implicits._
      val q = Bm25Queries.toDF("query_id", "term")
      graft.streaming.StreamingOps
        .runStreamTextIndexOnce(s, dir, q, Bm25K)
        .orderBy("query_id", "rank")
    }),

    // RM3 pseudo-relevance-feedback expansion terms (Lavrenko & Croft
    // 2001 / Abdul-Jaleel 2004): first-pass BM25 top-m as pseudo-
    // relevant, interpolated relevance model, top-e weighted terms.
    "q_rm3_terms" -> ((s, dir) => {
      import s.implicits._
      val q = Bm25Queries.toDF("query_id", "term")
      RetrievalOps.rm3ExpandTerms(docs(s, dir), "doc_id", "text", q,
          m = Rm3M, e = Rm3E, lambda = Rm3Lambda)
        .orderBy("query_id", "rank")
    }),

    // RM3 second pass: weighted BM25 over the expanded query terms. The
    // corpus is tokenized ONCE (RetrievalOps.tokenize) and the
    // materialized frame feeds expansion (first pass + feedback) and the
    // weighted second pass — formerly five tokenizer passes per run.
    "q_rm3_topk" -> ((s, dir) => {
      import s.implicits._
      val tok = RetrievalOps.tokenize(docs(s, dir), "doc_id", "text")
      val q = Bm25Queries.toDF("query_id", "term")
      val exp = RetrievalOps.rm3ExpandTermsTok(tok, q,
          m = Rm3M, e = Rm3E, lambda = Rm3Lambda)
        .select("query_id", "term", "w")
      RetrievalOps.bm25TopKTok(tok, exp, Bm25K)
        .orderBy("query_id", "rank")
    }),

    // Hybrid retrieval: reciprocal-rank fusion of a LEXICAL rank list
    // (BM25 query-by-document: the anchor doc's distinct tokens as the
    // query) and a SEMANTIC rank list (exact cosine top-k from the
    // anchor's embedding), both depth-50, fused at c=60, top-10 kept.
    // Self-matches are excluded on both sides.
    "q_hybrid_rrf" -> ((s, dir) => {
      val d = docs(s, dir)
      val anchorTerms = d
        .filter(col("doc_id") % AnchorStep === 0 && col("doc_id") < AnchorMax)
        .select(col("doc_id").as("query_id"),
          explode(graft.text.TextOps.wsTokens(lower(col("text")))).as("term"))
        .distinct()
      val lex = RetrievalOps.bm25TopK(d, "doc_id", "text", anchorTerms,
          HybridPoolK, excludeSelf = true)
        .select("query_id", "rank", "doc_id")
      val vec = SimilarityOps.bruteForceTopK(emb(s, dir), "vec_id", "embedding",
          querySelector = AnchorStep, k = HybridPoolK,
          maxQueries = AnchorMax / AnchorStep)
        .select(col("query_id"), col("rank"), col("neighbor_id").as("doc_id"))
      RetrievalOps.rrfFuse(Seq(lex, vec), c = RrfC, k = HybridK)
        .orderBy("query_id", "rank")
    }))

  /** The BM25 scoring pipeline as SQL, parameterized by the query-term
    * CTE body (must yield `(query_id BIGINT, term, w DOUBLE)` — pass
    * `1.0 AS w` for unweighted queries; the engine multiplies a constant
    * 1.0 there too, so the doubles stay bit-identical); mirrors
    * RetrievalOps.bm25Scores expression-for-expression (same association
    * order, same `(1.2 + 1.0)` spelled as a sum so both engines round
    * the double identically, nano-unit contribution sums). `sfx` gives
    * every CTE a distinct name so two passes can coexist in one query. */
  private def bm25Sql(queryCte: String, excludeSelf: Boolean,
                      sfx: String = ""): String = {
    val selfFilter = if (excludeSelf) "WHERE query_id <> doc_id" else ""
    s"""q$sfx AS ($queryCte),
       |toks$sfx AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
       |  FROM documents),
       |dlen$sfx AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(lower(text), '\\S+')) AS DOUBLE) AS dl
       |  FROM documents),
       |stats$sfx AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dlen$sfx),
       |tf$sfx AS (
       |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks$sfx WHERE term IN (SELECT DISTINCT term FROM q$sfx)
       |  GROUP BY 1, 2),
       |dfreq$sfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf$sfx GROUP BY 1),
       |contrib$sfx AS (
       |  SELECT q.query_id, t.doc_id,
       |         CAST(round(
       |           q.w * ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
       |             * t.tf * (1.2 + 1.0)
       |             / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
       |           * 1e9) AS BIGINT) AS cn
       |  FROM tf$sfx t
       |  JOIN dfreq$sfx f USING (term)
       |  JOIN q$sfx q USING (term)
       |  JOIN dlen$sfx l USING (doc_id)
       |  CROSS JOIN stats$sfx s),
       |bm25$sfx AS (
       |  SELECT query_id, doc_id,
       |         round(CAST(sum(cn) AS DOUBLE) / 1e9, 6) AS score
       |  FROM contrib$sfx GROUP BY 1, 2),
       |lexrank$sfx AS (
       |  SELECT query_id, doc_id, score,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY score DESC, doc_id) AS rank
       |  FROM bm25$sfx $selfFilter)""".stripMargin
  }

  /** The fixed query set as a weighted SQL CTE body (w = 1.0). */
  private def bm25QueryCte: String = {
    val values = Bm25Queries.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"SELECT CAST(query_id AS BIGINT) AS query_id, term, 1.0 AS w " +
      s"FROM (VALUES $values) v(query_id, term)"
  }

  /** RM3 feedback chain (first-pass `lexrank` → `erank`), mirroring
    * RetrievalOps.rm3ExpandTerms expression-for-expression: exact
    * micro-unit doc-weight sums, nano-unit relevance-model sums,
    * `(1.0 - 0.5)` spelled as the engine computes λ terms. */
  private def rm3Cte: String =
    s"""fb AS (
       |  SELECT query_id, doc_id, CAST(round(score * 1e6) AS BIGINT) AS sm
       |  FROM lexrank WHERE rank <= $Rm3M AND round(score * 1e6) > 0),
       |tot AS (SELECT query_id, sum(sm) AS tot FROM fb GROUP BY 1),
       |fbw AS (
       |  SELECT f.query_id, f.doc_id,
       |         CAST(f.sm AS DOUBLE) / CAST(t.tot AS DOUBLE) AS sprime
       |  FROM fb f JOIN tot t USING (query_id)),
       |ftf AS (
       |  SELECT w.query_id, k.doc_id, k.term, w.sprime,
       |         CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks k JOIN fbw w USING (doc_id)
       |  GROUP BY 1, 2, 3, 4),
       |rmc AS (
       |  SELECT f.query_id, f.term,
       |         CAST(round(f.sprime * (f.tf / l.dl) * 1e9) AS BIGINT) AS rmn
       |  FROM ftf f JOIN dlen l USING (doc_id)),
       |rmodel AS (
       |  SELECT query_id, term, CAST(sum(rmn) AS DOUBLE) / 1e9 AS rm
       |  FROM rmc GROUP BY 1, 2),
       |orig AS (SELECT DISTINCT query_id, term FROM q),
       |nqn AS (SELECT query_id, CAST(count(*) AS DOUBLE) AS nq FROM orig GROUP BY 1),
       |origw AS (
       |  SELECT o.query_id, o.term, $Rm3Lambda / n.nq AS po
       |  FROM orig o JOIN nqn n USING (query_id)),
       |pw AS (
       |  SELECT coalesce(r.query_id, o.query_id) AS query_id,
       |         coalesce(r.term, o.term) AS term,
       |         round(coalesce(o.po, 0.0)
       |               + (1.0 - $Rm3Lambda) * coalesce(r.rm, 0.0), 6) AS w
       |  FROM rmodel r FULL OUTER JOIN origw o
       |    ON r.query_id = o.query_id AND r.term = o.term),
       |erank AS (
       |  SELECT query_id, term, w,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY w DESC, term) AS rank
       |  FROM pw)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_bm25_topk" -> {
      val values = Bm25Queries
        .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""WITH ${bm25Sql(
             s"SELECT CAST(query_id AS BIGINT) AS query_id, term, 1.0 AS w " +
               s"FROM (VALUES $values) v(query_id, term)",
             excludeSelf = false)}
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         |FROM lexrank WHERE rank <= $Bm25K
         |ORDER BY query_id, rank""".stripMargin
    },

    // rollup replay over the bucketed-postings fixture (xxhash64 has no
    // DuckDB replay; the counts and the skew summary are the checkable
    // downstream, same seam discipline as the MinHash family)
    "q_index_balance" -> {
      s"""WITH p AS (SELECT * FROM read_parquet(
         |    '${OracleFixtures.sqlPath("index_balance_posts")}')),
         |per AS (
         |  SELECT bucket, count(DISTINCT term) AS n_terms,
         |         count(*) AS n_postings
         |  FROM p GROUP BY 1),
         |tot AS (
         |  SELECT CAST(sum(n_postings) AS BIGINT) AS np,
         |         count(*) AS nb,
         |         CAST(max(n_postings) AS BIGINT) AS mx
         |  FROM per)
         |SELECT per.bucket, per.n_terms, per.n_postings,
         |       round(CAST(tot.mx AS DOUBLE) * tot.nb
         |             / CAST(tot.np AS DOUBLE), 6) AS skew_ratio
         |FROM per, tot ORDER BY 1""".stripMargin
    },

    // streamed index ≡ built index ≡ scan path: the same replay, the
    // ingest batching must be invisible in the result
    "q_bm25_index_stream" -> {
      val values = Bm25Queries
        .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""WITH ${bm25Sql(
             s"SELECT CAST(query_id AS BIGINT) AS query_id, term, 1.0 AS w " +
               s"FROM (VALUES $values) v(query_id, term)",
             excludeSelf = false)}
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         |FROM lexrank WHERE rank <= $Bm25K
         |ORDER BY query_id, rank""".stripMargin
    },

    // indexed scores are bit-identical to the scan path — the same
    // replay applies; the index must be invisible in the result
    "q_bm25_indexed" -> {
      val values = Bm25Queries
        .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""WITH ${bm25Sql(
             s"SELECT CAST(query_id AS BIGINT) AS query_id, term, 1.0 AS w " +
               s"FROM (VALUES $values) v(query_id, term)",
             excludeSelf = false)}
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         |FROM lexrank WHERE rank <= $Bm25K
         |ORDER BY query_id, rank""".stripMargin
    },

    // RM3 expansion terms: first-pass lexrank → normalized doc weights →
    // relevance model → λ-interpolation → top-e pick, every float either
    // an exact integer ratio or a nano-unit sum (see RetrievalOps).
    "q_rm3_terms" -> {
      s"""WITH ${bm25Sql(bm25QueryCte, excludeSelf = false)},
         |${rm3Cte}
         |SELECT query_id, CAST(rank AS INT) AS rank, term, w
         |FROM erank WHERE rank <= $Rm3E
         |ORDER BY query_id, rank""".stripMargin
    },

    // RM3 second pass: the full weighted BM25 chain re-instantiated with
    // sfx=2 over the expansion terms the first chain produced.
    "q_rm3_topk" -> {
      s"""WITH ${bm25Sql(bm25QueryCte, excludeSelf = false)},
         |${rm3Cte},
         |${bm25Sql(
             s"SELECT query_id, term, w FROM erank WHERE rank <= $Rm3E",
             excludeSelf = false, sfx = "2")}
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, score
         |FROM lexrank2 WHERE rank <= $Bm25K
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_hybrid_rrf" -> {
      val anchors = s"doc_id % $AnchorStep = 0 AND doc_id < $AnchorMax"
      s"""WITH ${bm25Sql(
             s"SELECT DISTINCT query_id, term, 1.0 AS w FROM (" +
               s"SELECT doc_id AS query_id, " +
               "unnest(regexp_extract_all(lower(text), '\\S+')) AS term " +
               s"FROM documents WHERE $anchors)",
             excludeSelf = true)},
         |qv AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings
         |  WHERE vec_id % $AnchorStep = 0 AND vec_id < $AnchorMax),
         |ev AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v
         |       FROM embeddings),
         |vpairs AS (
         |  SELECT query_id, doc_id,
         |         round(list_cosine_similarity(qv.qv, ev.v), 6) AS cos
         |  FROM qv, ev WHERE query_id <> doc_id),
         |vecrank AS (
         |  SELECT query_id, doc_id,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY cos DESC, doc_id) AS rank
         |  FROM vpairs),
         |contribs AS (
         |  SELECT query_id, doc_id,
         |         CAST(round(1.0 / (1.0 * ($RrfC + rank)) * 1e9) AS BIGINT) AS cn
         |  FROM lexrank WHERE rank <= $HybridPoolK
         |  UNION ALL
         |  SELECT query_id, doc_id,
         |         CAST(round(1.0 / (1.0 * ($RrfC + rank)) * 1e9) AS BIGINT) AS cn
         |  FROM vecrank WHERE rank <= $HybridPoolK),
         |fused AS (
         |  SELECT query_id, doc_id,
         |         round(CAST(sum(cn) AS DOUBLE) / 1e9, 6) AS rrf
         |  FROM contribs GROUP BY 1, 2),
         |frank AS (
         |  SELECT query_id, doc_id, rrf,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY rrf DESC, doc_id) AS rank
         |  FROM fused)
         |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, rrf
         |FROM frank WHERE rank <= $HybridK
         |ORDER BY query_id, rank""".stripMargin
    })
}
