package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.text.TextOps
import OracleFixtures.{seam, sqlPath}

/** Text-analysis query surface over `documents` (north-star extensions).
  * All map-only — no shuffles; each has an exact DuckDB oracle.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** Subword-vocab size (`q_bpe_subword`) and quality-classifier feature
    * dim (`q_quality_classifier`) — shared with the oracle SQL by
    * interpolation so query and replay cannot desynchronize. */
  private val BpeVocabSize = 256
  /** BPE training depth for q_bpe_merges. */
  private val BpeSteps = 10
  private val QClfDim = 1024
  /** Per-source doc cap for q_source_quota. */
  private val QuotaK = 10

  /** Chunking window/step, shared with the oracle by interpolation:
    * 200-char windows every 150 chars = 50-char overlap (the RAG /
    * embedding-prep default shape). chunk_idx = chunk_start/step stays
    * exact integer arithmetic in both engines. */
  private val ChunkSize = 200
  private val ChunkStep = 150

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RAG-style OVERLAPPING CHUNKING — the embedding-prep step that
    // splits every document into fixed windows with overlap before
    // vectorization: one explode of an arithmetic start sequence per
    // doc (map-only, no shuffle below the serving sort; at 100 TB the
    // chunk table is written shard-parallel exactly like this). Chunk
    // CONTENT is pinned by md5 over the UTF-8 bytes (row size stays
    // bounded in the dump while the hash check still covers every
    // byte); empty docs produce one empty chunk, short docs one short
    // chunk — boundary semantics both engines state identically.
    "q_chunk_overlap" -> ((s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0),
            greatest(lit(0), length(col("text")) - 1),
            lit(ChunkStep))).as("chunk_start"))
        .select(col("doc_id"),
          (col("chunk_start") / ChunkStep).cast("int").as("chunk_idx"),
          col("chunk_start"),
          length(expr(s"substring(text, chunk_start + 1, $ChunkSize)"))
            .as("chunk_len"),
          md5(expr(s"substring(text, chunk_start + 1, $ChunkSize)")
            .cast("binary")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_start")),

    // Token counting: whitespace tokens + BPE-ish pre-tokenization.
    "q_token_stats" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(TextOps.wsTokens(col("text"))).as("n_ws_tokens"),
        size(TextOps.bpeTokens(col("text"))).as("n_bpe_tokens"))
        .orderBy("doc_id")),

    // VOCABULARY-driven subword token counting — the BPE/WordPiece
    // inference shape (q_token_stats' n_bpe_tokens is the regex
    // PRE-tokenization count; this runs greedy longest-match segmentation
    // over a frequency-derived 256-gram vocab via the native
    // BpeTokenCount kernel). Vocab derivation is a deterministic total
    // order on integer counts, so the oracle re-derives it — no fixture.
    "q_bpe_subword" -> ((s, dir) => {
      val d = docs(s, dir)
      val vocab = TextOps.bpeVocab(d, "text", BpeVocabSize)
      d.select(col("doc_id"),
          size(TextOps.wsTokens(lower(col("text")))).cast("long").as("n_pretokens"),
          graft.functions.BpeTokens.bpe_token_count(col("text"), vocab)
            .cast("long").as("n_subword"))
        .withColumn("subword_ratio", round(
          col("n_subword") / greatest(col("n_pretokens"), lit(1L)).cast("double"), 6))
        .orderBy("doc_id")
    }),

    // BPE merge TRAINING (Sennrich 2016): `BpeSteps` most-frequent
    // adjacent-pair merges learned from the word-frequency table —
    // vocab-sized iterations, 1-row argmax collect per step (the
    // iterate-small-model shape). Double-space symbol strings make each
    // merge a plain leftmost `replace`, identical in both engines, so
    // the oracle replays the whole training loop as chained CTEs.
    "q_bpe_merges" -> ((s, dir) =>
      TextOps.bpeMerges(docs(s, dir), "text", BpeSteps).orderBy("step")),

    // Quality-classifier inference: fastText-style hashed bag-of-words
    // linear scorer (broadcast weight table; deterministic stand-in
    // weights — a trained table drops in with the identical plan).
    "q_quality_classifier" -> ((s, dir) =>
      TextOps.linearQualityScore(docs(s, dir), "doc_id", "text",
          TextOps.hashWeights(s, QClfDim), QClfDim)
        .orderBy("doc_id")),

    // Per-source quality quota (the FineWeb/CCNet per-domain cap): keep
    // only the K best classifier-scored docs of each source. Ranking is
    // the bounded-heap topk_by aggregate — map-side combine reduces every
    // partition to ≤ K entries per source BEFORE the exchange, so a
    // boilerplate-heavy mega-domain costs the same as a tiny one (the
    // row_number() window formulation would shuffle the full corpus into
    // |sources| partitions — a skew scale-killer; same argument as the
    // ANN rank stage). Scores ride as exact round-6 micro-units so the
    // heap's (ord DESC, id ASC) total order is the oracle's ORDER BY.
    "q_source_quota" -> ((s, dir) => {
      val scored = TextOps.linearQualityScore(docs(s, dir), "doc_id", "text",
        TextOps.hashWeights(s, QClfDim), QClfDim)
      scored.join(docs(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("source"),
          round(col("score") * 1e6).cast("long").as("om"), col("doc_id"))
        .groupBy(col("source"))
        .agg(graft.functions.TopKByAgg.topk_by(
          col("om"), col("doc_id"), QuotaK).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("long").as("rank"),
          col("col.id").as("doc_id"),
          round(col("col.ord") / 1e6, 6).as("score"))
        .orderBy("source", "rank")
    }),

    // Quality scoring: length/punct/stopword signals + composite score.
    "q_text_quality" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextOps.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        round(TextOps.qualityScore(col("text")), 6).as("quality_score"))
        .orderBy("doc_id")),

    // Heuristic language ID vs. the labeled lang column. Par.spread: the
    // langId kernel over the single-split test scan ran ~1 s serial,
    // TWICE (the orderBy's range sample job re-executes it) — the r16
    // spread revert covered sub-second tokenizer/shingle kernels, not
    // this multi-second class; A/B re-measured a win here (r17).
    "q_langid" -> ((s, dir) =>
      graft.util.Par.spread(docs(s, dir)).select(
        col("doc_id"), col("lang"),
        TextOps.langId(col("text")).as("predicted_lang"))
        .orderBy("doc_id")),

    // Document fingerprinting (full md5 + min-shingle hash).
    "q_doc_fingerprint" -> ((s, dir) =>
      TextOps.fingerprints(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // Compressibility quality signal (RedPajama-v2 signal family):
    // per-doc DEFLATE ratio — boilerplate compresses far below prose,
    // noise barely at all. The compressor is the non-SQL stage (one
    // zlib stream per partition, seam-written like the hash families);
    // ratio + bucketing replay in DuckDB from the fixture.
    "q_compress_ratio" -> ((s, dir) => {
      val stats = seam(
        TextOps.compressionStats(docs(s, dir), "doc_id", "text"),
        dir, "compress_stats")
      stats
        .withColumn("ratio", round(col("comp_len").cast("double") /
          nullif(col("raw_len"), lit(0L)), 6))
        .withColumn("bucket",
          when(col("ratio").isNull, "empty")
            .when(col("ratio") < 0.3, "repetitive")
            .when(col("ratio") <= 0.55, "normal")
            .otherwise("incompressible"))
        .orderBy("doc_id")
    }),

    // Repetition filter (Gopher-style): within-document duplicate-shingle
    // ratio; heavily repetitive docs are low-quality training data.
    "q_repetition_filter" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        graft.functions.WordShingles.word_shingles(
          col("text"), 3, distinct = false).as("grams"))
        // one kernel pass; distinct count via array_distinct on its output
        .select(col("doc_id"), size(col("grams")).as("n_grams"),
          size(array_distinct(col("grams"))).as("n_distinct"))
        .filter(col("n_grams") >= 3)
        .withColumn("rep_ratio",
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))
        .withColumn("flagged", (col("rep_ratio") > 0.2).cast("int"))
        .orderBy("doc_id")),

    // Deterministic content-hash train/val split (md5 first hex nibble:
    // 'f' → val ≈ 1/16); reproducible across engines and runs, no rand().
    "q_train_split" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        when(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1) === "f",
          "val").otherwise("train").as("split"))
        .orderBy("doc_id")),

    // Winnowing fingerprints: sliding-window minima over positional k-gram
    // hashes (plagiarism/near-dup localization primitive).
    "q_winnow_fingerprints" -> ((s, dir) =>
      TextOps.winnowFingerprints(docs(s, dir), "doc_id", "text", k = 3, w = 4)
        .orderBy("doc_id", "fingerprint")),

    // MOSS-style overlap localization: document pairs sharing >= 3 kept
    // winnow fingerprints (ubiquitous fingerprints dropped at df > 20 —
    // the noise threshold that also bounds the pair join's posting
    // lists). See TextOps.winnowOverlap for the scale shape.
    "q_winnow_overlap" -> ((s, dir) =>
      TextOps.winnowOverlap(docs(s, dir), "doc_id", "text",
          k = 3, w = 4, maxDf = 20, minShared = 3L)
        .orderBy("doc_a", "doc_b")),

    // TF-IDF keyword extraction: top-3 terms per document, ranked by the
    // ROUNDED score (+ term tie-break) so ordering is engine-independent.
    // The corpus count is a 1-row broadcast cross join folded into the SAME
    // job — no driver-side count() action at plan-build (which would add a
    // full extra scan per invocation).
    "q_tfidf_keywords" -> ((s, dir) => {
      val d = docs(s, dir)
      val nDocs = d.agg(count(lit(1)).cast("double").as("n_docs"))
      val tokens = d.select(col("doc_id"),
        explode(TextOps.wsTokens(lower(col("text")))).as("term"))
      val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfreq), Seq("term"))
        .crossJoin(broadcast(nDocs))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs") / col("df")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
        .orderBy("doc_id", "rank")
    }),

    // Unigram log-probability quality score — the cheap perplexity proxy:
    // score = mean over tokens of -ln(corpus_freq(term) / corpus_tokens).
    // Gibberish and boilerplate-heavy docs land at the distribution's
    // extremes. One aggregate builds the unigram table; the corpus total
    // folds in as a 1-row broadcast cross join (no driver-side action);
    // the per-token score join shuffles on the term hash at scale.
    "q_unigram_logprob" -> ((s, dir) => {
      val tokens = docs(s, dir).select(col("doc_id"),
        explode(TextOps.wsTokens(lower(col("text")))).as("term"))
      val tf = tokens.groupBy("term").agg(count(lit(1)).as("n_term"))
      val total = tf.agg(sum("n_term").cast("double").as("n_total"))
      tokens.join(tf, Seq("term"))
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("n_term") / col("n_total"))), 6).as("avg_neg_logprob"))
        .orderBy("doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023): hashed-unigram importance
    // resampling against a target domain (here sources src0/src1 stand in
    // for "high-quality target"). Per-doc log weight = Σ tokens of the
    // smoothed target/raw bucket log-ratio; resample raw data by these
    // weights to skew a pretraining mix toward the target. See
    // TextOps.dsirLogWeights for the engine-exact integer-micro
    // accumulation and the broadcast-everything scale shape.
    // NOT spread: A/B measured the hashed-ngram kernel in the r16
    // sub-second class (warm wall flat, process-CPU 2× under the
    // exchange + 32-task overhead) — unlike q_langid's multi-second
    // span, the spread does not pay here
    "q_dsir_weights" -> ((s, dir) =>
      TextOps.dsirLogWeights(docs(s, dir), "doc_id", "text",
          col("source").isin("src0", "src1"), buckets = 256)
        .orderBy("doc_id")),

    // PII scrub (decontamination stage): count + redact emails/URLs. The
    // patterns use only constructs Java regex and RE2 read identically
    // (char classes, quantifiers — no lookaround, no \s, which differs at
    // 0x0B); map-only, verified by the scrubbed text's md5.
    "q_pii_scrub" -> ((s, dir) =>
      docs(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(PiiEmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(PiiUrlRe), lit(0))).as("n_urls"),
        md5(regexp_replace(regexp_replace(col("text"), PiiEmailRe, "[EMAIL]"),
          PiiUrlRe, "[URL]").cast("binary")).as("scrubbed_md5"))
        .orderBy("doc_id")),

    // Flesch reading-ease per language (Flesch 1948 — the readability
    // gate readability-filtered corpora like C4/FineWeb-edu apply in
    // spirit): per doc, words = whitespace tokens, syllables = vowel
    // groups per token (min 1 — the standard heuristic), sentences =
    // terminal-punctuation runs (min 1); F = 206.835 − 1.015·w/s −
    // 84.6·syl/w. All three counts are exact integers; the per-doc F is
    // the only float, rounded to micro-units BEFORE the per-language
    // mean so the aggregate is an exact-integer sum (the dailyRollup
    // discipline) — map-only per doc + one tiny rollup at any scale.
    "q_readability" -> ((s, dir) => {
      val t = graft.text.TextOps.wsTokens(lower(col("text")))
      val syl = aggregate(
        transform(t, w => greatest(lit(1L),
          size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))).cast("long"))),
        lit(0L), (acc, x) => acc + x)
      val scored = docs(s, dir).select(col("lang"),
          size(t).cast("long").as("w"),
          syl.as("syl"),
          greatest(lit(1L), size(regexp_extract_all(col("text"),
            lit("[.!?]+"), lit(0))).cast("long")).as("sent"))
        .filter(col("w") > 0)
        .select(col("lang"), round((lit(206.835)
          - lit(1.015) * (col("w").cast("double") / col("sent"))
          - lit(84.6) * (col("syl").cast("double") / col("w"))) * 1e6, 0)
          .cast("long").as("fm"))
      scored.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("fm")).cast("double") / count(lit(1)) / 1e6, 6)
            .as("mean_flesch"),
          round(min(col("fm")).cast("double") / 1e6, 6).as("min_flesch"),
          round(max(col("fm")).cast("double") / 1e6, 6).as("max_flesch"))
        .orderBy("lang")
    }),

    // Zipf-law fit audit (Zipf 1949; q_heaps_law's rank-frequency
    // sibling — natural corpora fit log f ≈ a + s·log r with s ≈ −1,
    // and a synthetic/templated corpus betrays itself by a flat or
    // kinked curve): OLS of ln(freq) on ln(rank) over the top-100
    // terms. One tokenize scan → term counts (map-side combined) →
    // distributed TakeOrdered 100 → everything else on the 100-row
    // frame. Both logs are rounded to 6 dp BEFORE the moment sums (the
    // q_benford rounded-inputs discipline), the moments accumulate as
    // exact micro-unit longs, and slope/R² are one closed-form double
    // chain — hash-stable cross-engine.
    "q_zipf_fit" -> ((s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val top = docs(s, dir)
        .select(explode(graft.text.TextOps.wsTokens(lower(col("text"))))
          .as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term")).limit(100)
      val pts = top
        .withColumn("r", row_number().over(
          W.orderBy(col("n").desc, col("term"))))
        .select(
          // decimal moments: k·Σ(ly²) brushes Long.MAX at web-corpus
          // frequencies (ln(1e12)·1e6 squared, ×100 terms, ×k)
          round(round(log(col("r").cast("double")), 6) * 1e6, 0)
            .cast("long").cast("decimal(38,0)").as("lx"),
          round(round(log(col("n").cast("double")), 6) * 1e6, 0)
            .cast("long").cast("decimal(38,0)").as("ly"))
      val m = pts.agg(count(lit(1)).cast("decimal(38,0)").as("k"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("ly") * col("ly")).as("syy"))
      val numXY = col("k") * col("sxy") - col("sx") * col("sy")
      val denX  = col("k") * col("sxx") - col("sx") * col("sx")
      val denY  = col("k") * col("syy") - col("sy") * col("sy")
      m.select(col("k").cast("long").as("n_terms"),
        round(numXY.cast("double") / denX.cast("double"), 6).as("slope"),
        round(pow(numXY.cast("double"), 2) /
          (denX.cast("double") * denY.cast("double")), 6).as("r2"))
    }),

    // k-anonymity generalization over the (lang, source) quasi-identifier:
    // under-5 groups get source coarsened to '*', regrouped, and flagged
    // if the merge still leaves them re-identifiable (k_ok=false → a
    // release must suppress). Group membership, not values, is the leak
    // this bounds — the complement of q_pii_scrub.
    "q_k_anonymity" -> ((s, dir) =>
      graft.text.TextOps.kAnonymize(docs(s, dir),
          Seq("lang", "source"), generalize = "source", k = 5)
        .orderBy("lang", "source_anon")),

    // Benchmark-contamination check: per-document 3-gram overlap against an
    // eval set (every 100th doc stands in for a held-out benchmark). The
    // eval shingle set is SMALL by construction → broadcast semi-join; the
    // corpus side streams through map-side. Contaminated = ≥50% overlap.
    "q_contamination" -> ((s, dir) => {
      import graft.dedup.DedupOps
      val d = docs(s, dir)
      val evalShingles = DedupOps.shingleHashes(
          d.filter(col("doc_id") % 100 === 0), "doc_id", "text", 3)
        .select("gh").distinct()
      val docShingles = DedupOps.shingleHashes(d, "doc_id", "text", 3)
      val counts = docShingles.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val shared = docShingles.join(broadcast(evalShingles), Seq("gh"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      counts.join(shared, Seq("doc_id"), "left")
        .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
        .withColumn("contaminated",
          (col("n_shared") * 2 >= col("n_shingles")).cast("int"))
        .select("doc_id", "n_shingles", "n_shared", "contaminated")
        .orderBy("doc_id")
    }),

    // Source-mixture downsampling: per-source target rates applied by a
    // DETERMINISTIC content-independent coin (md5(doc_id) hex prefix vs a
    // threshold) — reproducible across engines/runs/partitionings, no
    // rand(). Even-numbered sources keep ~75% ('c0'/256), odd ~25% ('40').
    // Temperature-based mixture reweighting (XLM / multilingual-BERT
    // α=0.5 resampling; the T5/mT5 recipe at a rational temperature):
    // per-source token mass n_s → sampling weight w_s ∝ √n_s, plus the
    // effective-epoch multiplier w_s·N/n_s each source would see under a
    // one-pass token budget. One tiny groupBy(source) rollup + broadcast
    // totals. α = 1/2 exactly so the weight goes through IEEE-exact sqrt
    // and the house integer-micro recipe (√n rounded to micros as BIGINT,
    // summed exactly) — engine-identical without a fixture.
    "q_mix_weights" -> ((s, dir) => {
      // the rollup is checkpointed (sources-sized frame): deriving the
      // totals from the lazy frame would re-run the corpus tokenize scan
      // a second time under the crossJoin subtree
      val per = docs(s, dir).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.wsTokens(col("text"))).cast("long")).as("n_tokens"))
        .withColumn("s_micro",
          round(sqrt(col("n_tokens").cast("double")) * 1e6, 0).cast("long"))
        .localCheckpoint(true)
      val tot = per.agg(sum("n_tokens").as("tot_tokens"),
        sum("s_micro").as("tot_micro"))
      per.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("tot_tokens"), 6).as("p_raw"),
          round(col("s_micro").cast("double") / col("tot_micro"), 6).as("w_temp"),
          round(col("s_micro").cast("double") / col("tot_micro")
            * col("tot_tokens") / col("n_tokens"), 6).as("eff_epochs"))
        .orderBy("source")
    }),

    "q_source_mixture" -> ((s, dir) =>
      docs(s, dir)
        .withColumn("threshold",
          when(regexp_extract(col("source"), "\\d+", 0).cast("int") % 2 === 0,
            lit("c0")).otherwise(lit("40")))
        .withColumn("kept",
          (substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
            < col("threshold")).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"))
        .orderBy("source")),

    // The full training-data cleaning pipeline, end to end: exact dedup →
    // near-dup cluster resolution (losers dropped) → length + language
    // gates. Composes five operator families in one job.
    "q_corpus_clean" -> ((s, dir) => {
      import graft.dedup.DedupOps
      val d = docs(s, dir)
      val exactKeep = DedupOps.exactDedup(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      // reused by the pair join (twice via self-join) and the final gates —
      // persist once instead of recomputing the md5 semi-join three times.
      // Par.spread first (guide §2.5): the semi-join output inherits the
      // single-split test scan's ONE partition, so the cached frame fed
      // every downstream kernel — shingle hashing in the pair join and
      // the langId/n_tokens gates (the gates run TWICE: the final
      // orderBy's range-partitioner sample job executes them once more)
      // — on one core; r17 job profile showed two back-to-back 1-task
      // ~1 s jobs at the tail. No-op once the source scans wide.
      val exactKept = graft.util.Par.spread(
          d.join(exactKeep, Seq("doc_id"), "left_semi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // prefix-filtered exact pair join (bit-identical to naive; DedupSpec
      // pins it) — the naive posting-list self-join is quadratic in a hot
      // shingle's posting list, the one scale-killer this pipeline had
      val clusters = DedupOps.duplicateClusters(
        DedupOps.ngramJaccardPairsPrefix(exactKept, "doc_id", "text", 3, 0.8)
          .select(col("id_a"), col("id_b")))
      val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")
      exactKept.join(losers, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", size(TextOps.wsTokens(col("text"))))
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .filter(col("n_tokens") >= 50 && col("lang_pred") =!= "und")
        .select(col("doc_id"), col("n_tokens"), col("lang_pred"))
        .orderBy("doc_id")
    }),

    // The cleaning pipeline's 100 TB near-dup path: identical to
    // q_corpus_clean except the pair graph comes from MinHash(128) +
    // LSH(32×4) with exact verification instead of the exact-Jaccard join —
    // candidate generation is a band-bucket equi-join, so cost scales with
    // the near-dup density, not with posting-list shapes. Shadows
    // q_corpus_clean the way q_dedup_embed_lsh shadows q_dedup_embed.
    // Oracle: fixture seams at the signature and shingle-hash frames; DuckDB
    // replays band bucketing → verify → clustering → gates bit-for-bit.
    "q_corpus_clean_lsh" -> ((s, dir) => {
      import graft.dedup.DedupOps
      val d = docs(s, dir)
      val exactKeep = DedupOps.exactDedup(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      // spread before persist — same single-partition trap as
      // q_corpus_clean, and here the MinHash(128) signature kernel reads
      // this frame too
      val exactKept = graft.util.Par.spread(
          d.join(exactKeep, Seq("doc_id"), "left_semi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sigs = seam(DedupOps.minhashSignatures(exactKept, "doc_id", "text",
        n = 3, k = 128), dir, "clean_minhash_sigs")
      val ex = seam(DedupOps.shingleHashes(exactKept, "doc_id", "text", n = 3),
        dir, "clean_minhash_shingles")
      val pairs = DedupOps.verifyJaccardPairs(
          DedupOps.lshCandidates(sigs, k = 128, bands = 32), ex, threshold = 0.8)
        .select(col("id_a"), col("id_b"))
      val losers = DedupOps.duplicateClusters(pairs)
        .filter(col("doc_id") =!= col("cluster_id"))
        .select("doc_id")
      exactKept.join(losers, Seq("doc_id"), "left_anti")
        .withColumn("n_tokens", size(TextOps.wsTokens(col("text"))))
        .withColumn("lang_pred", TextOps.langId(col("text")))
        .filter(col("n_tokens") >= 50 && col("lang_pred") =!= "und")
        .select(col("doc_id"), col("n_tokens"), col("lang_pred"))
        .orderBy("doc_id")
    }),

    // Bigram language-model scoring (TextOps.bigramLogprob): mean per doc
    // of -ln(P(w2|w1)) under the corpus's own bigram LM.
    "q_bigram_logprob" -> ((s, dir) =>
      TextOps.bigramLogprob(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Sequence packing (concat-then-chunk pretraining layout): sharded
    // running token sums assign each doc its start/end sequence and offset;
    // no global window — see TextOps.packSequences.
    "q_pack_sequences" -> ((s, dir) =>
      TextOps.packSequences(docs(s, dir), "doc_id", "text",
          capacity = 2048, nShards = 8)
        .orderBy("doc_id")),

    // Mixture-targeted deterministic downsampling: each source keeps a
    // target fraction of its documents (here 16/16, 8/16 or 4/16 by source
    // number mod 3 — the "rebalance the web/books/code mix" knob). The
    // keep decision is a pure function of the doc id's md5 nibble — no
    // rand(), so retries, engines and incremental re-runs agree row for
    // row, and a doc's fate never depends on which partition it landed in.
    // Map-only: the filter runs at the scan at any scale.
    "q_mix_sample" -> ((s, dir) => {
      val srcnum = coalesce(
        regexp_extract(col("source"), "\\d+", 0).cast("int"), lit(-1))
      val rate16 = when(pmod(srcnum, lit(3)) === 0, lit(16))
        .when(pmod(srcnum, lit(3)) === 1, lit(8))
        .otherwise(lit(4))
      val nibble = conv(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1),
        16, 10).cast("int")
      docs(s, dir).select(col("doc_id"), col("source"),
          (nibble < rate16).cast("int").as("kept"))
        .orderBy("doc_id")
    }),

    // Quality-bucketed epoch REPLICATION — the data-recipe upsampling
    // move (repeat high-quality data k epochs in the training mix;
    // cf. Llama/DoReMi-style source weighting): long docs ×3, mid docs
    // ×1.5 (deterministic md5-nibble half), short dropped. The
    // replication is a map-side explode(sequence(1, w)) — rows multiply
    // WITHOUT a shuffle or a join, the only shape that survives when
    // the upsampled corpus is 3× of 100 TB. q_mix_sample is the
    // DOWN-sampling twin (keep-rates); this is the epoch fan-out.
    "q_upsample" -> ((s, dir) => {
      val ntok = size(graft.text.TextOps.wsTokens(col("text")))
      val nibble = conv(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 1),
        16, 10).cast("int")
      docs(s, dir)
        .withColumn("bucket",
          when(ntok >= 60, "long").when(ntok >= 30, "mid").otherwise("short"))
        .withColumn("w",
          when(col("bucket") === "long", lit(3))
            .when(col("bucket") === "mid",
              lit(1) + (nibble < 8).cast("int"))
            .otherwise(lit(0)))
        .filter(col("w") > 0)
        .select(col("bucket"),
          explode(sequence(lit(1), col("w"))).as("epoch"))
        .groupBy("bucket", "epoch").agg(count(lit(1)).as("n_docs"))
        .orderBy("bucket", "epoch")
    }),

    // Cross-corpus decontamination dedup: drop incoming docs whose exact
    // content already exists in the reference corpus (train-vs-eval
    // screening; sources 0-9 = reference, 10+ = incoming). Both sides
    // collapse to 16-byte content digests before the anti-join, so the
    // exchange carries hashes, never text; the reference side dedups to
    // one row per distinct digest first. Near-dup cross-screening is the
    // same shape with minhashDedupPairs feeding the anti-join.
    "q_cross_dedup" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("sn",
        regexp_extract(col("source"), "\\d+", 0).cast("int"))
      val ref = d.filter(col("sn") < 10)
        .select(md5(col("text").cast("binary")).as("h")).distinct()
      d.filter(col("sn") >= 10)
        .select(col("doc_id"), col("source"), md5(col("text").cast("binary")).as("h"))
        .join(ref, Seq("h"), "left_anti")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // WEIGHTED sampling without replacement, integer weights, fully
    // deterministic: item priority = min of w independent hashes (the
    // min-hash property gives P(item wins) = w_i/Σw — equivalent to
    // expanding each item into w copies and distinct-sampling), so the
    // 32 smallest priorities ARE a weighted sample and the oracle
    // replays every hash. Weights favor long documents (3/2/1 by
    // length); the rank is a distributed TakeOrdered, never a full
    // sort. The deterministic stand-in for rand()-based weighted
    // sampling, which no oracle could check.
    "q_weighted_sample" -> ((s, dir) => {
      val w = docs(s, dir).select(col("doc_id"),
        when(col("n_chars") >= 500, 3)
          .when(col("n_chars") >= 250, 2).otherwise(1).as("w"))
      w.withColumn("j", explode(sequence(lit(0), col("w") - 1)))
        .select(col("doc_id"), col("w"),
          TextOps.md5Key64(concat_ws(":", col("doc_id"), col("j")), "wrs:")
            .as("hk"))
        .groupBy(col("doc_id"), col("w"))
        .agg(min(col("hk")).as("key"))
        .orderBy("key").limit(32)
    }),

    // Stratified deterministic sampling: the k hash-ranked docs per source
    // (eval-set construction). Ranking key = first 60 bits of md5(doc_id)
    // — reproducible across engines/runs. Runs through the bounded-heap
    // partial top-k aggregate (TopKByAgg, smallest-first via negated key),
    // NOT a row_number window: map-side combine caps the exchange at
    // k rows per (source, partition), so a billion-doc stratum never
    // sorts or shuffles beyond k·strata rows.
    "q_strat_sample" -> ((s, dir) => {
      val hv = TextOps.md5Key64(col("doc_id"))
      docs(s, dir).select(col("source"), col("doc_id"), hv.as("hv"))
        .groupBy("source")
        .agg(graft.functions.TopKByAgg.topk_by(-col("hv"), col("doc_id"), 5).as("tk"))
        .select(col("source"), posexplode(col("tk")))
        .select(col("source"), (col("pos") + 1).as("rank"),
          col("col.id").as("doc_id"), (-col("col.ord")).as("hv"))
        .orderBy("source", "rank")
    }),

    // Language-ID confusion matrix (the QA table behind q_langid: where
    // does the n-gram heuristic disagree with the corpus's ground-truth
    // lang label, and at what per-language accuracy): one map-only
    // predict pass → the (actual, predicted) contingency rollup;
    // per-language accuracy is an exact-integer division over it. The
    // production read: off-diagonal mass localized to one pair means a
    // stopword-list gap, uniform off-diagonal means the text is too
    // short for the heuristic.
    "q_lang_confusion" -> ((s, dir) => {
      val cells = docs(s, dir)
        .select(col("lang").as("actual"),
          TextOps.langId(col("text")).as("predicted"))
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // ≤ |langs|² rows; totals re-derive
      val tot = cells.groupBy(col("actual"))
        .agg(sum(col("n")).as("n_actual"))
      cells.join(broadcast(tot), Seq("actual"))
        .select(col("actual"), col("predicted"), col("n"),
          round(col("n").cast("double") / col("n_actual"), 6).as("frac"),
          (col("actual") === col("predicted")).as("correct"))
        .orderBy("actual", "predicted")
    }),

    // Per-source dedup-rate dashboard (the curation table that decides
    // which feeds are worth re-crawling: how much of each source
    // survives exact dedup, and how much of THAT survives near-dup
    // cluster resolution): exact survivors via the md5 keep set,
    // near-dup losers via the prefix-filtered pair graph + CC — both
    // the machinery the q_corpus_clean pipeline runs, here reported per
    // source with exact-integer rates.
    "q_dedup_rate" -> ((s, dir) => {
      import graft.dedup.DedupOps
      val d = docs(s, dir)
      val exactKeep = DedupOps.exactDedup(d, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val exactKept = d.join(exactKeep, Seq("doc_id"), "left_semi")
        .localCheckpoint(true) // pair join reads it twice
      val losers = DedupOps.duplicateClusters(
          DedupOps.ngramJaccardPairsPrefix(exactKept, "doc_id", "text", 3, 0.8)
            .select(col("id_a"), col("id_b")))
        .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
      val nearKept = exactKept.join(losers, Seq("doc_id"), "left_anti")
      val bySource = d.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val exactBy = exactKept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_exact"))
      val nearBy = nearKept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_clean"))
      bySource.join(exactBy, Seq("source"), "left")
        .join(nearBy, Seq("source"), "left")
        .select(col("source"), col("n_docs"),
          coalesce(col("n_exact"), lit(0L)).as("n_exact"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"),
          round(coalesce(col("n_clean"), lit(0L)).cast("double") /
            col("n_docs"), 6).as("survival_rate"))
        .orderBy("source")
    }),

    // Sampler-bias audit: does the deterministic hash sample LOOK like
    // its stratum? Per source, the q_strat_sample top-5 sample's mean
    // n_chars against the population mean, standardized:
    // z = (x̄s − μ)·√n / σ_pop. Population moments are exact
    // DECIMAL(38,0) sums (n_chars is an integer), the sample mean is a
    // 5-row exact sum, and z is one closed-form double chain — so the
    // audit is itself hash-checkable, and a hash function that
    // correlated with content would show up as |z| drift. One corpus
    // scan + the sampler's bounded-heap pass at any scale.
    "q_sample_bias" -> ((s, dir) => {
      val d = docs(s, dir)
      val hv = TextOps.md5Key64(col("doc_id"))
      val sample = d.select(col("source"), col("doc_id"), hv.as("hv"))
        .groupBy("source")
        .agg(graft.functions.TopKByAgg.topk_by(-col("hv"), col("doc_id"), 5)
          .as("tk"))
        .select(col("source"), explode(col("tk")).as("e"))
        .select(col("source"), col("e.id").as("doc_id"))
      val pop = d.groupBy(col("source")).agg(
        count(lit(1)).cast("decimal(38,0)").as("np"),
        sum(col("n_chars").cast("decimal(38,0)")).as("sp"),
        sum(col("n_chars").cast("decimal(38,0)") *
          col("n_chars").cast("decimal(38,0)")).as("spp"))
      val smp = d.join(sample, Seq("source", "doc_id"), "left_semi")
        .groupBy(col("source")).agg(count(lit(1)).as("ns"),
          sum(col("n_chars").cast("decimal(38,0)")).as("ss"))
      val meanS = col("ss").cast("double") / col("ns").cast("double")
      val meanP = col("sp").cast("double") / col("np").cast("double")
      val sigma = sqrt((col("np") * col("spp") - col("sp") * col("sp"))
        .cast("double") / (col("np") * col("np")).cast("double"))
      smp.join(pop, Seq("source"))
        .select(col("source"), col("ns").as("n_sample"),
          round(meanS, 6).as("mean_sample"),
          round(meanP, 6).as("mean_pop"),
          round((meanS - meanP) * sqrt(col("ns").cast("double")) / sigma, 6)
            .as("z"))
        .orderBy("source")
    }),

    // Heaps-law vocabulary-growth audit (Heaps 1978: V(n) ≈ K·n^β —
    // the curve that tells a tokenizer-training pipeline whether more
    // corpus still buys vocabulary): distinct-vocab and token totals at
    // four doc-id checkpoints. Scale shape: NO global ordering/window —
    // each term collapses to its FIRST doc (min(doc_id), one map-side-
    // combined agg), each doc to its token count, and checkpoint
    // assignment is a broadcast join against the 4-row bounds table, so
    // the curve costs one tokenize pass + two aggregates at any corpus
    // size. The max(doc_id) scalar is a single-row driver agg
    // (metadata-scale); ceil(m·q/4) in shared double math pins the
    // bounds cross-engine.
    "q_heaps_law" -> ((s, dir) => {
      import s.implicits._
      val d = docs(s, dir)
      val m = d.agg(max(col("doc_id"))).head.getLong(0) + 1
      val bdf = (1 to 4).map(q => (q, math.ceil(m * q / 4.0).toLong))
        .toDF("q", "b")
      val perDoc = d.select(col("doc_id"),
          size(TextOps.wsTokens(lower(col("text")))).as("n_tok"))
        .join(broadcast(bdf), col("doc_id") < col("b"))
        .groupBy("q")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).cast("long").as("n_tokens"))
      val vocab = d.select(col("doc_id"),
          explode(TextOps.wsTokens(lower(col("text")))).as("term"))
        .groupBy("term").agg(min(col("doc_id")).as("fid"))
        .join(broadcast(bdf), col("fid") < col("b"))
        .groupBy("q").agg(count(lit(1)).as("vocab"))
      perDoc.join(vocab, "q").orderBy("q")
    }),

    // The SAME stratified sample maintained by STRUCTURED STREAMING:
    // the ≤k-pair bottom-k heap is the state-store payload
    // (StreamingOps.runStreamSampleOnce), and bottom-k-of-a-set is
    // split-invariant — so the streamed sample is bit-identical to
    // batch and shares q_strat_sample's oracle verbatim. Continuous
    // uniform-sample maintenance at ingest.
    "q_stream_sample" -> ((s, dir) =>
      graft.streaming.StreamingOps.runStreamSampleOnce(s, dir, 5)
        .select(col("source"), posexplode(col("tk")))
        .select(col("source"), (col("pos") + 1).as("rank"),
          col("col.id").as("doc_id"), (-col("col.ord")).as("hv"))
        .orderBy("source", "rank")),

    // Vocabulary coverage / OOV-rate audit: build the corpus top-200
    // unigram vocabulary (count desc, term asc — deterministic), then per
    // source report token volume and the share falling outside the vocab.
    // The corpus is TOKENIZED ONCE: the token stream collapses immediately
    // to per-(source, term) counts — map-side combine, so the exchange
    // carries distinct terms per source, not token instances — and that
    // compact frame (checkpointed; it's read by both stages) serves both
    // the vocab pick and the scoring. At 100 TB the alternative of
    // re-tokenizing per stage is a second full corpus scan + kernel pass,
    // and persisting the raw token STREAM (~1.5× corpus bytes) is worse
    // than either; the (source, term) rollup is the only frame small
    // enough to hold and rich enough to answer both questions. The vocab
    // pick is orderBy+limit — Spark plans TakeOrderedAndProject
    // (distributed per-partition top-k, merged at the driver), NOT a
    // single-reducer global sort, so a garbage-token long tail with
    // billions of distinct terms can't pin one task. The ≤200-row vocab
    // then broadcasts onto the rollup: a map-side hash lookup, no shuffle.
    // Weighted sums over the rollup ≡ the per-token avg bit-for-bit:
    // n_oov and n_tokens are exact integers < 2^53, so sum/sum is the
    // same double division avg() performs.
    "q_vocab_oov" -> ((s, dir) => {
      val termCounts = docs(s, dir).select(col("source"),
          explode(TextOps.wsTokens(lower(col("text")))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("n"))
        .localCheckpoint(true)
      val vocab = termCounts.groupBy("term")
        .agg(sum("n").as("n_term"))
        .orderBy(col("n_term").desc, col("term"))
        .limit(200)
        .select(col("term"), lit(1).as("in_vocab"))
      termCounts.join(broadcast(vocab), Seq("term"), "left")
        .groupBy("source")
        .agg(sum("n").as("n_tokens"),
          sum(when(col("in_vocab").isNull, col("n")).otherwise(0L)).as("n_oov"))
        // exact integer round-6 of the rate: n_oov/n_tokens is a finite
        // rational that can land on a halfway decimal (PERF r12)
        .withColumn("oov_rate",
          graft.ops.ResampleOps.ratioHalfUp(
            col("n_oov").cast("decimal(38,0)") * 1000000L,
            col("n_tokens")).cast("double") / 1e6)
        .orderBy("source")
    }),

    // Deterministic epoch shuffle (the pre-training "global shuffle"
    // materialized as a layout): each doc's position in epoch e is given
    // by the md5 of (epoch, doc_id) — reproducible across runs/engines,
    // uncorrelated with ingest order. The permutation is SHARDED exactly
    // like packSequences: the hash picks 1 of 8 shards, and the rank is
    // computed WITHIN the shard (one hash exchange + per-shard sort,
    // never a global sort). Each shard maps 1:1 onto an epoch-file
    // writer; readers interleave shards. At 100 TB nShards scales to
    // O(cluster cores) — 8 here keeps the oracle's output small/stable.
    // NOTE the actual per-task sort size is n/spark.sql.shuffle.partitions
    // (the window exchange hashes shard INTO the configured partition
    // count), so the scale lever is shuffle partitions, not nShards:
    // PERF.md round 8 measured the 50M-row point at 32 partitions vs 512
    // as 32-52 s vs 20 s, with zero spill either way.
    //
    // Shard key and sort key are TextOps.md5Key64 (engine-exact 60-bit
    // BIGINT): sorting 8-byte longs instead of 32-char hex strings
    // measured ~1.9× at 50M rows (Profile scale_new, 80.7 → 42.8 s), and
    // a 60-bit prefix + doc_id tie-break is still a deterministic total
    // order.
    "q_epoch_shuffle" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      docs(s, dir)
        .select(col("doc_id"),
          TextOps.md5Key64(col("doc_id"), "epoch1:").as("hv"))
        .withColumn("shard", pmod(col("hv"), lit(8)).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("hv"), col("doc_id"))))
        .select("doc_id", "shard", "pos")
        .orderBy("doc_id")
    }),

    // Overlapping token-window chunking (RAG / long-context prep):
    // 32-token windows every 24 tokens — sized to the synthetic corpus's
    // 10-99-token docs so multi-chunk splits actually occur (production
    // would run 256/192 or larger); see TextOps.chunkWindows for the
    // map-only shape and exact integer arithmetic.
    "q_chunk_windows" -> ((s, dir) =>
      TextOps.chunkWindows(docs(s, dir), "doc_id", "text",
          window = 32, stride = 24)
        .orderBy("doc_id", "chunk_idx")),

    // Deterministic negative sampling for contrastive training: every
    // 50th doc is an anchor; its k=5 "random" negatives are the corpus
    // docs with the smallest md5Key64(anchor ‖ ':' ‖ candidate) — a fresh
    // uniform draw per anchor, reproducible across runs and engines.
    // Shape: the anchor set is FIXED-SIZE (≤ 40 via the cap) and
    // broadcast; the corpus streams through the join once, and the top-k
    // runs as the bounded-heap aggregate (q_strat_sample's shape) so the
    // exchange carries ≤ k rows per (anchor, partition) — NOT a
    // row_number window, which would shuffle the full anchor-amplified
    // pair frame into |anchors| sort tasks. The window formulation IS the
    // oracle. hv ties (unlikely at this scale, expected at billions of
    // candidates per anchor — 60-bit birthday bound) resolve IDENTICALLY
    // on both engines: the heap breaks toward the smaller neg_id, which
    // is exactly the oracle's ORDER BY hv, neg_id.
    "q_neg_sample" -> ((s, dir) => {
      val anchors = docs(s, dir)
        .filter(col("doc_id") % 50 === 0 && col("doc_id") < 2000)
        .select(col("doc_id").as("anchor_id"))
      docs(s, dir).select(col("doc_id").as("neg_id"))
        .join(broadcast(anchors), col("anchor_id") =!= col("neg_id"))
        .withColumn("hv", TextOps.md5Key64(
          concat(col("anchor_id").cast("string"), lit(":"),
            col("neg_id").cast("string"))))
        .groupBy("anchor_id")
        .agg(graft.functions.TopKByAgg.topk_by(-col("hv"), col("neg_id"), 5).as("tk"))
        .select(col("anchor_id"), posexplode(col("tk")))
        .select(col("anchor_id"), (col("pos") + 1).as("rank"),
          col("col.id").as("neg_id"), (-col("col.ord")).as("hv"))
        .orderBy("anchor_id", "rank")
    }),

    // Gopher quality rules (Rae et al. 2021 App. A): the named filter
    // bundle — word-count/mean-word-length bounds, symbol ratio, alpha
    // fraction, stop-term presence, bullet/ellipsis line rules — with the
    // composite gate computed from 6-rounded measurements on both engines.
    "q_gopher_rules" -> ((s, dir) =>
      TextOps.gopherRules(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // Substring-level exact dedup (Lee et al. 2022 ExactSubstr): every
    // verbatim ≥20-token run occurring ≥2× anywhere in the corpus becomes
    // a drop span in EVERY document carrying it; keep spans are the
    // complement. Token-indexed spans, inclusive ends. See
    // TextOps.substrDedupSpans for the L-gram/interval-merge formulation
    // and the 100 TB shape. minRun=20 suits the contract corpus (docs are
    // 10-99 tokens); the paper's 50 is the pretraining-scale default.
    "q_substr_dedup" -> ((s, dir) =>
      TextOps.substrDedupSpans(docs(s, dir), "doc_id", "text", minRun = 20)
        .orderBy("doc_id", "span_start", "action")),

    // the paper's stated suggestion (remove all but one copy): each
    // duplicated window's canonical first occurrence — min packed
    // (doc, pos) key — survives; the earliest document keeps its text
    "q_substr_keep1" -> ((s, dir) =>
      TextOps.substrDedupSpans(docs(s, dir), "doc_id", "text", minRun = 20,
          keepFirst = true)
        .orderBy("doc_id", "span_start", "action")),

    // spans APPLIED: the cleaned corpus itself (drop-span tokens removed,
    // single-space re-joined; fully-duplicated docs become empty strings)
    "q_substr_clean" -> ((s, dir) =>
      TextOps.substrDedupApply(docs(s, dir), "doc_id", "text", minRun = 20)
        .orderBy("doc_id")),

    // Per-source vocabulary drift audit: top terms by contribution to
    // KL(source-unigram ‖ corpus-unigram) — see TextOps.driftTerms for
    // the engine-exact integer-count formulation and scale shape.
    "q_drift_terms" -> ((s, dir) =>
      TextOps.driftTerms(docs(s, dir), "source", "text", minCount = 5, k = 5)
        .orderBy("source", "rank")),

    // Perplexity bucketing (the CCNet recipe, Wenzek et al. 2020): score
    // every doc under the corpus's own bigram LM, then split each source
    // at its 33rd/67th score percentiles into head/middle/tail quality
    // buckets. Boundaries come from `percentile_approx` (Greenwald-Khanna
    // sketch, state bounded by the accuracy parameter per group — NOT one
    // double per doc like the exact `percentile`, whose per-source score
    // list made the old default memory-unbounded at 100 TB). GK is a
    // rank-error sketch: with accuracy a, the returned value's rank is
    // within n/a of the target, so bucket POPULATIONS shift by at most
    // that many docs vs exact — the CCNet recipe only needs stable
    // head/middle/tail thirds, not exact order statistics. DuckDB has no
    // GK replay, so the tiny per-source bounds frame is the fixture seam;
    // the oracle replays scoring + bucketing + aggregation around it.
    // Boundaries are rounded to 6 before comparison so both engines
    // bucket identically.
    "q_ppl_buckets" -> ((s, dir) => {
      val scored = TextOps.bigramLogprob(docs(s, dir), "doc_id", "text")
      val withSrc = docs(s, dir).select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"))
      val bounds = seam(withSrc.groupBy("source").agg(
        round(percentile_approx(col("avg_neg_logprob"), lit(0.33),
          lit(10000)), 6).as("b33"),
        round(percentile_approx(col("avg_neg_logprob"), lit(0.67),
          lit(10000)), 6).as("b67")), dir, "ppl_bounds")
      withSrc.join(broadcast(bounds), Seq("source"))
        .withColumn("bucket",
          when(col("avg_neg_logprob") <= col("b33"), lit("head"))
            .when(col("avg_neg_logprob") <= col("b67"), lit("middle"))
            .otherwise(lit("tail")))
        .groupBy("source", "bucket")
        // mean over integer micro-units, not avg(): scores are exact at 6
        // decimals, so summing them as BIGINT micro-units is associative —
        // a double avg() differs across engines in its summation order and
        // flipped the 6th decimal once at sf0.01
        .agg(count(lit(1)).as("n_docs"),
          round(sum(round(col("avg_neg_logprob") * 1e6, 0).cast("long"))
            .cast("double") / count(lit(1)) / 1e6, 6).as("mean_nlp"))
        .orderBy("source", "bucket")
    }),

    // Training DATA CARD: the per-(source, lang) release manifest —
    // document and token counts, exact-duplicate counts, and mean
    // quality score — the summary table every corpus release ships
    // (dataset cards, FineWeb-style stats tables). One corpus pass for
    // the per-doc columns, one 16-byte-hash aggregate for dup counts
    // joined back on the hash (never on text), one final group-by.
    // Quality means use the integer-micro discipline so both engines
    // agree bit-for-bit.
    "q_data_card" -> ((s, dir) => {
      val d = docs(s, dir).select(
        col("source"), col("lang"),
        size(TextOps.wsTokens(lower(col("text")))).cast("long").as("ntok"),
        md5(col("text").cast("binary")).as("h"),
        round(TextOps.qualityScore(col("text")), 6).as("q"))
      val dupes = d.groupBy(col("h")).agg(count(lit(1)).as("copies"))
      d.join(dupes, Seq("h"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ntok")).as("n_tokens"),
          sum(when(col("copies") > 1, 1L).otherwise(0L)).as("n_exact_dup"),
          round(sum(round(col("q") * 1e6, 0).cast("long")).cast("double")
            / count(lit(1)) / 1e6, 6).as("mean_quality"))
        .orderBy("source", "lang")
    }),

    // Length-bucketed batching: docs bin by token length padded to the
    // next multiple of 64 (tensor-alignment practice), and each bucket
    // reports its padding waste — the batching-efficiency audit that
    // decides training throughput (uniform batches pad everything to
    // the global max; bucketed batches pad to the bucket cap). Pure
    // map-side bucketing + one aggregate: no sort, no window, the shape
    // that holds at 10^10 docs. The /64 floor is exact in FP (power-of-
    // two divisor), so both engines bucket identically.
    "q_length_buckets" -> ((s, dir) =>
      docs(s, dir)
        .select(size(TextOps.bpeTokens(col("text"))).cast("long").as("len"))
        .withColumn("cap",
          (floor((col("len") + lit(63)) / lit(64)) * 64).cast("long"))
        .groupBy("cap")
        .agg(count(lit(1)).as("n_docs"), sum(col("len")).as("sum_len"))
        .select(col("cap"), col("n_docs"), col("sum_len"),
          (col("cap") * col("n_docs") - col("sum_len")).as("pad_waste"))
        .orderBy("cap")),

    // EXACT heavy hitters by the two-pass Misra-Gries protocol
    // (FrequencyOps): pass 1 is one constant-state MG aggregate (≤k
    // counters per partial, map-side combined — never a per-distinct-key
    // shuffle), pass 2 recounts only the ≤k candidates behind a codegen'd
    // InSet row filter and keeps freq > n/k in exact integers. The
    // candidate SET is order-dependent; the final answer is exactly
    // {word : freq > n/k} under any partitioning (the MG n/(k+1)
    // guarantee), so the oracle is the plain GROUP BY ... HAVING. k=30
    // over the 31-word corpus vocab forces the decrement path live.
    "q_heavy_hitters" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(explode(TextOps.wsTokens(lower(col("text")))).as("word"))
      graft.ops.FrequencyOps.exactHeavyHitters(words, "word", HeavyK)
        .orderBy(col("cnt").desc, col("word"))
    }),

    // The SAME heavy-hitter answer with pass 1 run as a STREAMING
    // aggregate: the MG counter map is the state-store payload
    // (StreamingOps.runStreamMgOnce), candidates drain from the sink,
    // and the exact batch recount filters them. Streamed candidates
    // differ from batch candidates (order-dependence is real); the
    // recounted answer cannot — it shares q_heavy_hitters' oracle
    // verbatim. Continuous "what's trending" with ≤k entries of state.
    "q_stream_topk" -> ((s, dir) => {
      val mg = graft.streaming.StreamingOps.runStreamMgOnce(s, dir, HeavyK)
        .select(col("mg.n").as("n"), col("mg.entries.key").as("cands"))
        .head()
      val words = docs(s, dir)
        .select(explode(TextOps.wsTokens(lower(col("text")))).as("word"))
      graft.ops.FrequencyOps.recountHeavy(words, "word", HeavyK,
          mg.getLong(0), mg.getSeq[String](1))
        .orderBy(col("cnt").desc, col("word"))
    }),
  )

  /** k for the heavy-hitter pair: chosen above the corpus vocab size is
    * trivial (no decrements), far below it is empty output — 30 vs the
    * 31-word vocab exercises both the decrement path and a non-trivial
    * 16-of-31 heavy set at sf0.01. */
  private val HeavyK = 30

  /** PII patterns — Java-regex/RE2-identical constructs only. */
  private val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiUrlRe = "https?://[^ \\t\\n\\f\\r]+"

  /** Shared by q_strat_sample and its streamed twin q_stream_sample. */
  private val StratSampleSql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS hv
      |  FROM documents),
      |r AS (
      |  SELECT source, doc_id, hv,
      |         row_number() OVER (PARTITION BY source
      |                            ORDER BY hv, doc_id) AS rank
      |  FROM d)
      |SELECT source, CAST(rank AS INT) AS rank, doc_id, hv
      |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin

  private val WsTokensSql = """regexp_extract_all(%s, '\S+')"""
  private def toks(col: String) = WsTokensSql.format(col)

  /** Shared oracle CTE chain for the ExactSubstr queries (minRun=20):
    * L-gram md5s with packed (doc,pos) keys, duplicated-window hits —
    * optionally exempting each window's canonical first occurrence —
    * interval merge into drop spans, complement keep spans. Ends at the
    * `spans` CTE; callers append their SELECT (or further CTEs). */
  private def substrSpansCte(keepFirst: Boolean): String = {
    val canon = if (keepFirst) " WHERE pk <> canon" else ""
    s"""WITH tk AS (
       |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
       |p AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 19)) AS i
       |      FROM tk WHERE len(t) >= 20),
       |g AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
       |             doc_id * 1048576 + (i - 1) AS pk,
       |             unhex(md5(array_to_string(t[i : i + 19], ' '))) AS h
       |      FROM p),
       |d AS (SELECT h, min(pk) AS canon FROM g
       |      GROUP BY h HAVING count(*) >= 2),
       |hit AS (SELECT doc_id, pos FROM g JOIN d USING (h)$canon),
       |r AS (SELECT doc_id, pos,
       |        CASE WHEN lag(pos) OVER w IS NULL
       |               OR pos > lag(pos) OVER w + 20 THEN 1 ELSE 0 END AS brk
       |      FROM hit WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |runs AS (SELECT doc_id, pos,
       |           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
       |         FROM r),
       |drops AS (SELECT doc_id, min(pos) AS drop_start,
       |                 max(pos) + 19 AS drop_end
       |          FROM runs GROUP BY doc_id, run_id),
       |gaps AS (SELECT doc_id, drop_start,
       |           coalesce(lag(drop_end) OVER (PARTITION BY doc_id
       |                      ORDER BY drop_start) + 1, 0) AS k_start
       |         FROM drops),
       |n AS (SELECT doc_id, CAST(len(t) AS INT) AS n_tok FROM tk),
       |le AS (SELECT doc_id, max(drop_end) AS last_end FROM drops GROUP BY 1),
       |spans AS (
       |  SELECT doc_id, drop_start AS span_start, drop_end AS span_end,
       |         'drop' AS action FROM drops
       |  UNION ALL
       |  SELECT doc_id, k_start, drop_start - 1, 'keep'
       |  FROM gaps WHERE k_start < drop_start
       |  UNION ALL
       |  SELECT n.doc_id, coalesce(last_end + 1, 0), n_tok - 1, 'keep'
       |  FROM n LEFT JOIN le USING (doc_id)
       |  WHERE coalesce(last_end + 1, 0) <= n_tok - 1)""".stripMargin
  }

  /** Full replay of TextOps.bpeMerges: the word-frequency base, then one
    * CTE block per training step — pair counts from the split symbol
    * string, argmax under the same (cnt DESC, lhs, rhs) total order,
    * leftmost-replace merge. Integer counts + string ops only: no float
    * hazard anywhere, so no fixture seam. */
  private def bpeMergesSql(steps: Int): String = {
    // every per-step CTE is MATERIALIZED: DuckDB inlines CTEs by
    // default, and the step-(i) bodies reference step-(i−1) several
    // times — inlining would expand the 10-step chain exponentially
    // (observed as "too many open files" on the base parquet scan)
    val base =
      s"""wf AS MATERIALIZED (
         |  SELECT word, count(*) AS n FROM (
         |    SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word
         |    FROM documents)
         |  GROUP BY 1),
         |v0 AS MATERIALIZED (
         |  SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), '  ')
         |           || ' ' AS sym, n
         |  FROM wf)""".stripMargin
    val blocks = (1 to steps).map { i =>
      val prev = s"v${i - 1}"
      s"""c$i AS MATERIALIZED (
         |  SELECT a[p.i] AS lhs, a[p.i + 1] AS rhs,
         |         CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(sym), '  ') AS a, n FROM $prev) t
         |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
         |    CAST(len(t.a) AS INT) - 1)) AS i) p
         |  GROUP BY 1, 2),
         |m$i AS MATERIALIZED (SELECT lhs, rhs, cnt FROM c$i
         |        ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |v$i AS MATERIALIZED (
         |  SELECT replace(sym, ' ' || m.lhs || '  ' || m.rhs || ' ',
         |                 ' ' || m.lhs || m.rhs || ' ') AS sym, n
         |  FROM $prev CROSS JOIN m$i m)""".stripMargin
    }
    val out = (1 to steps)
      .map(i => s"SELECT $i AS step, lhs, rhs, cnt AS freq FROM m$i")
      .mkString("\nUNION ALL\n")
    s"WITH $base,\n${blocks.mkString(",\n")}\n$out\nORDER BY step"
  }

  val oracleSql: Map[String, String] = Map(
    "q_bpe_merges" -> bpeMergesSql(BpeSteps),

    // identical start grid: multiples of step below length (empty docs
    // → the single start 0), substr 1-based in both engines, md5 over
    // the chunk's UTF-8 bytes
    "q_chunk_overlap" ->
      s"""WITH c AS (
         |  SELECT doc_id, text,
         |         unnest(range(0, greatest(1, length(text)), $ChunkStep)) AS s
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(s / $ChunkStep AS INT) AS chunk_idx,
         |       CAST(s AS INT) AS chunk_start,
         |       CAST(length(substr(text, CAST(s AS INT) + 1, $ChunkSize)) AS INT)
         |         AS chunk_len,
         |       md5(substr(text, CAST(s AS INT) + 1, $ChunkSize)) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_start""".stripMargin,

    "q_token_stats" ->
      s"""SELECT doc_id, length(text) AS n_chars,
         |       len(${toks("text")}) AS n_ws_tokens,
         |       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    // vocab re-derivation (total order on integer counts) + greedy
    // longest-match replay: per distinct pretoken, `adv(tok, pos)` = the
    // longest vocab gram matching at pos (equi-join on the extracted
    // substring) else 1, then a recursive walk sums segments per token.
    "q_bpe_subword" ->
      s"""WITH RECURSIVE
         |toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
         |  FROM documents),
         |glen AS (SELECT unnest([2, 3, 4]) AS l),
         |grams AS (
         |  SELECT substr(t.tok, p.pos, g.l) AS gram, count(*) AS cnt
         |  FROM toks t
         |  CROSS JOIN glen g
         |  CROSS JOIN LATERAL (SELECT unnest(generate_series(1,
         |    CAST(len(t.tok) AS INT) - (g.l - 1))) AS pos) p
         |  WHERE len(t.tok) >= g.l
         |  GROUP BY 1),
         |vocab AS (
         |  SELECT gram FROM grams ORDER BY cnt DESC, gram LIMIT $BpeVocabSize),
         |dtoks AS (SELECT DISTINCT tok FROM toks),
         |positions AS (
         |  SELECT tok, unnest(generate_series(1, CAST(len(tok) AS INT))) AS pos
         |  FROM dtoks),
         |cands AS (
         |  SELECT p.tok, p.pos, g.l AS alen, substr(p.tok, p.pos, g.l) AS g
         |  FROM positions p CROSS JOIN glen g
         |  WHERE p.pos + g.l - 1 <= len(p.tok)),
         |matched AS (
         |  SELECT c.tok, c.pos, max(c.alen) AS alen
         |  FROM cands c JOIN vocab v ON c.g = v.gram
         |  GROUP BY 1, 2),
         |adv AS (
         |  SELECT p.tok, p.pos, coalesce(m.alen, 1) AS adv
         |  FROM positions p
         |  LEFT JOIN matched m ON p.tok = m.tok AND p.pos = m.pos),
         |walk AS (
         |  SELECT tok, 1 AS pos, 0 AS cnt FROM dtoks
         |  UNION ALL
         |  SELECT w.tok, w.pos + a.adv, w.cnt + 1
         |  FROM walk w JOIN adv a ON a.tok = w.tok AND a.pos = w.pos
         |  WHERE w.pos <= len(w.tok)),
         |segc AS (SELECT tok, max(cnt) AS nseg FROM walk GROUP BY 1),
         |perdoc AS (
         |  SELECT t.doc_id, count(*) AS n_pre, sum(s.nseg) AS n_sub
         |  FROM toks t JOIN segc s ON t.tok = s.tok GROUP BY 1)
         |SELECT d.doc_id,
         |       CAST(coalesce(p.n_pre, 0) AS BIGINT) AS n_pretokens,
         |       CAST(coalesce(p.n_sub, 0) AS BIGINT) AS n_subword,
         |       round(CAST(coalesce(p.n_sub, 0) AS DOUBLE)
         |             / greatest(coalesce(p.n_pre, 0), 1), 6) AS subword_ratio
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // hashed-feature linear scorer replay: identical md5-prefix buckets
    // and integer milli-unit weights; the two divisions are exact-int →
    // double, so round-at-6 matches bit-for-bit.
    "q_quality_classifier" ->
      s"""WITH w AS (
         |  SELECT b AS bucket,
         |         CAST(concat('0x', substr(md5('qw_w:' || b), 1, 15)) AS BIGINT)
         |           % 2001 - 1000 AS w_milli
         |  FROM (SELECT unnest(range(0, $QClfDim)) AS b)),
         |toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
         |  FROM documents),
         |feat AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5('qw:' || tok), 1, 15)) AS BIGINT)
         |           % $QClfDim AS bucket
         |  FROM toks),
         |agg AS (
         |  SELECT f.doc_id, count(*) AS n_tokens,
         |         CAST(sum(w.w_milli) AS HUGEINT) AS s_milli
         |  FROM feat f JOIN w ON f.bucket = w.bucket GROUP BY 1),
         |mic AS (
         |  SELECT doc_id, n_tokens,
         |         CASE WHEN s_milli < 0
         |              THEN -((abs(s_milli) * 2000 + n_tokens) // (2 * n_tokens))
         |              ELSE (s_milli * 2000 + n_tokens) // (2 * n_tokens) END
         |           AS score_micro
         |  FROM agg)
         |SELECT doc_id, n_tokens,
         |       CAST(score_micro AS DOUBLE) / 1e6 AS score,
         |       CAST(score_micro >= 0 AS INT) AS keep
         |FROM mic ORDER BY doc_id""".stripMargin,

    // classifier replay + row_number over the heap's exact (om DESC,
    // doc_id ASC) total order; score re-derived from the SAME micro-unit
    // integer both engines rank on, so value agreement is by construction
    "q_source_quota" ->
      s"""WITH w AS (
         |  SELECT b AS bucket,
         |         CAST(concat('0x', substr(md5('qw_w:' || b), 1, 15)) AS BIGINT)
         |           % 2001 - 1000 AS w_milli
         |  FROM (SELECT unnest(range(0, $QClfDim)) AS b)),
         |toks AS (
         |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
         |  FROM documents),
         |feat AS (
         |  SELECT doc_id,
         |         CAST(concat('0x', substr(md5('qw:' || tok), 1, 15)) AS BIGINT)
         |           % $QClfDim AS bucket
         |  FROM toks),
         |agg AS (
         |  SELECT f.doc_id, count(*) AS n_tokens,
         |         CAST(sum(w.w_milli) AS HUGEINT) AS s_milli
         |  FROM feat f JOIN w ON f.bucket = w.bucket GROUP BY 1),
         |om AS (
         |  -- exact-integer micro score, the same HALF_UP formula the
         |  -- engine ranks on (ResampleOps.microMeanHalfUp)
         |  SELECT a.doc_id, d.source,
         |         CAST(CASE WHEN a.s_milli < 0
         |              THEN -((abs(a.s_milli) * 2000 + a.n_tokens)
         |                     // (2 * a.n_tokens))
         |              ELSE (a.s_milli * 2000 + a.n_tokens)
         |                   // (2 * a.n_tokens) END AS BIGINT) AS om
         |  FROM agg a JOIN documents d USING (doc_id)),
         |rk AS (
         |  SELECT source, doc_id, om,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY om DESC, doc_id ASC) AS rank
         |  FROM om)
         |SELECT source, rank, doc_id,
         |       round(CAST(om AS DOUBLE) / 1000000.0, 6) AS score
         |FROM rk WHERE rank <= $QuotaK ORDER BY source, rank""".stripMargin,

    "q_text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text, ${toks("lower(text)")} AS toks,
         |         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |           / greatest(length(text), 1) AS praw,
         |         CAST(len(list_filter(${toks("lower(text)")},
         |              x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE) AS nstop
         |  FROM documents)
         |SELECT doc_id,
         |       round(praw, 6) AS punct_ratio,
         |       round(nstop / greatest(len(toks), 1), 6) AS stopword_ratio,
         |       round(least(CAST(len(toks) AS DOUBLE) / 256.0, 1.0)
         |             * (1.0 - praw)
         |             * least(nstop / greatest(CAST(len(toks) AS DOUBLE), 1.0) * 5.0, 1.0),
         |             6) AS quality_score
         |FROM t ORDER BY doc_id""".stripMargin,

    // the q_langid prediction CASE → contingency rollup → exact rates
    "q_lang_confusion" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, ${toks("lower(text)")} AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS zh,
         |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS en,
         |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','ein'))) AS de,
         |    len(list_filter(toks, x -> x IN ('el','la','los','que','y','es','un'))) AS es,
         |    len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une'))) AS fr
         |  FROM t),
         |p AS (
         |  SELECT lang AS actual,
         |         CASE WHEN zh > 0 THEN 'zh'
         |              WHEN en + de + es + fr = 0 THEN 'und'
         |              WHEN en >= de AND en >= es AND en >= fr THEN 'en'
         |              WHEN de >= es AND de >= fr THEN 'de'
         |              WHEN es >= fr THEN 'es'
         |              ELSE 'fr' END AS predicted
         |  FROM c),
         |cells AS (
         |  SELECT actual, predicted, count(*) AS n FROM p GROUP BY 1, 2),
         |tot AS (
         |  SELECT actual, CAST(sum(n) AS BIGINT) AS n_actual
         |  FROM cells GROUP BY 1)
         |SELECT c.actual, c.predicted, c.n,
         |       round(CAST(c.n AS DOUBLE) / t.n_actual, 6) AS frac,
         |       (c.actual = c.predicted) AS correct
         |FROM cells c JOIN tot t ON c.actual = t.actual
         |ORDER BY 1, 2""".stripMargin,

    // the corpus-clean dedup machinery replayed per source: exact-keep
    // via text groups, near-dup losers via the class-based CC prelude,
    // exact-integer survival rates. The exact-dedup keepers ARE the
    // prelude's class reps (min doc_id per distinct text), so the
    // class-level edge set/components equal the keeper-level near-dup
    // graph of the naive replay verbatim — no doc-level expansion needed.
    "q_dedup_rate" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()},
        |losers AS (SELECT rep AS doc_id FROM ccomp WHERE rep <> comp),
        |ek AS (
        |  SELECT c.rep AS doc_id, d.source
        |  FROM cls c JOIN documents d ON d.doc_id = c.rep),
        |nk AS (SELECT doc_id, source FROM ek
        |       WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |bys AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |exb AS (SELECT source, count(*) AS n_exact FROM ek GROUP BY 1),
        |nkb AS (SELECT source, count(*) AS n_clean FROM nk GROUP BY 1)
        |SELECT b.source, b.n_docs,
        |       CAST(coalesce(e.n_exact, 0) AS BIGINT) AS n_exact,
        |       CAST(coalesce(k.n_clean, 0) AS BIGINT) AS n_clean,
        |       round(CAST(coalesce(k.n_clean, 0) AS DOUBLE) / b.n_docs, 6)
        |         AS survival_rate
        |FROM bys b
        |LEFT JOIN exb e ON b.source = e.source
        |LEFT JOIN nkb k ON b.source = k.source
        |ORDER BY 1""".stripMargin,

    "q_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text, ${toks("lower(text)")} AS toks FROM documents),
         |c AS (
         |  SELECT doc_id, lang,
         |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS zh,
         |    len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is'))) AS en,
         |    len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','ein'))) AS de,
         |    len(list_filter(toks, x -> x IN ('el','la','los','que','y','es','un'))) AS es,
         |    len(list_filter(toks, x -> x IN ('le','la','les','et','est','un','une'))) AS fr
         |  FROM t)
         |SELECT doc_id, lang,
         |       CASE WHEN zh > 0 THEN 'zh'
         |            WHEN en + de + es + fr = 0 THEN 'und'
         |            WHEN en >= de AND en >= es AND en >= fr THEN 'en'
         |            WHEN de >= es AND de >= fr THEN 'de'
         |            WHEN es >= fr THEN 'es'
         |            ELSE 'fr' END AS predicted_lang
         |FROM c ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      s"""WITH t AS (
         |  SELECT doc_id, md5(text) AS fp_full, ${toks("lower(text)")} AS tk
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, fp_full,
         |         CASE WHEN len(tk) >= 3
         |              THEN list_distinct(list_transform(generate_series(1, len(tk) - 2),
         |                     i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
         |              ELSE [] END AS gs
         |  FROM t)
         |SELECT doc_id, fp_full,
         |       list_min(list_transform(gs, g -> substr(md5(g), 1, 16))) AS fp_shingle_min
         |FROM sh ORDER BY doc_id""".stripMargin,

    "q_compress_ratio" ->
      s"""SELECT doc_id, raw_len, comp_len,
         |       round(CAST(comp_len AS DOUBLE) / nullif(raw_len, 0), 6) AS ratio,
         |       CASE
         |         WHEN raw_len = 0 THEN 'empty'
         |         WHEN round(CAST(comp_len AS DOUBLE) / raw_len, 6) < 0.3
         |           THEN 'repetitive'
         |         WHEN round(CAST(comp_len AS DOUBLE) / raw_len, 6) <= 0.55
         |           THEN 'normal'
         |         ELSE 'incompressible' END AS bucket
         |FROM read_parquet('${sqlPath("compress_stats")}')
         |ORDER BY doc_id""".stripMargin,

    "q_repetition_filter" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS tk FROM documents),
         |g AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(1, len(tk) - 2),
         |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) AS grams
         |  FROM t WHERE len(tk) >= 3)
         |SELECT doc_id, len(grams) AS n_grams,
         |       len(list_distinct(grams)) AS n_distinct,
         |       round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6)
         |         AS rep_ratio,
         |       CAST(round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6) > 0.2
         |            AS INT) AS flagged
         |FROM g WHERE len(grams) >= 3
         |ORDER BY doc_id""".stripMargin,

    "q_train_split" ->
      """SELECT doc_id,
        |       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'f'
        |            THEN 'val' ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_winnow_fingerprints" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t) - 2)) AS pos,
         |         t AS toks
         |  FROM tk WHERE len(t) >= 3),
         |hashed AS (
         |  SELECT doc_id, pos,
         |         substr(md5(toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2]), 1, 16) AS h
         |  FROM grams),
         |sel AS (
         |  SELECT doc_id,
         |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
         |  FROM hashed)
         |SELECT DISTINCT doc_id, fingerprint FROM sel
         |ORDER BY doc_id, fingerprint""".stripMargin,

    // same fingerprint pipeline as q_winnow_fingerprints, then df-capped
    // posting self-join and the shared-count filter
    "q_winnow_overlap" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(generate_series(1, len(t) - 2)) AS pos,
         |         t AS toks
         |  FROM tk WHERE len(t) >= 3),
         |hashed AS (
         |  SELECT doc_id, pos,
         |         substr(md5(toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2]), 1, 16) AS h
         |  FROM grams),
         |sel AS (
         |  SELECT doc_id,
         |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fingerprint
         |  FROM hashed),
         |fps AS (SELECT DISTINCT doc_id, fingerprint FROM sel),
         |dfreq AS (
         |  SELECT fingerprint FROM fps GROUP BY fingerprint
         |  HAVING count(*) <= 20),
         |kept AS (SELECT f.doc_id, f.fingerprint FROM fps f JOIN dfreq USING (fingerprint))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
         |FROM kept a JOIN kept b
         |  ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY doc_a, doc_b""".stripMargin,

    "q_tfidf_keywords" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
         |tf AS (
         |  SELECT doc_id, term, count(*) AS tf FROM tokens GROUP BY 1, 2),
         |dfreq AS (
         |  SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, tf.term AS term, tf,
         |         round(tf * ln((SELECT count(*) FROM documents) / df), 4) AS tfidf
         |  FROM tf JOIN dfreq ON tf.term = dfreq.term),
         |ranked AS (
         |  SELECT doc_id, term, tfidf,
         |         row_number() OVER (PARTITION BY doc_id
         |                            ORDER BY tfidf DESC, term) AS rank
         |  FROM scored)
         |SELECT doc_id, rank, term, tfidf FROM ranked WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    "q_unigram_logprob" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(${toks("lower(text)")}) AS term FROM documents),
         |tf AS (SELECT term, count(*) AS n_term FROM tokens GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_term) AS DOUBLE) AS n_total FROM tf)
         |SELECT doc_id, count(*) AS n_tokens,
         |       round(avg(-ln(n_term / n_total)), 6) AS avg_neg_logprob
         |FROM tokens JOIN tf USING (term) CROSS JOIN tot
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical hashing to the Spark side (md5 of the same UTF-8 bytes,
    // first 15 hex digits as BIGINT, mod 256) and identical integer-micro
    // accumulation of the 6-decimal-rounded log-ratio
    "q_dsir_weights" ->
      s"""WITH tokens AS (
         |  SELECT doc_id,
         |         CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END AS is_target,
         |         unnest(${toks("lower(text)")}) AS term
         |  FROM documents),
         |bk AS (
         |  SELECT doc_id, is_target,
         |         CAST(concat('0x', substr(md5('dsir:' || term), 1, 15)) AS BIGINT)
         |           % 256 AS b
         |  FROM tokens),
         |counts AS (
         |  SELECT b, count(*) AS rc, sum(is_target) AS tc FROM bk GROUP BY b),
         |tot AS (SELECT sum(rc) AS r_tot, sum(tc) AS t_tot FROM counts),
         |lam AS (
         |  SELECT b, CAST(round(round(
         |      ln(CAST(tc + 1 AS DOUBLE) / CAST(t_tot + 256 AS DOUBLE)) -
         |      ln(CAST(rc + 1 AS DOUBLE) / CAST(r_tot + 256 AS DOUBLE)),
         |      6) * 1e6) AS BIGINT) AS lam_micro
         |  FROM counts CROSS JOIN tot)
         |SELECT doc_id, count(*) AS n_tokens,
         |       CAST(sum(lam_micro) AS DOUBLE) / 1e6 AS log_weight
         |FROM bk JOIN lam USING (b)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_pii_scrub" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(text, 'https?://[^ \t\n\f\r]+')) AS n_urls,
        |  md5(regexp_replace(regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      'https?://[^ \t\n\f\r]+', '[URL]', 'g')) AS scrubbed_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id,
        |         CASE WHEN n_chars >= 500 THEN 3
        |              WHEN n_chars >= 250 THEN 2 ELSE 1 END AS w
        |  FROM documents),
        |e AS (SELECT doc_id, w, unnest(range(0, w)) AS j FROM w),
        |h AS (SELECT doc_id, w,
        |        CAST(concat('0x', substr(md5('wrs:' || doc_id || ':' || j), 1, 15))
        |          AS BIGINT) AS hk
        |      FROM e),
        |m AS (SELECT doc_id, any_value(w) AS w, min(hk) AS key
        |      FROM h GROUP BY doc_id)
        |SELECT doc_id, w, key FROM m ORDER BY key LIMIT 32""".stripMargin,

    // top-100 by (n DESC, term), rounded logs → HUGEINT micro moments,
    // identical closed-form chain
    "q_zipf_fit" ->
      s"""WITH tc AS (
         |  SELECT t AS term, count(*) AS n FROM (
         |    SELECT unnest(${toks("lower(text)")}) AS t FROM documents)
         |  GROUP BY 1),
         |top AS (SELECT term, n FROM tc ORDER BY n DESC, term LIMIT 100),
         |pts AS (
         |  SELECT CAST(round(round(ln(CAST(row_number() OVER (
         |             ORDER BY n DESC, term) AS DOUBLE)), 6) * 1e6, 0)
         |           AS HUGEINT) AS lx,
         |         CAST(round(round(ln(CAST(n AS DOUBLE)), 6) * 1e6, 0)
         |           AS HUGEINT) AS ly
         |  FROM top),
         |m AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS k,
         |         sum(lx) AS sx, sum(ly) AS sy,
         |         sum(lx*lx) AS sxx, sum(lx*ly) AS sxy, sum(ly*ly) AS syy
         |  FROM pts)
         |SELECT CAST(k AS BIGINT) AS n_terms,
         |       round(CAST(k*sxy - sx*sy AS DOUBLE)
         |             / CAST(k*sxx - sx*sx AS DOUBLE), 6) AS slope,
         |       round(pow(CAST(k*sxy - sx*sy AS DOUBLE), 2)
         |             / (CAST(k*sxx - sx*sx AS DOUBLE)
         |              * CAST(k*syy - sy*sy AS DOUBLE)), 6) AS r2
         |FROM m""".stripMargin,

    // identical integer counts + the same micro-rounded per-doc F
    "q_readability" ->
      s"""WITH f AS (
         |  SELECT lang, ${toks("lower(text)")} AS t,
         |         greatest(1, len(regexp_extract_all(text, '[.!?]+')))
         |           AS sent
         |  FROM documents),
         |c AS (
         |  SELECT lang,
         |         CAST(len(t) AS BIGINT) AS w,
         |         CAST(list_sum(list_transform(t, x ->
         |           greatest(1, len(regexp_extract_all(x, '[aeiouy]+')))))
         |           AS BIGINT) AS syl,
         |         CAST(sent AS BIGINT) AS sent
         |  FROM f WHERE len(t) > 0),
         |m AS (
         |  SELECT lang,
         |         CAST(round((206.835
         |           - 1.015 * (CAST(w AS DOUBLE) / sent)
         |           - 84.6 * (CAST(syl AS DOUBLE) / w)) * 1e6, 0)
         |           AS BIGINT) AS fm
         |  FROM c)
         |SELECT lang, count(*) AS n_docs,
         |       round(CAST(sum(fm) AS DOUBLE) / count(*) / 1e6, 6)
         |         AS mean_flesch,
         |       round(CAST(min(fm) AS DOUBLE) / 1e6, 6) AS min_flesch,
         |       round(CAST(max(fm) AS DOUBLE) / 1e6, 6) AS max_flesch
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
        |gen AS (
        |  SELECT lang, CASE WHEN n < 5 THEN '*' ELSE source END AS source_anon, n
        |  FROM g)
        |SELECT lang, source_anon, CAST(sum(n) AS BIGINT) AS n,
        |       sum(n) >= 5 AS k_ok
        |FROM gen GROUP BY 1, 2 ORDER BY lang, source_anon""".stripMargin,

    "q_contamination" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
         |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM tk WHERE len(t) >= 3),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |ev AS (SELECT DISTINCT g FROM ex WHERE doc_id % 100 = 0),
         |cnt AS (SELECT doc_id, len(s) AS n_shingles FROM sh),
         |shr AS (
         |  SELECT ex.doc_id, count(*) AS n_shared
         |  FROM ex WHERE g IN (SELECT g FROM ev) GROUP BY ex.doc_id)
         |SELECT cnt.doc_id, cnt.n_shingles,
         |       CAST(coalesce(shr.n_shared, 0) AS BIGINT) AS n_shared,
         |       CAST(coalesce(shr.n_shared, 0) * 2 >= cnt.n_shingles AS INT)
         |         AS contaminated
         |FROM cnt LEFT JOIN shr ON cnt.doc_id = shr.doc_id
         |ORDER BY cnt.doc_id""".stripMargin,

    "q_mix_weights" ->
      s"""WITH per AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(len(${toks("text")})) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |w AS (
         |  SELECT *, CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
         |              AS s_micro
         |  FROM per),
         |tot AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
         |         CAST(sum(s_micro) AS BIGINT) AS tot_micro
         |  FROM w)
         |SELECT source, n_docs, n_tokens,
         |       round(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS p_raw,
         |       round(CAST(s_micro AS DOUBLE) / tot_micro, 6) AS w_temp,
         |       round(CAST(s_micro AS DOUBLE) / tot_micro
         |             * tot_tokens / n_tokens, 6) AS eff_epochs
         |FROM w CROSS JOIN tot ORDER BY source""".stripMargin,

    "q_source_mixture" ->
      """SELECT source, count(*) AS n_total,
        |  CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |    (CASE WHEN TRY_CAST(NULLIF(regexp_extract(source, '\d+'), '') AS INT) % 2 = 0
        |          THEN 'c0' ELSE '40' END)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_corpus_clean" ->
      s"""WITH RECURSIVE exact_keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |d AS (
         |  SELECT * FROM documents WHERE doc_id IN (SELECT doc_id FROM exact_keep)),
         |tk AS (SELECT doc_id, ${toks("lower(text)")} AS t FROM d),
         |sh AS (
         |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
         |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
         |  FROM tk WHERE len(t) >= 3),
         |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         |cnt AS (SELECT doc_id, len(s) AS n FROM sh),
         |prs AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |edges AS (
         |  SELECT id_a, id_b FROM prs
         |  JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.8),
         |bidir AS (
         |  SELECT id_a AS src, id_b AS dst FROM edges
         |  UNION ALL SELECT id_b, id_a FROM edges),
         |reach AS (
         |  SELECT src, dst FROM bidir
         |  UNION
         |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
         |  WHERE r.src <> b.dst),
         |members AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |losers AS (SELECT doc_id FROM members WHERE doc_id <> cluster_id),
         |kept AS (
         |  SELECT * FROM d WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
         |feat AS (
         |  SELECT doc_id, text, ${toks("text")} AS wtoks, ${toks("lower(text)")} AS ltoks
         |  FROM kept),
         |c AS (
         |  SELECT doc_id, len(wtoks) AS n_tokens,
         |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS zh,
         |    len(list_filter(ltoks, x -> x IN ('the','a','of','and','to','in','is'))) AS en,
         |    len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist','nicht','ein'))) AS de,
         |    len(list_filter(ltoks, x -> x IN ('el','la','los','que','y','es','un'))) AS es,
         |    len(list_filter(ltoks, x -> x IN ('le','la','les','et','est','un','une'))) AS fr
         |  FROM feat),
         |lp AS (
         |  SELECT doc_id, n_tokens,
         |         CASE WHEN zh > 0 THEN 'zh'
         |              WHEN en + de + es + fr = 0 THEN 'und'
         |              WHEN en >= de AND en >= es AND en >= fr THEN 'en'
         |              WHEN de >= es AND de >= fr THEN 'de'
         |              WHEN es >= fr THEN 'es'
         |              ELSE 'fr' END AS lang_pred
         |  FROM c)
         |SELECT doc_id, n_tokens, lang_pred FROM lp
         |WHERE n_tokens >= 50 AND lang_pred <> 'und'
         |ORDER BY doc_id""".stripMargin,

    // Replays the ENTIRE post-hash pipeline over the Spark-written fixtures:
    // band bucketing (band content compared, ≡ the engine's xxhash64 bucket
    // modulo collisions) → candidate join → exact Jaccard verify →
    // connected components → exact-keeper + near-dup-loser gates.
    "q_corpus_clean_lsh" ->
      s"""WITH RECURSIVE
         |sigs AS (SELECT * FROM read_parquet('${sqlPath("clean_minhash_sigs")}')),
         |ex AS (SELECT * FROM read_parquet('${sqlPath("clean_minhash_shingles")}')),
         |banded AS (
         |  SELECT doc_id, unnest(range(0, 32)) AS band, sig FROM sigs),
         |bb AS (
         |  SELECT doc_id, band,
         |         array_to_string(list_slice(sig, CAST(band AS INT) * 4 + 1,
         |                                    CAST(band AS INT) * 4 + 4), ',') AS bucket
         |  FROM banded),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |cnt AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY 1),
         |shr AS (
         |  SELECT id_a, id_b, count(*) AS shared
         |  FROM cand
         |  JOIN ex ea ON ea.doc_id = id_a
         |  JOIN ex eb ON eb.doc_id = id_b AND ea.gh = eb.gh
         |  GROUP BY 1, 2),
         |edges AS (
         |  SELECT id_a, id_b FROM shr
         |  JOIN cnt ca ON id_a = ca.doc_id JOIN cnt cb ON id_b = cb.doc_id
         |  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= 0.8),
         |bidir AS (
         |  SELECT id_a AS src, id_b AS dst FROM edges
         |  UNION ALL SELECT id_b, id_a FROM edges),
         |reach AS (
         |  SELECT src, dst FROM bidir
         |  UNION
         |  SELECT r.src, b.dst FROM reach r JOIN bidir b ON r.dst = b.src
         |  WHERE r.src <> b.dst),
         |members AS (
         |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |  FROM reach GROUP BY src),
         |losers AS (SELECT doc_id FROM members WHERE doc_id <> cluster_id),
         |exact_keep AS (
         |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |kept AS (
         |  SELECT * FROM documents
         |  WHERE doc_id IN (SELECT doc_id FROM exact_keep)
         |    AND doc_id NOT IN (SELECT doc_id FROM losers)),
         |feat AS (
         |  SELECT doc_id, text, ${toks("text")} AS wtoks, ${toks("lower(text)")} AS ltoks
         |  FROM kept),
         |c AS (
         |  SELECT doc_id, len(wtoks) AS n_tokens,
         |    length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) AS zh,
         |    len(list_filter(ltoks, x -> x IN ('the','a','of','and','to','in','is'))) AS en,
         |    len(list_filter(ltoks, x -> x IN ('der','die','und','das','ist','nicht','ein'))) AS de,
         |    len(list_filter(ltoks, x -> x IN ('el','la','los','que','y','es','un'))) AS es,
         |    len(list_filter(ltoks, x -> x IN ('le','la','les','et','est','un','une'))) AS fr
         |  FROM feat),
         |lp AS (
         |  SELECT doc_id, n_tokens,
         |         CASE WHEN zh > 0 THEN 'zh'
         |              WHEN en + de + es + fr = 0 THEN 'und'
         |              WHEN en >= de AND en >= es AND en >= fr THEN 'en'
         |              WHEN de >= es AND de >= fr THEN 'de'
         |              WHEN es >= fr THEN 'es'
         |              ELSE 'fr' END AS lang_pred
         |  FROM c)
         |SELECT doc_id, n_tokens, lang_pred FROM lp
         |WHERE n_tokens >= 50 AND lang_pred <> 'und'
         |ORDER BY doc_id""".stripMargin,

    "q_bigram_logprob" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
         |           i -> t[i] || ' ' || t[i+1])) AS bg
         |  FROM tk WHERE len(t) >= 2),
         |bc AS (SELECT bg, count(*) AS n_bg FROM bg GROUP BY 1),
         |pc AS (SELECT split_part(bg, ' ', 1) AS w1,
         |              CAST(sum(n_bg) AS BIGINT) AS n_prefix
         |       FROM bc GROUP BY 1)
         |SELECT doc_id, count(*) AS n_bigrams,
         |       round(avg(-ln(CAST(n_bg AS DOUBLE) / n_prefix)), 6)
         |         AS avg_neg_logprob
         |FROM bg JOIN bc USING (bg)
         |JOIN pc ON split_part(bg.bg, ' ', 1) = pc.w1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // identical shard/window arithmetic to TextOps.packSequences
    // (2^40 = 1099511627776 disambiguates sequence ids across shards)
    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(${toks("lower(text)")}) AS n_tokens,
         |         doc_id % 8 AS shard
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tokens,
         |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |              AS BIGINT) AS cum_end
         |  FROM t)
         |SELECT doc_id, CAST(shard AS INT) AS shard, CAST(n_tokens AS INT) AS n_tokens,
         |       shard * 1099511627776 +
         |         CAST(floor((cum_end - n_tokens) / 2048.0) AS BIGINT) AS seq_start,
         |       (cum_end - n_tokens) % 2048 AS seq_offset,
         |       shard * 1099511627776 + greatest(
         |         CAST(floor((cum_end - n_tokens) / 2048.0) AS BIGINT),
         |         CAST(floor((cum_end - 1) / 2048.0) AS BIGINT)) AS seq_end
         |FROM c ORDER BY doc_id""".stripMargin,

    // ((x % 3) + 3) % 3 mirrors Spark's pmod for the null→-1 sentinel;
    // TRY_CAST so a digit-less source follows the same ELSE branch
    "q_mix_sample" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         instr('0123456789abcdef',
        |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib,
        |         coalesce(TRY_CAST(regexp_extract(source, '\d+') AS INT), -1)
        |           AS srcnum
        |  FROM documents)
        |SELECT doc_id, source,
        |       CAST(nib < (CASE ((srcnum % 3) + 3) % 3
        |                   WHEN 0 THEN 16 WHEN 1 THEN 8 ELSE 4 END) AS INT)
        |         AS kept
        |FROM d ORDER BY doc_id""".stripMargin,

    // generate_series fan-out = explode(sequence) semantics
    "q_upsample" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |         CASE WHEN len(${toks("text")}) >= 60 THEN 'long'
         |              WHEN len(${toks("text")}) >= 30 THEN 'mid'
         |              ELSE 'short' END AS bucket,
         |         instr('0123456789abcdef',
         |               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib
         |  FROM documents),
         |w AS (
         |  SELECT bucket,
         |         CASE bucket WHEN 'long' THEN 3
         |              WHEN 'mid' THEN 1 + CASE WHEN nib < 8 THEN 1 ELSE 0 END
         |              ELSE 0 END AS w
         |  FROM d),
         |rep AS (
         |  SELECT bucket, unnest(generate_series(1, w)) AS epoch
         |  FROM w WHERE w > 0)
         |SELECT bucket, CAST(epoch AS INT) AS epoch, count(*) AS n_docs
         |FROM rep GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // NOT EXISTS (not NOT IN) mirrors left_anti's null-key semantics
    "q_cross_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, text,
        |         coalesce(TRY_CAST(regexp_extract(source, '\d+') AS INT), -1)
        |           AS sn
        |  FROM documents),
        |a AS (SELECT DISTINCT md5(text) AS h FROM d WHERE sn >= 0 AND sn < 10),
        |b AS (SELECT doc_id, source, md5(text) AS h FROM d WHERE sn >= 10)
        |SELECT doc_id, source FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM a WHERE a.h = b.h)
        |ORDER BY doc_id""".stripMargin,

    // the bounded-heap aggregate replaces only the execution strategy —
    // the window formulation IS the oracle
    "q_strat_sample" -> StratSampleSql,

    // the q_strat_sample rank replay picks the sample; HUGEINT moments,
    // identical closed-form z chain
    "q_sample_bias" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
        |              AS BIGINT) AS hv
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY hv, doc_id) AS rank
        |  FROM d),
        |smp AS (
        |  SELECT source, count(*) AS ns,
        |         CAST(sum(n_chars) AS HUGEINT) AS ss
        |  FROM r WHERE rank <= 5 GROUP BY 1),
        |pop AS (
        |  SELECT source, CAST(count(*) AS HUGEINT) AS np,
        |         CAST(sum(n_chars) AS HUGEINT) AS sp,
        |         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT))
        |           AS spp
        |  FROM d GROUP BY 1)
        |SELECT s.source, s.ns AS n_sample,
        |       round(CAST(s.ss AS DOUBLE) / CAST(s.ns AS DOUBLE), 6)
        |         AS mean_sample,
        |       round(CAST(p.sp AS DOUBLE) / CAST(p.np AS DOUBLE), 6)
        |         AS mean_pop,
        |       round((CAST(s.ss AS DOUBLE) / CAST(s.ns AS DOUBLE)
        |              - CAST(p.sp AS DOUBLE) / CAST(p.np AS DOUBLE))
        |             * sqrt(CAST(s.ns AS DOUBLE))
        |             / sqrt(CAST(p.np * p.spp - p.sp * p.sp AS DOUBLE)
        |                    / CAST(p.np * p.np AS DOUBLE)), 6) AS z
        |FROM smp s JOIN pop p ON s.source = p.source
        |ORDER BY 1""".stripMargin,

    // streamed state ≡ batch aggregate (bottom-k of a set is
    // split-invariant) → one oracle for both
    "q_stream_sample" -> StratSampleSql,

    // first-occurrence collapse + broadcast bounds, replayed; ceil in
    // the same double math
    "q_heaps_law" ->
      s"""WITH m AS (SELECT max(doc_id) + 1 AS m FROM documents),
         |b AS (
         |  SELECT g.q, CAST(ceil(m.m * g.q / 4.0) AS BIGINT) AS b
         |  FROM m CROSS JOIN
         |       (SELECT unnest(generate_series(1, 4)) AS q) g),
         |ds AS (
         |  SELECT doc_id, len(${toks("lower(text)")}) AS n_tok
         |  FROM documents),
         |pd AS (
         |  SELECT b.q, count(*) AS n_docs,
         |         CAST(sum(ds.n_tok) AS BIGINT) AS n_tokens
         |  FROM ds JOIN b ON ds.doc_id < b.b GROUP BY 1),
         |tk AS (
         |  SELECT doc_id, unnest(${toks("lower(text)")}) AS term
         |  FROM documents),
         |fi AS (SELECT term, min(doc_id) AS fid FROM tk GROUP BY 1),
         |vc AS (
         |  SELECT b.q, count(*) AS vocab
         |  FROM fi JOIN b ON fi.fid < b.b GROUP BY 1)
         |SELECT pd.q, pd.n_docs, pd.n_tokens, vc.vocab
         |FROM pd JOIN vc USING (q) ORDER BY q""".stripMargin,

    "q_vocab_oov" ->
      s"""WITH tokens AS (
         |  SELECT source, unnest(${toks("lower(text)")}) AS term FROM documents),
         |vocab AS (
         |  SELECT term FROM tokens GROUP BY term
         |  ORDER BY count(*) DESC, term LIMIT 200),
         |m AS (
         |  SELECT source, count(*) AS n_tokens,
         |         CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_oov
         |  FROM tokens t LEFT JOIN vocab v ON t.term = v.term
         |  GROUP BY source)
         |SELECT source, n_tokens, n_oov,
         |       CAST(${OracleSql.ratioHalfUpSql(
                  "CAST(n_oov AS HUGEINT) * 1000000", "n_tokens")}
         |         AS DOUBLE) / 1e6 AS oov_rate
         |FROM m ORDER BY source""".stripMargin,

    // identical key/shard/rank arithmetic to the Spark side: md5 of the
    // same UTF-8 bytes, first 15 hex digits as BIGINT, % 8 shard, rank
    // within shard
    "q_epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)),
        |              1, 15)) AS BIGINT) AS hv
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, hv, CAST(hv % 8 AS INT) AS shard FROM k)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |                               ORDER BY hv, doc_id) AS INT) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,

    // identical floor-of-double chunk-count arithmetic; all-integer output
    "q_chunk_windows" ->
      s"""WITH t AS (
         |  SELECT doc_id, len(${toks("lower(text)")}) AS n FROM documents),
         |c AS (
         |  SELECT doc_id, n,
         |         CAST(floor((greatest(n - 32, 0) + 23) / 24.0) + 1 AS INT)
         |           AS n_chunks
         |  FROM t WHERE n > 0),
         |e AS (
         |  SELECT doc_id, n, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
         |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         |       CAST(chunk_idx * 24 AS INT) AS start_tok,
         |       CAST(least(32, n - chunk_idx * 24) AS INT) AS n_tok
         |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    // same md5Key64 recipe (15 hex digits → BIGINT) over the pair string
    "q_neg_sample" ->
      """WITH a AS (
        |  SELECT doc_id AS anchor_id FROM documents
        |  WHERE doc_id % 50 = 0 AND doc_id < 2000),
        |p AS (
        |  SELECT a.anchor_id, d.doc_id AS neg_id,
        |         CAST(concat('0x', substr(md5(
        |           CAST(a.anchor_id AS VARCHAR) || ':' ||
        |           CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM a JOIN documents d ON a.anchor_id <> d.doc_id),
        |r AS (
        |  SELECT anchor_id, neg_id, hv,
        |         row_number() OVER (PARTITION BY anchor_id
        |                            ORDER BY hv, neg_id) AS rank
        |  FROM p)
        |SELECT anchor_id, CAST(rank AS INT) AS rank, neg_id, hv
        |FROM r WHERE rank <= 5 ORDER BY anchor_id, rank""".stripMargin,

    // identical integer-count → double formula per row; no float sums
    "q_drift_terms" ->
      s"""WITH tokens AS (
         |  SELECT source, unnest(${toks("lower(text)")}) AS term FROM documents),
         |tc AS (SELECT source, term, count(*) AS n_st FROM tokens GROUP BY 1, 2),
         |st AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s FROM tc GROUP BY 1),
         |tt AS (SELECT term, CAST(sum(n_st) AS BIGINT) AS n_t FROM tc GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_st) AS BIGINT) AS n FROM tc),
         |scored AS (
         |  SELECT tc.source, tc.term, tc.n_st,
         |         round((CAST(tc.n_st AS DOUBLE) / n_s) *
         |               ln((CAST(tc.n_st AS DOUBLE) / n_s) /
         |                  (CAST(n_t AS DOUBLE) / n)), 6) AS contrib
         |  FROM tc JOIN st USING (source) JOIN tt USING (term) CROSS JOIN tot
         |  WHERE tc.n_st >= 5),
         |r AS (
         |  SELECT source, term, n_st, contrib,
         |         row_number() OVER (PARTITION BY source
         |                            ORDER BY contrib DESC, term) AS rank
         |  FROM scored)
         |SELECT source, CAST(rank AS INT) AS rank, term, n_st, contrib
         |FROM r WHERE rank <= 5 ORDER BY source, rank""".stripMargin,

    "q_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT doc_id, ${toks("text")} AS tr, ${toks("lower(text)")} AS tl,
         |         string_split(text, chr(10)) AS ls, text
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, len(tr) AS n_words,
         |    round(CAST(list_sum(list_transform(tr, x -> length(x))) AS DOUBLE)
         |          / greatest(len(tr), 1), 6) AS mean_word_len,
         |    round(CAST(len(list_filter(tr, x -> regexp_matches(x, '[A-Za-z]')))
         |          AS DOUBLE) / greatest(len(tr), 1), 6) AS alpha_frac,
         |    round(CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)
         |          / greatest(len(tr), 1), 6) AS symbol_ratio,
         |    (CAST(list_contains(tl, 'the') AS INT) +
         |     CAST(list_contains(tl, 'be') AS INT) +
         |     CAST(list_contains(tl, 'to') AS INT) +
         |     CAST(list_contains(tl, 'of') AS INT) +
         |     CAST(list_contains(tl, 'and') AS INT) +
         |     CAST(list_contains(tl, 'that') AS INT) +
         |     CAST(list_contains(tl, 'have') AS INT) +
         |     CAST(list_contains(tl, 'with') AS INT)) AS n_stop_terms,
         |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '^\\s*[-*•]')))
         |          AS DOUBLE) / greatest(len(ls), 1), 6) AS bullet_frac,
         |    round(CAST(len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.$$')))
         |          AS DOUBLE) / greatest(len(ls), 1), 6) AS ellipsis_frac
         |  FROM t)
         |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
         |       alpha_frac, symbol_ratio, n_stop_terms, bullet_frac,
         |       ellipsis_frac,
         |       CAST(n_words BETWEEN 50 AND 100000
         |            AND mean_word_len BETWEEN 3.0 AND 10.0
         |            AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
         |            AND n_stop_terms >= 2 AND bullet_frac <= 0.9
         |            AND ellipsis_frac <= 0.3 AS INT) AS pass_gopher
         |FROM m ORDER BY doc_id""".stripMargin,

    // full replay of the ExactSubstr pipeline: L-gram md5s, global
    // occurrence count, interval merge, complement spans — md5 and list
    // slicing replay exactly, no fixture needed (shared CTE chain below)
    "q_substr_dedup" ->
      s"""${substrSpansCte(keepFirst = false)}
         |SELECT doc_id, CAST(span_start AS INT) AS span_start,
         |       CAST(span_end AS INT) AS span_end, action
         |FROM spans ORDER BY doc_id, span_start, action""".stripMargin,

    "q_substr_keep1" ->
      s"""${substrSpansCte(keepFirst = true)}
         |SELECT doc_id, CAST(span_start AS INT) AS span_start,
         |       CAST(span_end AS INT) AS span_end, action
         |FROM spans ORDER BY doc_id, span_start, action""".stripMargin,

    // spans applied: keep-span tokens re-joined in position order; the
    // LEFT JOIN + coalesce keeps fully-dropped docs as empty strings
    "q_substr_clean" ->
      s"""${substrSpansCte(keepFirst = false)},
         |tokp AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
         |         FROM tk),
         |tok AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos, t[i] AS w
         |        FROM tokp),
         |kept AS (SELECT tok.doc_id, pos, w FROM tok
         |         JOIN spans ON tok.doc_id = spans.doc_id
         |          AND spans.action = 'keep'
         |          AND pos BETWEEN spans.span_start AND spans.span_end)
         |SELECT d.doc_id,
         |       coalesce(string_agg(w, ' ' ORDER BY pos), '') AS clean_text
         |FROM documents d LEFT JOIN kept ON d.doc_id = kept.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // bigram-LM CTE identical to q_bigram_logprob's oracle; the per-source
    // GK-sketch boundaries are the fixture seam (DuckDB cannot replay
    // Spark's Greenwald-Khanna percentile_approx), and everything around
    // them — scoring, bucketing, per-bucket aggregation — replays exactly
    "q_ppl_buckets" ->
      s"""WITH tk AS (
         |  SELECT doc_id, ${toks("lower(text)")} AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
         |           i -> t[i] || ' ' || t[i+1])) AS bg
         |  FROM tk WHERE len(t) >= 2),
         |bc AS (SELECT bg, count(*) AS n_bg FROM bg GROUP BY 1),
         |pc AS (SELECT split_part(bg, ' ', 1) AS w1,
         |              CAST(sum(n_bg) AS BIGINT) AS n_prefix
         |       FROM bc GROUP BY 1),
         |scored AS (
         |  SELECT doc_id,
         |         round(avg(-ln(CAST(n_bg AS DOUBLE) / n_prefix)), 6)
         |           AS avg_neg_logprob
         |  FROM bg JOIN bc USING (bg)
         |  JOIN pc ON split_part(bg.bg, ' ', 1) = pc.w1
         |  GROUP BY doc_id),
         |ws AS (
         |  SELECT d.source, s.doc_id, s.avg_neg_logprob
         |  FROM scored s JOIN documents d USING (doc_id)),
         |b AS (SELECT source, b33, b67
         |      FROM read_parquet('${sqlPath("ppl_bounds")}'))
         |SELECT ws.source,
         |       CASE WHEN avg_neg_logprob <= b33 THEN 'head'
         |            WHEN avg_neg_logprob <= b67 THEN 'middle'
         |            ELSE 'tail' END AS bucket,
         |       count(*) AS n_docs,
         |       round(CAST(sum(CAST(round(avg_neg_logprob * 1e6, 0) AS BIGINT))
         |                  AS DOUBLE) / count(*) / 1e6, 6) AS mean_nlp
         |FROM ws JOIN b USING (source)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // per-doc columns replayed with q_text_quality's exact score recipe
    "q_data_card" ->
      s"""WITH t AS (
         |  SELECT source, lang, md5(text) AS h,
         |         CAST(len(${toks("lower(text)")}) AS BIGINT) AS ntok,
         |         ${toks("lower(text)")} AS toks,
         |         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
         |           / greatest(length(text), 1) AS praw,
         |         CAST(len(list_filter(${toks("lower(text)")},
         |              x -> x IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
         |           AS nstop
         |  FROM documents),
         |scored AS (
         |  SELECT source, lang, h, ntok,
         |         round(least(CAST(len(toks) AS DOUBLE) / 256.0, 1.0)
         |               * (1.0 - praw)
         |               * least(nstop / greatest(CAST(len(toks) AS DOUBLE), 1.0)
         |                       * 5.0, 1.0), 6) AS q
         |  FROM t),
         |dup AS (SELECT h, count(*) AS copies FROM scored GROUP BY 1)
         |SELECT source, lang, count(*) AS n_docs,
         |       CAST(sum(ntok) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_exact_dup,
         |       round(CAST(sum(CAST(round(q * 1e6, 0) AS BIGINT)) AS DOUBLE)
         |             / count(*) / 1e6, 6) AS mean_quality
         |FROM scored JOIN dup USING (h)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // /64 floor exact in FP on both engines (power-of-two divisor)
    "q_length_buckets" ->
      """WITH t AS (
        |  SELECT len(regexp_extract_all(text,
        |             '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS len
        |  FROM documents),
        |b AS (SELECT CAST(floor((len + 63) / 64.0) * 64 AS BIGINT) AS cap, len
        |      FROM t)
        |SELECT cap, count(*) AS n_docs,
        |       CAST(sum(len) AS BIGINT) AS sum_len,
        |       CAST(cap * count(*) - sum(len) AS BIGINT) AS pad_waste
        |FROM b GROUP BY cap ORDER BY cap""".stripMargin,

    // exact two-pass heavy hitters ≡ plain GROUP BY + HAVING — the MG
    // candidate stage is pure execution strategy (guaranteed superset,
    // exactly recounted), so the oracle never sees it
    "q_heavy_hitters" -> HeavyHittersSql,

    // streamed pass 1, identical final answer (see the query comment)
    "q_stream_topk" -> HeavyHittersSql,
  )

  private lazy val HeavyHittersSql =
    s"""WITH t AS (SELECT unnest(${toks("lower(text)")}) AS word FROM documents),
       |c AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1),
       |tot AS (SELECT count(*) AS n FROM t)
       |SELECT word, cnt FROM c, tot WHERE cnt * $HeavyK > n
       |ORDER BY cnt DESC, word""".stripMargin
}
