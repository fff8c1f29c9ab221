package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.dedup.DedupOps
import OracleFixtures.{seam, sqlPath}

/** Deduplication query surface over `documents` (north-star extensions).
  *
  * Exact methods (`q_dedup_exact`, `q_dedup_ngram`) carry full DuckDB
  * oracles over the source table. The probabilistic-hash methods
  * (MinHash+LSH, SimHash) split at their deterministic seam: the
  * Spark-computed signature/fingerprint/shingle-hash frames are parquet
  * fixtures, and the oracle replays the ENTIRE downstream stage (band
  * bucketing → candidate join → exact Jaccard verify; Hamming pigeonhole
  * join) in DuckDB over those fixtures — so the driver hash-checks
  * everything after the hash family. DedupSpec additionally pins the hash
  * stage itself (candidates ⊆ exact pairs, 100% planted recall).
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables.documents(s, dir)

  /** MinHash/LSH parameters: k=128 hashes in 32 bands × 4 rows. */
  private val K = 128
  private val Bands = 32

  /** Bucket-size cap for the star-edge candidate variant
    * (`q_dedup_minhash_cap`) — shared with its oracle SQL by
    * interpolation. 2 is deliberately BELOW the sf0.01 maximum bucket
    * size (3), so the over-cap star path executes and hash-checks at test
    * scale; production uses caps of 10³-10⁴ (any bigger bucket is a
    * boilerplate family whose clique is quadratic waste). */
  private val CapBucket = 2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact content dedup (hash-groupBy on md5).
    "q_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDedup(docs(s, dir), "doc_id", "text")
        .orderBy("content_hash")),

    // Exact 3-gram Jaccard near-dup pairs at 0.8, via PREFIX FILTERING —
    // bit-identical to the naive posting-list formulation (DedupSpec pins
    // equality; the oracle below IS the naive formulation) but the contract
    // runs the variant that survives corpus scale: the naive self-join is
    // quadratic in a hot shingle's posting list (one boilerplate 3-gram
    // shared by millions of docs = one quadratic reducer), while the prefix
    // index caps each doc's contribution at (1−t)·|X|+1 hashes, keeping
    // stop shingles off the join key. Slightly slower at sf0.1 (thin
    // posting lists there), but the contract query is the one you'd run at
    // 100 TB.
    "q_dedup_ngram" -> ((s, dir) =>
      DedupOps.ngramJaccardPairsPrefix(docs(s, dir), "doc_id", "text", 3, 0.8)
        .orderBy("id_a", "id_b")),

    // MinHash(128)+LSH(32 bands × 4 rows) with exact verification at 0.8.
    // Fixture seams: the signature frame and the shingle-hash frame.
    "q_dedup_minhash" -> ((s, dir) => {
      val d = docs(s, dir)
      val sigs = seam(DedupOps.minhashSignatures(d, "doc_id", "text", n = 3, k = K),
        dir, "minhash_sigs")
      val ex = seam(DedupOps.shingleHashes(d, "doc_id", "text", n = 3),
        dir, "minhash_shingles")
      DedupOps.verifyJaccardPairs(
          DedupOps.lshCandidates(sigs, K, Bands), ex, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }),

    // The SAME MinHash pipeline with the star-edge bucket cap — the
    // 100 TB boilerplate path (over-cap buckets contribute hub→member
    // edges, not their quadratic clique; see DedupOps.lshCandidates).
    // Cap 2 forces the star path onto the sf0.01 size-3 buckets so the
    // oracle hash-checks BOTH routes. Same fixture seams as
    // q_dedup_minhash (identical frames, written once per sf).
    "q_dedup_minhash_cap" -> ((s, dir) => {
      val d = docs(s, dir)
      val sigs = seam(DedupOps.minhashSignatures(d, "doc_id", "text", n = 3, k = K),
        dir, "minhash_sigs")
      val ex = seam(DedupOps.shingleHashes(d, "doc_id", "text", n = 3),
        dir, "minhash_shingles")
      DedupOps.verifyJaccardPairs(
          DedupOps.lshCandidates(sigs, K, Bands, maxBucket = CapBucket),
          ex, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }),

    // Dedup-quality evaluation: precision/recall/F1 of the RAW
    // MinHash-LSH candidate set against the exact 3-gram-Jaccard≥0.8
    // truth — the measurement that justifies (or indicts) a band/row
    // configuration before a 100 TB run commits to it. Truth comes from
    // the prefix-filtered exact pair join; prediction is the UNVERIFIED
    // band-collision set (the thing whose precision is in question —
    // verification cost scales with its false positives). All three
    // counts are exact; precision/recall/F1 are closed-form divisions
    // (F1 = 2·tp/(nP+nT) — the harmonic identity keeps it one exact
    // integer numerator). Same fixture seams as q_dedup_minhash.
    "q_dedup_eval" -> ((s, dir) => {
      val d = docs(s, dir)
      val sigs = seam(DedupOps.minhashSignatures(d, "doc_id", "text", n = 3, k = K),
        dir, "minhash_sigs")
      seam(DedupOps.shingleHashes(d, "doc_id", "text", n = 3),
        dir, "minhash_shingles")
      val truth = DedupOps.ngramJaccardPairsPrefix(d, "doc_id", "text", 3, 0.8)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val pred = DedupOps.lshCandidates(sigs, K, Bands)
        .select(col("id_a"), col("id_b")).distinct().localCheckpoint(true)
      val nT = truth.agg(count(lit(1)).as("n_truth"))
      val nP = pred.agg(count(lit(1)).as("n_pred"))
      val tp = pred.join(truth, Seq("id_a", "id_b"), "left_semi")
        .agg(count(lit(1)).as("n_tp"))
      nT.crossJoin(nP).crossJoin(tp)
        .select(col("n_truth"), col("n_pred"), col("n_tp"),
          round(col("n_tp").cast("double") / col("n_pred"), 6).as("precision"),
          round(col("n_tp").cast("double") / col("n_truth"), 6).as("recall"),
          round((lit(2) * col("n_tp")).cast("double") /
            (col("n_pred") + col("n_truth")), 6).as("f1"))
    }),

    // SimHash fingerprints + Hamming≤3 near-dup pairs. Fixture seam: the
    // 64-bit fingerprint frame.
    "q_dedup_simhash" -> ((s, dir) => {
      val fps = seam(DedupOps.simhash(docs(s, dir), "doc_id", "text"),
        dir, "simhash_fps")
      DedupOps.simhashPairs(fps, 3).orderBy("id_a", "id_b")
    }),

    // INCREMENTAL near-dup screening against the PERSISTED band index
    // (IncrementalDedup): sources 0-9 are the indexed history, 10+ the
    // incoming batch; the index is a bkey-bucketed table so screening
    // shuffles only the batch (IncDedupSpec pins zero Exchange above the
    // index scan), and verification is signature-agreement — no access
    // to historical text. Same banding and sig fixture as
    // q_dedup_minhash, so the oracle replays band join + agreement from
    // the shared seam.
    "q_dedup_incremental" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      val d = docs(s, dir).withColumn("sn",
        regexp_extract(col("source"), "\\d+", 0).cast("int"))
      val sigs = seam(DedupOps.minhashSignatures(d, "doc_id", "text", n = 3, k = K),
        dir, "minhash_sigs")
      // materialized once: hist (index build) and inc (screen) both
      // filter this frame — unmaterialized, the signature kernel runs
      // twice over the full corpus
      val withSn = sigs.join(d.select("doc_id", "sn"), "doc_id")
        .localCheckpoint(true)
      val hist = withSn.filter(col("sn") < 10).select("doc_id", "sig")
      val inc = withSn.filter(col("sn") >= 10).select("doc_id", "sig")
      val table = "graft_inc_dedup_" +
        new java.io.File(dir.replaceAll("/+$", "")).getName.replaceAll("\\W", "_")
      graft.dedup.IncrementalDedup.buildBandIndex(s, hist, K, Bands, table)
      graft.dedup.IncrementalDedup.screenBatch(s, table, inc, K, Bands,
          minAgree = 0.5)
        .orderBy("inc_id", "hist_id")
    }),

    // Blocked EDIT-DISTANCE linkage (dirty-entity resolution): prefix
    // blocks (24 chars) + exact Levenshtein ≤ 10 verify — the planted
    // near-dup families sit at distance 4–8, unrelated word-salad far
    // above. Both engines run the classic unit-cost Wagner–Fischer DP,
    // so the distances are integers that match exactly.
    "q_fuzzy_pairs" -> ((s, dir) =>
      DedupOps.fuzzyPairs(docs(s, dir), "doc_id", "text",
          blockChars = 24, maxDist = 10)
        .orderBy("id_a", "id_b")),
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    // class-based expansion (OracleSql.dupPairPreludeSql): identical pair
    // set to the naive doc-pairwise replay — intra-class pairs are exact
    // dups (shared = |shingle set|, jaccard 1.0), cross-class pairs carry
    // the class-level shared count (same texts → same intersection)
    "q_dedup_ngram" ->
      s"""WITH ${OracleSql.dupPairPreludeSql()},
         |${OracleSql.doc2repSql},
         |intra AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, c.n AS shared,
         |         round(1.0, 6) AS jaccard
         |  FROM rcnt c
         |  JOIN doc2rep a ON a.rep = c.rep
         |  JOIN doc2rep b ON b.rep = c.rep AND a.doc_id < b.doc_id),
         |crossp AS (
         |  SELECT least(da.doc_id, db.doc_id) AS id_a,
         |         greatest(da.doc_id, db.doc_id) AS id_b, p.shared,
         |         round(CAST(p.shared AS DOUBLE) / (ca.n + cb.n - p.shared), 6)
         |           AS jaccard
         |  FROM rpairs p
         |  JOIN rcnt ca ON p.ra = ca.rep JOIN rcnt cb ON p.rb = cb.rep
         |  JOIN doc2rep da ON da.rep = p.ra JOIN doc2rep db ON db.rep = p.rb
         |  WHERE round(CAST(p.shared AS DOUBLE) / (ca.n + cb.n - p.shared), 6)
         |          >= 0.8)
         |SELECT id_a, id_b, shared, jaccard
         |FROM (SELECT * FROM intra UNION ALL SELECT * FROM crossp)
         |ORDER BY id_a, id_b""".stripMargin,

    // truth = the exact 3-gram-Jaccard≥0.8 pair set, computed over the
    // class-based prelude (OracleSql.dupClusterPreludeSql — identical
    // semantics to the naive doc-pairwise replay, budget-fitting at sf1):
    // |truth| = Σ intra-class C(sz,2) over shingled dup classes
    //         + Σ szA·szB over class-level edges, and membership of a
    // candidate pair is same-shingled-class OR its class pair ∈ redges.
    // Prediction = the q_dedup_minhash band-collision replay over the
    // sig fixture; the three counts and their divisions follow.
    "q_dedup_eval" ->
      s"""WITH RECURSIVE ${OracleSql.dupClusterPreludeSql()},
         |doc2rep AS MATERIALIZED (SELECT unnest(ids) AS doc_id, rep FROM cls),
         |shingled AS MATERIALIZED (SELECT rep FROM rsh),
         |sigs AS (SELECT * FROM read_parquet('${sqlPath("minhash_sigs")}')),
         |banded AS (
         |  SELECT doc_id, unnest(range(0, $Bands)) AS band, sig FROM sigs),
         |bb AS (
         |  SELECT doc_id, band,
         |         array_to_string(list_slice(sig, CAST(band AS INT) * 4 + 1,
         |                                    CAST(band AS INT) * 4 + 4), ',') AS bucket
         |  FROM banded),
         |cand AS MATERIALIZED (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |m AS (
         |  SELECT (SELECT COALESCE(sum(c.sz * (c.sz - 1) // 2), 0)
         |            FROM cls c
         |            WHERE c.sz >= 2 AND c.rep IN (SELECT rep FROM shingled))
         |       + (SELECT COALESCE(sum(ca.sz * cb.sz), 0)
         |            FROM redges e
         |            JOIN cls ca ON e.ra = ca.rep
         |            JOIN cls cb ON e.rb = cb.rep) AS n_truth,
         |         (SELECT count(*) FROM cand) AS n_pred,
         |         (SELECT count(*)
         |            FROM cand c
         |            JOIN doc2rep da ON c.id_a = da.doc_id
         |            JOIN doc2rep db ON c.id_b = db.doc_id
         |            LEFT JOIN redges e
         |              ON e.ra = least(da.rep, db.rep)
         |             AND e.rb = greatest(da.rep, db.rep)
         |            WHERE (da.rep = db.rep
         |                   AND da.rep IN (SELECT rep FROM shingled))
         |               OR e.ra IS NOT NULL) AS n_tp)
         |SELECT CAST(n_truth AS BIGINT) AS n_truth,
         |       CAST(n_pred AS BIGINT) AS n_pred,
         |       CAST(n_tp AS BIGINT) AS n_tp,
         |       round(CAST(n_tp AS DOUBLE) / n_pred, 6) AS precision,
         |       round(CAST(n_tp AS DOUBLE) / n_truth, 6) AS recall,
         |       round(CAST(2 * n_tp AS DOUBLE) / (n_pred + n_truth), 6) AS f1
         |FROM m""".stripMargin,

    // Downstream-stage replay over the Spark-written fixtures. Band-bucket
    // equality here compares the BAND CONTENT (the 4-signature slice) —
    // equivalent to the engine's xxhash64 bucket modulo hash collisions.
    // The verify stage intersects per-doc shingle LISTS instead of a
    // double shingle-join + group (exact: (doc_id, gh) is distinct, so
    // len(list_intersect) == the join count, and a 0-intersection pair
    // fails ≥0.8 just as the inner join dropped it) — the join spelling
    // blew the sf3 sweep budget on 2.4 M candidates × 7.8 M shingle rows
    // (r15 SKIPPED_SLOW); this form replays in ~1/3 the time.
    "q_dedup_minhash" ->
      s"""WITH sigs AS (SELECT * FROM read_parquet('${sqlPath("minhash_sigs")}')),
         |ex AS (SELECT * FROM read_parquet('${sqlPath("minhash_shingles")}')),
         |banded AS (
         |  SELECT doc_id, unnest(range(0, $Bands)) AS band, sig FROM sigs),
         |bb AS (
         |  SELECT doc_id, band,
         |         array_to_string(list_slice(sig, CAST(band AS INT) * 4 + 1,
         |                                    CAST(band AS INT) * 4 + 4), ',') AS bucket
         |  FROM banded),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bb a JOIN bb b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
         |lists AS (SELECT doc_id, list(gh) AS ghs, count(*) AS n FROM ex GROUP BY 1),
         |shared AS (
         |  SELECT id_a, id_b, len(list_intersect(la.ghs, lb.ghs)) AS shared,
         |         la.n AS na, lb.n AS nb
         |  FROM cand
         |  JOIN lists la ON id_a = la.doc_id
         |  JOIN lists lb ON id_b = lb.doc_id)
         |SELECT id_a, id_b,
         |       round(CAST(shared AS DOUBLE) / (na + nb - shared), 6) AS jaccard
         |FROM shared
         |WHERE round(CAST(shared AS DOUBLE) / (na + nb - shared), 6) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // q_dedup_minhash's replay with the bucket-size split: under-cap
    // buckets join all-pairs, over-cap buckets emit min-doc_id star edges.
    "q_dedup_minhash_cap" ->
      s"""WITH sigs AS (SELECT * FROM read_parquet('${sqlPath("minhash_sigs")}')),
         |ex AS (SELECT * FROM read_parquet('${sqlPath("minhash_shingles")}')),
         |banded AS (
         |  SELECT doc_id, unnest(range(0, $Bands)) AS band, sig FROM sigs),
         |bb AS (
         |  SELECT doc_id, band,
         |         array_to_string(list_slice(sig, CAST(band AS INT) * 4 + 1,
         |                                    CAST(band AS INT) * 4 + 4), ',') AS bucket
         |  FROM banded),
         |bsz AS (
         |  SELECT band, bucket, count(*) AS bn, min(doc_id) AS hub
         |  FROM bb GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT id_a, id_b FROM (
         |    SELECT a.doc_id AS id_a, b.doc_id AS id_b
         |    FROM bb a
         |    JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |            AND a.doc_id < b.doc_id
         |    JOIN bsz s ON s.band = a.band AND s.bucket = a.bucket
         |    WHERE s.bn <= $CapBucket
         |    UNION ALL
         |    SELECT s.hub AS id_a, m.doc_id AS id_b
         |    FROM bb m JOIN bsz s ON s.band = m.band AND s.bucket = m.bucket
         |    WHERE s.bn > $CapBucket AND m.doc_id <> s.hub)),
         |lists AS (SELECT doc_id, list(gh) AS ghs, count(*) AS n FROM ex GROUP BY 1),
         |shared AS (
         |  SELECT id_a, id_b, len(list_intersect(la.ghs, lb.ghs)) AS shared,
         |         la.n AS na, lb.n AS nb
         |  FROM cand
         |  JOIN lists la ON id_a = la.doc_id
         |  JOIN lists lb ON id_b = lb.doc_id)
         |SELECT id_a, id_b,
         |       round(CAST(shared AS DOUBLE) / (na + nb - shared), 6) AS jaccard
         |FROM shared
         |WHERE round(CAST(shared AS DOUBLE) / (na + nb - shared), 6) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // Hamming pigeonhole over the fingerprint fixture: 4 × 16-bit blocks;
    // arithmetic >> plus the & 65535 mask equals a logical shift's low 16
    // bits for every block, so negative fingerprints are handled exactly.
    // Budget-fitting shape (r15 verdict #4): the replay pigeonholes
    // UNIQUE fingerprints (dup-heavy sweeps collapse 150 k docs to ~5 k
    // fps at sf3) and expands doc pairs only for fp pairs that PASS the
    // Hamming test — the doc-level block join materialized 211 M
    // candidate rows through a DISTINCT (306 s at sf3; this form: 0.7 s,
    // identical 2 647 500 rows). Exact by the same pigeonhole: hamming
    // ≤ 3 < 4 blocks forces a shared block, equal-fp doc pairs share
    // every block (the intra branch, hamming 0).
    "q_dedup_simhash" ->
      s"""WITH fps AS (SELECT * FROM read_parquet('${sqlPath("simhash_fps")}')),
         |fu AS (SELECT simhash, list(doc_id) AS docs FROM fps GROUP BY 1),
         |blk AS (
         |  SELECT simhash, unnest([0, 1, 2, 3]) AS block_idx FROM fu),
         |b2 AS (
         |  SELECT simhash, block_idx,
         |         (simhash >> (block_idx * 16)) & 65535 AS block_val
         |  FROM blk),
         |fpairs AS (
         |  SELECT DISTINCT a.simhash AS sa, b.simhash AS sb
         |  FROM b2 a JOIN b2 b
         |    ON a.block_idx = b.block_idx AND a.block_val = b.block_val
         |       AND a.simhash < b.simhash
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |crossp AS (
         |  SELECT least(u1.x, u2.y) AS id_a, greatest(u1.x, u2.y) AS id_b,
         |         CAST(bit_count(xor(p.sa, p.sb)) AS INT) AS hamming
         |  FROM fpairs p
         |  JOIN fu fa ON fa.simhash = p.sa
         |  JOIN fu fb ON fb.simhash = p.sb,
         |  unnest(fa.docs) AS u1(x), unnest(fb.docs) AS u2(y)),
         |intra AS (
         |  SELECT u1.x AS id_a, u2.y AS id_b, 0 AS hamming
         |  FROM fu, unnest(docs) AS u1(x), unnest(docs) AS u2(y)
         |  WHERE u1.x < u2.y)
         |SELECT id_a, id_b, hamming
         |FROM (SELECT * FROM crossp UNION ALL SELECT * FROM intra)
         |ORDER BY id_a, id_b""".stripMargin,

    // Band join restricted hist(sn<10) × incoming(sn≥10), then the
    // signature-agreement verify: matching positions / k, replayed by
    // indexing both sig arrays over range(1, k+1).
    "q_dedup_incremental" ->
      s"""WITH sigs AS (SELECT * FROM read_parquet('${sqlPath("minhash_sigs")}')),
         |src AS (SELECT doc_id,
         |          CAST(regexp_extract(source, '[0-9]+', 0) AS INT) AS sn
         |        FROM documents),
         |s2 AS (SELECT s.doc_id, s.sig, src.sn FROM sigs s JOIN src USING (doc_id)),
         |banded AS (
         |  SELECT doc_id, sn, unnest(range(0, $Bands)) AS band, sig FROM s2),
         |bb AS (
         |  SELECT doc_id, sn, band,
         |         array_to_string(list_slice(sig, CAST(band AS INT) * 4 + 1,
         |                                    CAST(band AS INT) * 4 + 4), ',') AS bucket
         |  FROM banded),
         |cand AS (
         |  SELECT DISTINCT i.doc_id AS inc_id, h.doc_id AS hist_id
         |  FROM bb i JOIN bb h ON i.band = h.band AND i.bucket = h.bucket
         |  WHERE i.sn >= 10 AND h.sn < 10 AND i.doc_id <> h.doc_id),
         |ag AS (
         |  SELECT c.inc_id, c.hist_id,
         |         round(CAST(len(list_filter(range(1, $K + 1),
         |                 x -> si.sig[x] = sh.sig[x])) AS DOUBLE) / $K.0, 6) AS agree
         |  FROM cand c
         |  JOIN sigs si ON si.doc_id = c.inc_id
         |  JOIN sigs sh ON sh.doc_id = c.hist_id)
         |SELECT inc_id, hist_id, agree FROM ag
         |WHERE agree >= 0.5 ORDER BY inc_id, hist_id""".stripMargin,

    // class-based expansion: edit distance is a function of the two
    // texts, so the Levenshtein DP runs once per distinct-text pair
    // (class reps) and expands over class members; intra-class pairs are
    // distance 0. The ≤50 block cap counts DOCS (Σ class sizes per
    // block), exactly like the naive form — same text ⇒ same 24-char
    // block, so classes never straddle blocks.
    "q_fuzzy_pairs" ->
      """WITH cls AS MATERIALIZED (
        |  SELECT min(doc_id) AS rep, list_sort(list(doc_id)) AS ids,
        |         count(*) AS sz, text, substr(text, 1, 24) AS blk
        |  FROM documents GROUP BY text),
        |doc2rep AS MATERIALIZED (SELECT unnest(ids) AS doc_id, rep FROM cls),
        |bcount AS (SELECT blk, CAST(sum(sz) AS BIGINT) AS n FROM cls GROUP BY 1),
        |keep AS (SELECT blk FROM bcount WHERE n <= 50),
        |rpair AS MATERIALIZED (
        |  SELECT a.rep AS ra, b.rep AS rb,
        |         levenshtein(a.text, b.text) AS edit_dist
        |  FROM cls a
        |  JOIN cls b ON a.blk = b.blk AND a.rep < b.rep
        |  JOIN keep k ON a.blk = k.blk
        |  WHERE levenshtein(a.text, b.text) <= 10),
        |intra AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(0 AS BIGINT) AS edit_dist
        |  FROM cls c
        |  JOIN keep k ON c.blk = k.blk
        |  JOIN doc2rep a ON a.rep = c.rep
        |  JOIN doc2rep b ON b.rep = c.rep AND a.doc_id < b.doc_id),
        |crossp AS (
        |  SELECT least(da.doc_id, db.doc_id) AS id_a,
        |         greatest(da.doc_id, db.doc_id) AS id_b,
        |         CAST(p.edit_dist AS BIGINT) AS edit_dist
        |  FROM rpair p
        |  JOIN doc2rep da ON da.rep = p.ra
        |  JOIN doc2rep db ON db.rep = p.rb)
        |SELECT id_a, id_b, edit_dist
        |FROM (SELECT * FROM intra UNION ALL SELECT * FROM crossp)
        |ORDER BY id_a, id_b""".stripMargin,
  )
}
