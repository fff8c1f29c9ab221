package graft.queries

/** Shared DuckDB fragments for the exact-integer round-6 discipline
  * (PERF r12 "Spark and DuckDB round the same double differently"):
  * every engine-side `ResampleOps.microMeanHalfUp`/`ratioHalfUp` has a
  * structurally identical mirror here, so both engines round the same
  * exact rational in integer space instead of each rounding its own
  * double realization. */
object OracleSql {

  /** Exact HALF_UP round-6 mean of milli sum `s` over count `n`, /1e6 —
    * mirrors `ResampleOps.microMeanHalfUp(s, n)/1e6` (`// 0` is NULL in
    * DuckDB exactly like the Spark n=0 guard). */
  def milliMeanSql(s: String, n: String): String =
    s"CAST(CASE WHEN $s < 0 THEN -((abs($s) * 2000 + $n) // (2 * $n)) " +
      s"ELSE ($s * 2000 + $n) // (2 * $n) END AS DOUBLE) / 1e6"

  /** Aggregate fragment: exact milli-unit sum of `v` (HUGEINT so the
    * doubled numerator can't overflow at any group size). */
  def sMilliSql(v: String): String =
    s"CAST(sum(CAST(round($v * 1000, 0) AS BIGINT)) AS HUGEINT)"

  /** Exact HALF_UP of integer ratio `num/den` — mirrors
    * `ResampleOps.ratioHalfUp`. */
  def ratioHalfUpSql(num: String, den: String): String =
    s"(CASE WHEN ($num) < 0 THEN -((abs($num) * 2 + ($den)) // (2 * ($den))) " +
      s"ELSE (($num) * 2 + ($den)) // (2 * ($den)) END)"

  /** WITH-clause prelude shared by every oracle that replays exact
    * 3-gram-Jaccard pair semantics over `documents`, computed over
    * TEXT-EQUIVALENCE CLASSES (VERDICT r12 item #1, the SKIPPED_SLOW
    * closure): pairwise Jaccard is a function of the shingle set, hence
    * of the text, so the quadratic shared-shingle join runs once per
    * DISTINCT text (`rep` = the class's min doc_id) and expands back
    * over class members — every intra-class pair is an exact duplicate
    * (Jaccard 1) provided the text has ≥ 3 tokens (the shingled guard —
    * shorter texts have no shingle set and never pair, matching the
    * naive replay's `WHERE len(t) >= 3`). On the verbatim-replicated
    * sf1 sweep data (50 k docs, 4 992 distinct texts, 10-member dup
    * cliques) this turns >120 s quadratic oracles into ~3 s with
    * bit-identical output; at sf0.01 (all texts distinct) it degenerates
    * to exactly the naive replay. `AS MATERIALIZED` pins single
    * evaluation of the multiply-referenced CTEs — DuckDB inlines CTEs by
    * default and re-evaluates the whole upstream chain per reference
    * (the q_clustering_coef timeout mechanism).
    *
    * Ends in `redges(ra, rb)` — the class-level near-dup edge set
    * (ra < rb, both class reps). */
  def dupPairPreludeSql(thr: String = "0.8"): String =
    s"""cls AS MATERIALIZED (
       |  SELECT min(doc_id) AS rep, list_sort(list(doc_id)) AS ids,
       |         count(*) AS sz
       |  FROM documents GROUP BY text),
       |rtoks AS (
       |  SELECT c.rep, regexp_extract_all(lower(d.text), '\\S+') AS t
       |  FROM cls c JOIN documents d ON d.doc_id = c.rep),
       |rsh AS MATERIALIZED (
       |  SELECT rep, list_distinct(list_transform(generate_series(1, len(t) - 2),
       |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
       |  FROM rtoks WHERE len(t) >= 3),
       |rex AS MATERIALIZED (SELECT rep, unnest(s) AS g FROM rsh),
       |rcnt AS MATERIALIZED (SELECT rep, len(s) AS n FROM rsh),
       |rpairs AS MATERIALIZED (
       |  SELECT a.rep AS ra, b.rep AS rb, count(*) AS shared
       |  FROM rex a JOIN rex b ON a.g = b.g AND a.rep < b.rep
       |  GROUP BY 1, 2),
       |redges AS MATERIALIZED (
       |  SELECT ra, rb FROM rpairs
       |  JOIN rcnt ca ON ra = ca.rep JOIN rcnt cb ON rb = cb.rep
       |  WHERE round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 6) >= $thr)""".stripMargin

  /** Doc→class-rep mapping over the [[dupPairPreludeSql]] classes, for
    * expanding class-level facts back to doc-level pairs. */
  val doc2repSql: String =
    "doc2rep AS MATERIALIZED (SELECT unnest(ids) AS doc_id, rep FROM cls)"

  /** WITH-clause fragment for the point-in-time join oracles: ends in
    * `pit(l_orderkey, l_linenumber, o_custkey, l_shipdate, version_key,
    * version_price)` — each lineitem probe matched to the order version
    * (per o_custkey, versioned by o_orderdate with max-o_orderkey winning
    * ties) active at l_shipdate, NULL when no version has started.
    *
    * Semantically identical to the r1–r12 interval formulation
    * (`vf <= ship < vt`, vt = lead(o_orderdate) over (o_orderdate,
    * o_orderkey) — at tied dates every earlier row's [vf, vt) is empty,
    * so the max-orderkey version of the date wins) but computed as a
    * SORT-MERGE CARRY: union versions and probes per custkey, order by
    * (t, kind, vkey) with versions before probes at equal t (inclusive
    * vf <= ship) and tied versions ascending (last carried = max key),
    * and carry the last version columns forward. The interval join is
    * quadratic per custkey under fact replication — custkey stays a 1×
    * dimension while versions × probes per key grow 100× at the sf1
    * sweep (>120 s in DuckDB); the carry is one sort, ~2 s (VERDICT r12
    * item #1). */
  val pitCarrySql: String =
    """pitv AS (
      |  SELECT o_custkey AS ck, o_orderdate AS t, 0 AS kind,
      |         o_orderkey AS vkey, o_totalprice AS vprice,
      |         CAST(NULL AS BIGINT) AS l_orderkey,
      |         CAST(NULL AS BIGINT) AS l_linenumber,
      |         CAST(NULL AS TIMESTAMP) AS ship
      |  FROM orders
      |  UNION ALL
      |  SELECT o.o_custkey, l.l_shipdate, 1, NULL, NULL,
      |         l.l_orderkey, l.l_linenumber, l.l_shipdate
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |pit AS MATERIALIZED (
      |  SELECT l_orderkey, l_linenumber, ck AS o_custkey,
      |         ship AS l_shipdate, version_key, version_price
      |  FROM (
      |    SELECT *,
      |      last_value(CASE WHEN kind = 0 THEN vkey END IGNORE NULLS)
      |        OVER w AS version_key,
      |      last_value(CASE WHEN kind = 0 THEN vprice END IGNORE NULLS)
      |        OVER w AS version_price
      |    FROM pitv
      |    WINDOW w AS (PARTITION BY ck ORDER BY t, kind, vkey
      |                 ROWS UNBOUNDED PRECEDING))
      |  WHERE kind = 1)""".stripMargin

  /** [[dupPairPreludeSql]] continued through connected components. Ends
    * in `members(doc_id, cluster_id)`: CC of the doc-level near-dup
    * graph, cluster_id = least reachable doc_id, membership = docs with
    * ≥ 1 near-dup edge — EXACTLY the r1–r12 naive doc-pairwise CC
    * replay's `members`:
    *
    *  - the transitive closure runs on the class graph; the component's
    *    least doc_id equals the least class rep (rep = class min);
    *  - a class with ≥ 2 members and a shingle set is a dup clique even
    *    with no class-level edge (its docs pair with each other).
    *
    * Caller opens with `WITH RECURSIVE` and appends its own CTEs after. */
  def dupClusterPreludeSql(thr: String = "0.8"): String =
    s"""${dupPairPreludeSql(thr)},
       |cbidir AS MATERIALIZED (
       |  SELECT ra AS src, rb AS dst FROM redges
       |  UNION ALL SELECT rb, ra FROM redges),
       |creach AS (
       |  SELECT src, dst FROM cbidir
       |  UNION
       |  SELECT r.src, b.dst FROM creach r JOIN cbidir b ON r.dst = b.src
       |  WHERE r.src <> b.dst),
       |ccomp AS MATERIALIZED (
       |  SELECT src AS rep, least(src, min(dst)) AS comp FROM creach GROUP BY src),
       |members AS MATERIALIZED (
       |  SELECT unnest(c.ids) AS doc_id, COALESCE(cc.comp, c.rep) AS cluster_id
       |  FROM cls c LEFT JOIN ccomp cc ON c.rep = cc.rep
       |  WHERE cc.comp IS NOT NULL
       |     OR (c.sz >= 2 AND c.rep IN (SELECT rep FROM rsh)))""".stripMargin
}
