package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`ARRAY<FLOAT>`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline: broadcast the (small)
  *    query set against the full corpus; one pass, no corpus shuffle;
  *  - LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  *    signatures bucket the corpus so each query only scans its bucket
  *    (plus multi-probe neighbors would extend recall; single-probe here).
  *
  * All vector math is `aggregate`/`zip_with` higher-order expressions over
  * `ARRAY<DOUBLE>` — no UDFs, stays inside codegen.
  */
object SimilarityOps {

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE>. Only needed where a
    * higher-order lambda follows; [[graft.functions.VectorFunctions.vec_dot]]
    * accepts FLOAT arrays directly and accumulates in double. */
  def toDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Fused native dot product (codegen'd loop — see VectorExpressions). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def l2norm(a: Column): Column = graft.functions.VectorFunctions.vec_norm(a)

  /** Cosine from a fresh pair of vectors. Hot paths below instead join on
    * PRE-COMPUTED norms — never recompute a norm per candidate pair. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Exact top-k: for each query vector (`idCol % querySelector == 0`), the
    * k nearest corpus vectors by cosine. Ranking uses the ROUNDED similarity
    * with the neighbor id as tie-break, so order is engine-independent.
    * Norms are computed once per side before the pair join. */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     querySelector: Long, k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("nv"))
    val queries = emb.filter(col(idCol) % querySelector === 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        l2norm(col(vecCol)).as("nq"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** All near-pairs above a cosine threshold (id_a < id_b). Quadratic —
    * correctness baseline; the LSH path is the scale variant. */
  def cosinePairs(emb: DataFrame, idCol: String, vecCol: String,
                  threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      l2norm(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      l2norm(col(vecCol)).as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 → uniform in [-1, 1). Stable across runs and engines. */
  private def planeComponent(plane: Column, dim: Column): Column =
    (xxhash64(plane, dim).cast("double") / lit(Long.MaxValue.toDouble))

  /** Random-hyperplane LSH signature: `nPlanes` sign bits packed into a
    * BIGINT. Vectors in the same bucket are likely cosine-similar. */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column = {
    require(nPlanes <= 63, "signature packs into one BIGINT")
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(lit(p), i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /** ANN via LSH buckets: corpus and queries hash to sign-buckets; each
    * query joins only its bucket (equi-join on the signature → shuffle on
    * bucket key, never all-pairs), then exact cosine ranks within bucket. */
  /** ANN via IVF (inverted-file) cells: a deterministic coarse quantizer
    * (the `nCells` lowest-id vectors serve as centroids) assigns every
    * corpus vector to its nearest cell; each query probes its `nProbe`
    * nearest cells and ranks exactly within them. At scale the assignment
    * is one broadcast pass over the corpus and the search join touches
    * `nProbe/nCells` of the data; a trained k-means quantizer slots in by
    * replacing the centroid frame. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              querySelector: Long, k: Int, nCells: Int, nProbe: Int): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      l2norm(col(vecCol)).as("nv"))
    val centroids = base.orderBy("id").limit(nCells)
      .select(col("id").as("cell"), col("v").as("cv"), col("nv").as("cn"))
    val simToCell = dot(col("v"), col("cv")) / (col("nv") * col("cn"))
    def assign(input: DataFrame, perRow: Int): DataFrame = {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("cell_sim").desc, col("cell"))
      input.crossJoin(broadcast(centroids))
        .withColumn("cell_sim", simToCell)
        .withColumn("cell_rank", row_number().over(w))
        .filter(col("cell_rank") <= perRow)
        .select(col("id"), col("v"), col("nv"), col("cell"))
    }
    val corpus = assign(base, 1)
      .select(col("id").as("neighbor_id"), col("v"), col("nv"), col("cell"))
    // probe-assign only the QUERY subset — assigning the full corpus at
    // nProbe and filtering after would waste (querySelector-1)/querySelector
    // of a second full-corpus pass
    val queries = assign(base.filter(col("id") % querySelector === 0), nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nv").as("nq"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos", "cell")
      // no dedup needed: each corpus vector lives in exactly one cell, so a
      // (query, neighbor) pair can match at most one probed cell
  }

  def lshTopK(emb: DataFrame, idCol: String, vecCol: String,
              querySelector: Long, k: Int, nPlanes: Int,
              multiProbe: Boolean = true): DataFrame = {
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        l2norm(col(vecCol)).as("nv"))
      .withColumn("bucket", hyperplaneSignature(toDouble(col("v")), nPlanes))
    // multi-probe: a query also searches every Hamming-1 bucket (flip each
    // plane bit once) — the standard recall lever that costs probe joins,
    // not extra hash tables. Corpus vectors stay in exactly one bucket, so
    // a (query, neighbor) pair still matches at most once.
    val probeBuckets: Column =
      if (multiProbe)
        explode(array(col("bucket") +:
          (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*))
      else col("bucket")
    val queries = sig.filter(col("id") % querySelector === 0)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("nv").as("nq"), probeBuckets.as("bucket"))
    val corpus = sig.select(col("id").as("neighbor_id"), col("v"), col("nv"), col("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(dot(col("qv"), col("v")) / (col("nq") * col("nv")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos", "bucket")
  }
}
