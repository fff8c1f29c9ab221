package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over the embedding store — the dimensionality-reduction /
  * whitening stage a training-data pipeline runs between embedding and
  * indexing (and the consumer the Gram aggregate exists for).
  *
  * Fit is a two-level split that keeps every corpus-sized step
  * distributed and every driver-sized step tiny:
  *  - ONE corpus pass: `GramMicroAgg` over the embedding with a constant
  *    1.0 dimension appended (dims+1), so the second moments Σxᵢxⱼ, the
  *    first moments Σxᵢ and the row count n all fall out of a single
  *    16 KB-buffer map-side-combined aggregate — exact integers, any
  *    accumulation order.
  *  - driver-side (fixed d² work, independent of corpus size): assemble
  *    the covariance C = Σxxᵀ/n − μμᵀ and eigensolve it with cyclic
  *    Jacobi rotations — deterministic: fixed sweep order, fixed
  *    convergence threshold, eigenpairs sorted by (eigenvalue desc,
  *    index asc), sign fixed so each vector's largest-|entry| component
  *    is positive, entries rounded half-away-from-zero at 9 decimals.
  *
  * The rounded (μ, P) frame is the deterministic seam: persisted as a
  * parquet fixture, replayed by the SQL oracle, and embedded as literals
  * in the map-only projection stage `y_k = Σⱼ (xⱼ−μⱼ)·Pⱼₖ` whose per-term
  * nano-unit integer rounding makes the projected values engine-exact
  * (same recipe as the Gram micro-units, at 1e9 because the centered
  * products are small).
  */
object PcaOps {

  /** Deterministic cyclic-Jacobi eigensolve of a symmetric d×d matrix.
    * Returns (eigenvalues, eigenvectors as columns): `vecs(j)(c)` is
    * component j of eigenvector c, UNSORTED (caller orders).
    */
  def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { off += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Fit result: per-dim means and the d×k projection matrix, both
    * rounded at 9 decimals (the seam contract). `proj(j)(c)` is component
    * j of principal component c; components ordered by eigenvalue desc.
    */
  final case class PcaModel(
      means: Array[Double], proj: Array[Array[Double]], eigenvalues: Array[Double])

  /** One corpus pass + driver eigensolve. `vecCol` must be
    * `array<float>` of exactly `dims` elements per row. */
  def fit(df: DataFrame, vecCol: String, dims: Int, k: Int): PcaModel = {
    require(k >= 1 && k <= dims, s"pca: need 1 <= k <= dims, got k=$k dims=$dims")
    val d1 = dims + 1
    val rows = df
      .agg(graft.functions.GramMicroAgg.gram_micro(
        concat(col(vecCol), array(lit(1.0f))), d1).as("g"))
      .select(explode(col("g")).as("e"))
      .select(col("e.i"), col("e.j"), col("e.s"))
      .collect()
    val s = Array.ofDim[Double](d1, d1)
    rows.foreach { r =>
      val (i, j, micro) = (r.getInt(0) - 1, r.getInt(1) - 1, r.getLong(2))
      s(i)(j) = micro / 1e6; s(j)(i) = micro / 1e6
    }
    val n = s(dims)(dims) // Σ 1·1
    require(n > 0, "pca: empty input")
    val mean = Array.tabulate(dims)(i => s(i)(dims) / n)
    val cov = Array.tabulate(dims, dims)((i, j) => s(i)(j) / n - mean(i) * mean(j))
    val (evals, evecs) = jacobiEigen(cov)
    val order = (0 until dims).sortBy(i => (-evals(i), i)).take(k)
    val proj = Array.ofDim[Double](dims, k)
    order.zipWithIndex.foreach { case (src, c) =>
      val colv = Array.tabulate(dims)(j => evecs(j)(src))
      // deterministic sign: largest-|entry| component (lowest index on
      // ties) must be positive
      val pivot = (0 until dims).maxBy(j => (math.abs(colv(j)), -j))
      val sign = if (colv(pivot) < 0) -1.0 else 1.0
      (0 until dims).foreach(j => proj(j)(c) = round9(sign * colv(j)))
    }
    PcaModel(mean.map(round9), proj, order.map(evals(_)).toArray)
  }

  /** The seam frame the fixture + oracle consume: one row per
    * (dim j 1-based, component k 1-based) with the dim's mean and the
    * projection weight. */
  def modelFrame(spark: SparkSession, m: PcaModel): DataFrame = {
    import spark.implicits._
    val k = m.proj(0).length
    (for { j <- m.means.indices; c <- 0 until k }
      yield (j + 1, c + 1, m.means(j), m.proj(j)(c)))
      .toDF("j", "k", "m", "p")
  }

  /** Map-only projection of `vecCol` onto the model read back from the
    * seam frame (so Spark consumes exactly the bytes the oracle will):
    * per-component nano-unit integer terms `round((xⱼ−μⱼ)·Pⱼₖ·1e9)`
    * summed with a HOF — no shuffle, no UDF, engine-exact. Output:
    * idCol, pc1..pck (rounded at 6).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      seam: DataFrame, k: Int): DataFrame = {
    val byK = seam.select("j", "k", "m", "p").collect()
      .groupBy(_.getInt(1))
    val dims = byK(1).length
    val pcs = (1 to k).map { c =>
      val rows = byK(c).sortBy(_.getInt(0))
      val mLit = typedLit(rows.map(_.getDouble(2)))
      val pLit = typedLit(rows.map(_.getDouble(3)))
      val terms = transform(sequence(lit(1), lit(dims)), j =>
        round((element_at(col(vecCol), j).cast("double") - element_at(mLit, j))
          * element_at(pLit, j) * lit(1e9)).cast("long"))
      round(aggregate(terms, lit(0L), (acc, t) => acc + t) / lit(1e9), 6)
        .as(s"pc$c")
    }
    df.select(col(idCol) +: pcs: _*)
  }
}
