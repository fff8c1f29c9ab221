package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sim.PcaOps

/** PCA fit/project: the Jacobi eigensolver against known spectra, the
  * distributed fit against a planted low-rank corpus, determinism of the
  * seam contract, and the map-only shape of the projection stage. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("jacobiEigen recovers a known diagonal-in-disguise spectrum") {
    // A = R diag(5,2,1) R^T for a rotation R in the (0,1) plane.
    val th = 0.3
    val (c, s) = (math.cos(th), math.sin(th))
    val r = Array(
      Array(c, -s, 0.0),
      Array(s, c, 0.0),
      Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d(k) * r(j)(k)).sum)
    val (evals, evecs) = PcaOps.jacobiEigen(a)
    assert(evals.sorted.zip(Array(1.0, 2.0, 5.0)).forall {
      case (got, want) => math.abs(got - want) < 1e-10 })
    // eigenvector columns stay orthonormal through the rotations
    for (p <- 0 until 3; q <- 0 until 3) {
      val dot = (0 until 3).map(i => evecs(i)(p) * evecs(i)(q)).sum
      assert(math.abs(dot - (if (p == q) 1.0 else 0.0)) < 1e-10)
    }
  }

  test("fit finds a planted dominant direction; projection is centered") {
    import spark.implicits._
    // 1-D signal along (3,4)/5 in dims 0-1 plus a tiny dim-2 wiggle:
    // PC1 must align with the planted direction.
    val rows = (0 until 420).map { i => // 20 full cycles => exact zero-mean signal
      val t = (i % 21 - 10).toFloat // mean-zero signal, range [-10, 10]
      (i.toLong, Array(0.6f * t + 1f, 0.8f * t - 2f, (i % 2).toFloat, 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = PcaOps.fit(df, "embedding", dims = 4, k = 2)
    assert(math.abs(m.means(0) - 1.0) < 1e-6)
    assert(math.abs(m.means(1) + 2.0) < 1e-6)
    val pc1 = Array.tabulate(4)(j => m.proj(j)(0))
    assert(math.abs(math.abs(pc1(0)) - 0.6) < 1e-6)
    assert(math.abs(math.abs(pc1(1)) - 0.8) < 1e-6)
    assert(math.abs(pc1(2)) < 1e-6 && math.abs(pc1(3)) < 1e-6)
    assert(pc1(1) > 0) // sign contract: largest-|entry| component positive
    assert(m.eigenvalues(0) > 30 && m.eigenvalues(1) < 0.3)
    // projected scores: mean ~0 per component (data was centered by fit)
    val proj = PcaOps.project(df, "vec_id", "embedding",
      PcaOps.modelFrame(spark, m), 2)
    val stats = proj.agg(
      round(avg(col("pc1")), 4).as("m1"), round(avg(col("pc2")), 4).as("m2"),
      max(abs(col("pc1"))).as("mx")).head()
    assert(math.abs(stats.getDouble(0)) < 1e-3)
    assert(math.abs(stats.getDouble(1)) < 1e-3)
    assert(stats.getDouble(2) > 9.0) // signal survives: |t|max = 10
  }

  test("fit is deterministic across partitionings (seam contract)") {
    val df = graft.tables.Tables.embeddings(spark, TestSpark.Sf0001)
    val m1 = PcaOps.fit(df.repartition(1), "embedding", 64, 4)
    val m8 = PcaOps.fit(df.repartition(8), "embedding", 64, 4)
    assert(m1.means.sameElements(m8.means))
    assert((0 until 64).forall(j => m1.proj(j).sameElements(m8.proj(j))))
  }

  test("projection stage is map-only: no exchange below the sort") {
    val df = graft.tables.Tables.embeddings(spark, TestSpark.Sf0001)
    val m = PcaOps.fit(df, "embedding", 64, 4)
    val proj = PcaOps.project(df, "vec_id", "embedding",
      PcaOps.modelFrame(spark, m), 4)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }
}
