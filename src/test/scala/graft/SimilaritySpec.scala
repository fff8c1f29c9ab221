package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.SimilarityOps
import org.apache.spark.sql.functions._

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine of hand-computed vectors") {
    val df = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f)), (3L, Array(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.cosinePairs(df, "vec_id", "embedding", -1.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 0.0)
    assert(pairs((0L, 3L)) == 1.0)
    assert(math.abs(pairs((0L, 2L)) - math.sqrt(0.5)) < 1e-6)
  }

  test("brute-force top-k: ranks descend, self excluded, k respected") {
    val emb = graft.tables.Tables.embeddings(spark, TestSpark.Sf0001)
    val topk = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding", 50, 5)
    val rows = topk.collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == 5)
      assert(rs.forall(_.getLong(2) != q)) // self excluded
      val ordered = rs.sortBy(_.getInt(1))
      assert(ordered.map(_.getDouble(3)).sliding(2).forall(s => s.head >= s.last))
    }
  }

  test("LSH top-k agrees with brute force on shared (query, neighbor) pairs") {
    val emb = graft.tables.Tables.embeddings(spark, TestSpark.Sf0001)
    val brute = SimilarityOps.bruteForceTopK(emb, "vec_id", "embedding", 50, 1000000)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val lsh = SimilarityOps.lshTopK(emb, "vec_id", "embedding", 50, 5, 6).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.contains(key))
      assert(brute(key) == r.getDouble(3)) // identical cosine computation
    }
  }

  test("hyperplane signature is deterministic across evaluations") {
    val emb = graft.tables.Tables.embeddings(spark, TestSpark.Sf0001).limit(50)
    val sig = emb.select(col("vec_id"),
      SimilarityOps.hyperplaneSignature(
        SimilarityOps.toDouble(col("embedding")), 6).as("b"))
    val a = sig.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = sig.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }
}
