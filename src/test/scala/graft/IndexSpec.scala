package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.{IndexOps, SimilarityOps}
import graft.tables.Tables

/** Persisted IVF index (IndexOps): the inverted lists live as parquet
  * cell partitions, so probing must be PARTITION PRUNING, and the
  * persist→prune→scan roundtrip must reproduce the recompute-per-search
  * path exactly. */
class IndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val idxDir = {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .orderBy("cell").limit(16)
    val dir = new java.io.File("target/fixtures/ivf_index").getAbsolutePath
    IndexOps.buildIvfIndex(e, "vec_id", "embedding", cent, dir)
    dir
  }

  test("persisted-index search == recompute-per-search (ivfTopK), row for row") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val queries = e.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val fromIndex = IndexOps.queryIvfIndex(spark, idxDir, queries, k = 5, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    val recomputed = SimilarityOps.ivfTopK(e, "vec_id", "embedding",
        querySelector = 10, k = 5, nCells = 16, nProbe = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex.nonEmpty)
    assert(fromIndex === recomputed)
  }

  test("probing is partition pruning: PartitionFilters on cell, fewer files scanned") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val queries = e.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val result = IndexOps.queryIvfIndex(spark, idxDir, queries, k = 5, nProbe = 2)
    val plan = result.queryExecution.executedPlan.toString
    // the postings scan must carry the probed-cell predicate as a
    // PARTITION filter (directory-level pruning), not a data filter
    val partLines = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(partLines.matches("(?s).*PartitionFilters: \\[.*cell.*"), plan.take(3000))
    // and it must actually prune: a 2-cell isin reads strictly fewer
    // files than the full layout (input_file_name() observes the files
    // the executed scan really touched — DataFrame.inputFiles would
    // report the relation's full listing regardless of pruning)
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name().as("f")).distinct().count()
    val postings = spark.read.parquet(s"$idxDir/postings")
    val probedFiles = scannedFiles(postings.filter(col("cell").isin(0, 1)))
    val allFiles = scannedFiles(postings)
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"probed $probedFiles of $allFiles")
  }

  test("index build precomputes norms: postings carry (id, v, nv)") {
    val cols = spark.read.parquet(s"$idxDir/postings").columns.toSet
    assert(cols === Set("id", "v", "nv", "cell"))
  }

  private lazy val pqIdxDir = {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .orderBy("cell").limit(16)
    val dir = new java.io.File("target/fixtures/ivfpq_index").getAbsolutePath
    IndexOps.buildIvfPqIndex(e, "vec_id", "embedding", cent,
      m = 4, ksub = 16, dir = dir)
    dir
  }

  test("persisted IVF-PQ search == recompute-per-search (ivfPqTopK), row for row") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val queries = e.filter(col("vec_id") % 10 === 0 && col("vec_id") < 1000)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val fromIndex = IndexOps.queryIvfPqIndex(spark, pqIdxDir, queries,
        k = 5, nProbe = 2, m = 4)
      .orderBy("query_id", "rank").collect().toSeq
    val recomputed = SimilarityOps.ivfPqTopK(e, "vec_id", "embedding",
        querySelector = 10, k = 5, nCells = 16, nProbe = 2,
        m = 4, ksub = 16, maxQueries = 100)
      .orderBy("query_id", "rank").collect().toSeq
    assert(fromIndex.nonEmpty)
    assert(fromIndex === recomputed)
  }

  test("streamed index ingest == batch build, and batch replay is idempotent") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val cent = e.select(col("vec_id").as("cell"), col("embedding").as("cv"))
      .orderBy("cell").limit(16).localCheckpoint(true)
    val dir = new java.io.File("target/fixtures/ivf_stream_append").getAbsolutePath
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(dir), true)
    // two "micro-batches" through the idempotent appender
    val (lo, hi) = (e.filter(col("vec_id") < 250), e.filter(col("vec_id") >= 250))
    IndexOps.appendIvfBatch(lo, "vec_id", "embedding", cent, dir, 0L, "t1")
    IndexOps.appendIvfBatch(hi, "vec_id", "embedding", cent, dir, 1L, "t1")
    def postings = spark.read.parquet(s"$dir/postings")
      .orderBy("id").collect().toSeq
    val once = postings
    assert(once.length === e.count())
    // at-least-once redelivery of batch 1: the commit marker short-circuits
    IndexOps.appendIvfBatch(hi, "vec_id", "embedding", cent, dir, 1L, "t1")
    assert(postings === once)
    // the streamed postings match a batch build's, row for row
    val batch = spark.read.parquet(s"$idxDir/postings")
      .select("id", "cell").orderBy("id").collect().toSeq
    val streamed = spark.read.parquet(s"$dir/postings")
      .select("id", "cell").orderBy("id").collect().toSeq
    assert(streamed === batch)
  }

  test("IVF-PQ index stores codes, not vectors: m small rows per vector") {
    val e = Tables.embeddings(spark, TestSpark.Sf0001)
    val codes = spark.read.parquet(s"$pqIdxDir/codes")
    assert(codes.columns.toSet === Set("id", "sub", "code", "cell"))
    assert(codes.count() === e.count() * 4) // m = 4 codes per vector
  }
}
