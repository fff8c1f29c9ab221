package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavior specs for the decontamination-stage queries (PII scrub,
  * benchmark contamination, source-mixture downsampling) on planted inputs
  * — the driver oracle checks them on the real tables, where the synthetic
  * corpus contains no PII; these pin the interesting cases. */
class PipelineQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PII scrub redacts planted emails and URLs, counts them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    Seq(
      (1L, "contact alice@example.com or bob.smith+tag@sub.domain.org today", "en", "src0", 50L),
      (2L, "see https://example.com/path?q=1 and http://a.b/c for details", "en", "src1", 50L),
      (3L, "no pii here at all", "en", "src0", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_pii_scrub")(spark, dir)
      .collect().map(row => row.getLong(0) -> (row.getInt(1), row.getInt(2))).toMap
    assert(r(1L) == ((2, 0)))
    assert(r(2L) == ((0, 2)))
    assert(r(3L) == ((0, 0)))
    // the redaction is effective: scrubbed text of doc 1 no longer matches
    val scrubbed = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" === 1L)
      .select(regexp_replace(col("text"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"))
      .head().getString(0)
    assert(scrubbed == "contact [EMAIL] or [EMAIL] today")
  }

  test("contamination flags eval-set members and near-copies, not clean docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_contam").toString
    Seq(
      (100L, "the quick brown fox jumps over the lazy dog", "en", "src0", 44L), // eval (id%100==0)
      (101L, "the quick brown fox jumps over the lazy dog", "en", "src1", 44L), // full copy
      (102L, "a completely different document about spark plans", "en", "src2", 49L),
      (103L, "the quick brown fox jumps over something else entirely today " +
        "with many extra unrelated words pushing shared shingles well below half",
        "en", "src3", 132L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_contamination")(spark, dir)
      .collect().map(row => row.getLong(0) -> row.getInt(3)).toMap
    assert(r(100L) == 1) // eval doc overlaps itself fully
    assert(r(101L) == 1) // verbatim benchmark copy caught
    assert(r(102L) == 0)
    assert(r(103L) == 0) // shares a prefix but under the 50% bar
  }

  test("source mixture: deterministic, rates track the per-source targets") {
    val r = SparkEntry.queries("q_source_mixture")(spark, TestSpark.Sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    assert(r.nonEmpty)
    val again = SparkEntry.queries("q_source_mixture")(spark, TestSpark.Sf0001)
      .collect().map(row => (row.getString(0), row.getLong(1), row.getLong(2)))
    assert(r.toSeq == again.toSeq) // hash coin, not rand(): identical reruns
    r.foreach { case (src, total, kept) =>
      assert(kept <= total)
      val even = src.filter(_.isDigit).toInt % 2 == 0
      // c0/256 = 75% target for even sources, 40/256 = 25% for odd; with 25
      // docs per source allow wide but directionally-separating bounds
      if (even) assert(kept.toDouble / total > 0.4, s"$src kept $kept/$total")
      else assert(kept.toDouble / total < 0.6, s"$src kept $kept/$total")
    }
  }
}
