package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.RetrievalOps

/** BM25 + reciprocal-rank-fusion retrieval (RetrievalOps). The BM25 test
  * pins the exact Robertson idf / length-normalization arithmetic against
  * a hand-computed fixture; the rest pin the operational contracts the
  * contract queries rely on (rank determinism, self-exclusion, fusion
  * semantics, partitioning invariance of the nano-unit sums). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 4 docs, hand-tokenizable. dl: 3, 5, 2, 3 → avgdl = 3.25, N = 4.
  private def corpus = Seq(
    (0L, "fast vector search"),
    (1L, "vector index for vector search"),
    (2L, "slow scan"),
    (3L, "fast fast scan")
  ).toDF("doc_id", "text")

  private def bm25(tf: Double, df: Double, dl: Double,
                   n: Double = 4.0, avgdl: Double = 3.25,
                   k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("bm25Scores matches the hand-computed Robertson/Lucene formula") {
    val q = Seq((1, "vector"), (1, "fast")).toDF("query_id", "term")
    val got = RetrievalOps.bm25Scores(corpus, "doc_id", "text", q)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap

    // df(vector)=2 (docs 0,1), df(fast)=2 (docs 0,3)
    def exp(terms: Seq[(Double, Double)], dl: Double): Double = {
      // nano-unit contribution sum, like the engine
      val nanos = terms.map { case (tf, df) =>
        math.round(bm25(tf = tf, df = df, dl = dl) * 1e9)
      }.sum
      BigDecimal(nanos.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet === Set(0L, 1L, 3L)) // doc 2 shares no term
    assert(got(0L) === exp(Seq((1.0, 2.0), (1.0, 2.0)), dl = 3.0)) // vector+fast
    assert(got(1L) === exp(Seq((2.0, 2.0)), dl = 5.0))             // vector x2
    assert(got(3L) === exp(Seq((2.0, 2.0)), dl = 3.0))             // fast x2
  }

  test("bm25: rarer terms out-score common ones at equal tf and dl") {
    // df(slow)=1 < df(fast)=2 → the slow-doc score for "slow" beats the
    // fast-doc score for "fast" at tf=1... compare via two 1-term queries
    val q = Seq((1, "slow"), (2, "scan")).toDF("query_id", "term")
    val got = RetrievalOps.bm25Scores(corpus, "doc_id", "text", q)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // doc 2 ("slow scan", dl=2): slow is rarer (df 1) than scan (df 2)
    assert(got((1L, 2L)) > got((2L, 2L)))
  }

  test("bm25TopK ranks by round-6 score desc with doc_id tie-break") {
    // docs 10 and 11 are identical → identical scores → doc_id order
    val dup = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha"))
      .toDF("doc_id", "text")
    val q = Seq((7, "alpha")).toDF("query_id", "term")
    val top = RetrievalOps.bm25TopK(dup, "doc_id", "text", q, k = 3)
      .orderBy("rank").collect()
    assert(top.map(_.getInt(1)).toSeq === Seq(1, 2, 3))
    // doc 12 (dl=1, tf=1) scores highest on length normalization; the two
    // dl=2 duplicates tie and resolve 10 before 11
    assert(top.map(_.getLong(2)).toSeq === Seq(12L, 10L, 11L))
    assert(top(0).getDouble(3) > top(1).getDouble(3))
    assert(top(1).getDouble(3) === top(2).getDouble(3))
  }

  test("bm25TopK excludeSelf drops the query document itself") {
    val q = Seq((0, "vector"), (0, "fast"), (0, "search")).toDF("query_id", "term")
    val withSelf = RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, 4)
      .select("doc_id").as[Long].collect().toSet
    val noSelf = RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, 4,
      excludeSelf = true).select("doc_id").as[Long].collect().toSet
    assert(withSelf.contains(0L) && !noSelf.contains(0L))
    assert(withSelf -- noSelf === Set(0L))
  }

  test("bm25 scores are invariant under input partitioning (nano-unit sums)") {
    val q = Seq((1, "vector"), (1, "fast"), (1, "scan")).toDF("query_id", "term")
    def run(parts: Int) =
      RetrievalOps.bm25Scores(corpus.repartition(parts), "doc_id", "text", q)
        .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(run(1) === run(7))
  }

  test("rrfFuse implements 1/(c+rank) with union semantics") {
    val sysA = Seq((1L, 1, 100L), (1L, 2, 200L)).toDF("query_id", "rank", "doc_id")
    val sysB = Seq((1L, 1, 200L), (1L, 2, 300L)).toDF("query_id", "rank", "doc_id")
    val fused = RetrievalOps.rrfFuse(Seq(sysA, sysB), c = 60, k = 3)
      .orderBy("rank").collect()
    def rrf(ranks: Seq[Int]): Double = {
      val nanos = ranks.map(r => math.round(1.0 / (60 + r) * 1e9)).sum
      BigDecimal(nanos.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // 200 appears in both lists (ranks 2 and 1) → wins; 100 and 300 tie
    // on identical single-list rank-1... no: 100 has rank 1 in A (1/61),
    // 300 has rank 2 in B (1/62) → 100 beats 300
    assert(fused.map(r => (r.getLong(2), r.getDouble(3))).toSeq === Seq(
      (200L, rrf(Seq(2, 1))), (100L, rrf(Seq(1))), (300L, rrf(Seq(2)))))
  }

  test("weighted bm25Scores scales contributions by w") {
    val q1 = Seq((1, "vector")).toDF("query_id", "term")
      .withColumn("w", lit(1.0))
    val q2 = Seq((1, "vector")).toDF("query_id", "term")
      .withColumn("w", lit(2.0))
    val s1 = RetrievalOps.bm25Scores(corpus, "doc_id", "text", q1)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val s2 = RetrievalOps.bm25Scores(corpus, "doc_id", "text", q2)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    assert(s1.keySet === s2.keySet)
    s1.foreach { case (d, v) => assert(math.abs(s2(d) - 2.0 * v) < 1e-5) }
  }

  test("rm3: lambda=1 keeps exactly the uniform original query model") {
    val q = Seq((1, "vector"), (1, "scan")).toDF("query_id", "term")
    val exp = RetrievalOps.rm3ExpandTerms(corpus, "doc_id", "text", q,
        m = 2, e = 4, lambda = 1.0)
      .collect().map(r => (r.getString(2), r.getDouble(3)))
    // originals at w = 1/2, everything else at 0
    val byTerm = exp.toMap
    assert(byTerm("vector") === 0.5 && byTerm("scan") === 0.5)
    assert(exp.filterNot(e => Set("vector", "scan")(e._1)).forall(_._2 === 0.0))
  }

  test("rm3: lambda=0 relevance model is a probability distribution") {
    // sum over ALL terms of P_RM = sum over fb docs of s' * (dl/dl) = 1;
    // e large enough to capture the whole tiny vocabulary
    val q = Seq((1, "vector")).toDF("query_id", "term")
    val exp = RetrievalOps.rm3ExpandTerms(corpus, "doc_id", "text", q,
        m = 2, e = 100, lambda = 0.0)
      .agg(sum("w")).first().getDouble(0)
    assert(math.abs(exp - 1.0) < 1e-4, s"sum w = $exp")
  }

  test("rm3 degrades to the original query model when feedback is empty") {
    // no document matches the query → no feedback docs (same code path
    // as the all-scores-round-to-zero stopword edge the sm > 0 guard
    // covers): expansion = the uniform original model, nothing else
    val q = Seq((1, "zzzznothing"), (1, "alsonothing")).toDF("query_id", "term")
    val exp = RetrievalOps.rm3ExpandTerms(corpus, "doc_id", "text", q,
        m = 3, e = 5, lambda = 0.5)
      .collect().map(r => (r.getString(2), r.getDouble(3)))
    assert(exp.map(_._1).toSet === Set("zzzznothing", "alsonothing"))
    assert(exp.forall(_._2 === 0.25)) // lambda / nq = 0.5 / 2
  }

  test("rm3 expansion surfaces feedback-doc terms beyond the original query") {
    val q = Seq((1, "vector")).toDF("query_id", "term")
    val terms = RetrievalOps.rm3ExpandTerms(corpus, "doc_id", "text", q,
        m = 2, e = 6, lambda = 0.5)
      .select("term").as[String].collect().toSet
    // feedback docs are the two vector docs; their vocabulary must appear
    assert(terms.contains("vector"))
    assert((terms & Set("search", "index", "fast", "for")).nonEmpty)
  }

  test("contract queries run end-to-end at sf0.001 with sane shapes") {
    val bm = SparkEntry.queries("q_bm25_topk")(spark, TestSpark.Sf0001)
    val bmRows = bm.collect()
    assert(bmRows.nonEmpty && bmRows.length <= 6 * 10)
    assert(bm.columns.toSeq === Seq("query_id", "rank", "doc_id", "score"))
    // ranks are dense from 1 within each query
    val byQ = bmRows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length).toSeq)
    }

    val rm = SparkEntry.queries("q_rm3_topk")(spark, TestSpark.Sf0001)
    assert(rm.columns.toSeq === Seq("query_id", "rank", "doc_id", "score"))
    assert(rm.count() === 6 * 10)
    val rt = SparkEntry.queries("q_rm3_terms")(spark, TestSpark.Sf0001)
    assert(rt.columns.toSeq === Seq("query_id", "rank", "term", "w"))
    assert(rt.count() === 6 * 8)

    val hy = SparkEntry.queries("q_hybrid_rrf")(spark, TestSpark.Sf0001)
    val hyRows = hy.collect()
    assert(hy.columns.toSeq === Seq("query_id", "rank", "doc_id", "rrf"))
    // 8 anchors, 10 per anchor
    assert(hyRows.map(_.getLong(0)).distinct.sorted.toSeq ===
      (0L until 400L by 50L).toSeq)
    assert(hyRows.length === 8 * 10)
    // no self-matches on either evidence path
    assert(!hyRows.exists(r => r.getLong(0) == r.getLong(2)))
  }

  test("inverted index: indexed BM25 ≡ scan-path BM25 bit-for-bit; the " +
      "query probe is partition pruning that actually prunes") {
    import graft.text.InvertedIndex
    val d = graft.tables.Tables.documents(spark, TestSpark.Sf0001)
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_idx").toString
    InvertedIndex.build(d, "doc_id", "text", idx)
    val q = graft.queries.RetrievalQueries.Bm25Queries.toDF("query_id", "term")
    val indexed = InvertedIndex.bm25TopKIndexed(spark, idx, q, k = 10)
    val scan = RetrievalOps.bm25TopK(d, "doc_id", "text", q, k = 10)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(rows(indexed) == rows(scan)) // same tf/df/dl/stats, same chain
    // the postings scan carries the bucket predicate as a PARTITION
    // filter (directory pruning), and strictly fewer files are read
    // than the full layout
    val plan = indexed.queryExecution.executedPlan.toString
    val partLines = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString("\n")
    assert(partLines.matches("(?s).*PartitionFilters: \\[.*bucket.*"),
      plan.take(3000))
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name().as("f")).distinct().count()
    val postings = spark.read.parquet(s"$idx/postings")
    val probed = scannedFiles(postings.filter(col("bucket").isin(0, 1)))
    val all = scannedFiles(postings)
    assert(probed > 0 && probed < all, s"probed $probed of $all")
    graft.util.LocalFs.deleteRecursively(new java.io.File(idx))
  }

  test("text index appendBatch: replayed delivery changes neither " +
      "postings nor stats (a doubled stats row would deflate every idf), " +
      "and the appended index answers like the scan path") {
    import graft.text.InvertedIndex
    val idx = java.nio.file.Files.createTempDirectory("graft_bm25_app").toString
    val (b1, b2) = (corpus.filter(col("doc_id") < 2),
      corpus.filter(col("doc_id") >= 2))
    InvertedIndex.appendBatch(b1, "doc_id", "text", idx, 64, 0L, "s")
    InvertedIndex.appendBatch(b2, "doc_id", "text", idx, 64, 1L, "s")
    def counts() = (
      spark.read.parquet(s"$idx/postings").count(),
      spark.read.parquet(s"$idx/collstats")
        .agg(sum("n_docs"), sum("dl_sum")).collect().head.toSeq)
    val before = counts()
    // engine retry of an already-committed batch id
    InvertedIndex.appendBatch(b2, "doc_id", "text", idx, 64, 1L, "s")
    assert(counts() == before, "replay mutated the index")
    assert(before._2 == Seq(4.0, 13.0), before._2.toString) // 4 docs, Σdl=13
    val q = Seq((1, "vector"), (1, "fast"), (2, "scan")).toDF("query_id", "term")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sorted.toSeq
    assert(rows(InvertedIndex.bm25TopKIndexed(spark, idx, q, k = 10)) ==
      rows(RetrievalOps.bm25TopK(corpus, "doc_id", "text", q, k = 10)))
    graft.util.LocalFs.deleteRecursively(new java.io.File(idx))
  }
}
