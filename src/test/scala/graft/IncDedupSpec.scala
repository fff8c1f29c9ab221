package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{DedupOps, IncrementalDedup}
import graft.tables.Tables

/** Incremental near-dup screening against the persisted bucketed band
  * index (IncrementalDedup): results must match an independent in-JVM
  * reference, the index side must join WITHOUT re-shuffling, and appends
  * must leave the index join-ready. */
class IncDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val K = 128
  private val Bands = 32

  private lazy val parts = {
    val d = Tables.documents(spark, TestSpark.Sf0001)
      .withColumn("sn", regexp_extract(col("source"), "\\d+", 0).cast("int"))
    val sigs = DedupOps.minhashSignatures(d, "doc_id", "text", n = 3, k = K)
      .join(d.select("doc_id", "sn"), "doc_id")
    val hist = sigs.filter(col("sn") < 10).select("doc_id", "sig")
    val inc = sigs.filter(col("sn") >= 10).select("doc_id", "sig")
    (hist.cache(), inc.cache())
  }

  /** In-JVM reference: band buckets by raw 4-hash slices, hist×inc
    * candidates, agreement = matching positions / k. */
  private def reference(minAgree: Double): Set[(Long, Long, Double)] = {
    val (hist, inc) = parts
    def sigsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val h = sigsOf(hist); val i = sigsOf(inc)
    def buckets(m: Map[Long, Seq[Long]]): Map[(Int, Seq[Long]), Set[Long]] =
      m.toSeq.flatMap { case (id, sig) =>
        (0 until Bands).map(b => ((b, sig.slice(4 * b, 4 * b + 4)), id))
      }.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hb = buckets(h); val ib = buckets(i)
    val cands = ib.toSeq.flatMap { case (key, incIds) =>
      hb.getOrElse(key, Set.empty).flatMap(hid => incIds.map(iid => (iid, hid)))
    }.toSet
    cands.map { case (iid, hid) =>
      val agree = i(iid).zip(h(hid)).count { case (a, b) => a == b } / K.toDouble
      (iid, hid, math.round(agree * 1e6) / 1e6)
    }.filter(_._3 >= minAgree)
  }

  test("indexed screening == in-JVM reference; bucketed index side joins shuffle-free") {
    val (hist, inc) = parts
    spark.sql("DROP TABLE IF EXISTS inc_dedup_spec_idx")
    IncrementalDedup.buildBandIndex(spark, hist, K, Bands, "inc_dedup_spec_idx")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val screened = IncrementalDedup.screenBatch(
        spark, "inc_dedup_spec_idx", inc, K, Bands, minAgree = 0.5)
      val plan = screened.queryExecution.executedPlan.toString
      // the index scan is bucketed and feeds the join directly: the only
      // Exchanges are the incoming side's and the pair-dedup's
      assert(plan.contains("Bucketed: true"), plan.take(3000))
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(3000)}")

      val got = screened.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = reference(0.5)
      assert(got.nonEmpty)
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS inc_dedup_spec_idx")
    }
  }

  test("append path auto-compacts: repeated appends trip the files-per-" +
      "bucket threshold, the rebuild restores ONE sorted file per bucket, " +
      "screening keeps its sort-elided plan, and no pair is lost") {
    val (hist, inc) = parts
    val table = "inc_dedup_spec_auto"
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    IncrementalDedup.buildBandIndex(spark, hist, K, Bands, table)
    assert(IncrementalDedup.maxFilesPerBucket(spark, table) == 1)
    try {
      // drive enough appends that a manual-rebuild index would decay:
      // threshold 2 → the third file in any bucket triggers compaction
      val slices = inc.orderBy("doc_id").limit(12).cache()
      (0 until 4).foreach { i =>
        val batch = slices.select(
          (col("doc_id") + lit((i + 1) * 1000000L)).as("doc_id"), col("sig"))
        IncrementalDedup.appendBatch(spark, batch, K, Bands, table,
          rebuildThreshold = 2)
      }
      // invariant held automatically — no manual rebuild step
      assert(IncrementalDedup.maxFilesPerBucket(spark, table) <= 2,
        s"buckets splintered to ${IncrementalDedup.maxFilesPerBucket(spark, table)} files")
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val screened = IncrementalDedup.screenBatch(
          spark, table, slices, K, Bands, minAgree = 0.99)
        val plan = screened.queryExecution.executedPlan.toString
        assert(plan.contains("Bucketed: true"), plan.take(3000))
        // the compacted index side must NOT re-sort: exactly one Sort
        // (the incoming side's) feeds the merge join
        val sorts = plan.linesIterator.count(l =>
          l.trim.matches(".*\\bSort \\[bkey.*"))
        assert(sorts <= 1, s"$sorts sorts — index-side sort not elided:\n" +
          plan.take(3000))
        // every appended replica of every slice doc is found at agree=1
        val got = screened.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        val ids = slices.collect().map(_.getLong(0)).toSet
        ids.foreach { id =>
          (1 to 4).foreach { i =>
            assert(got.contains((id, id + i * 1000000L, 1.0)),
              s"doc $id lost its appended replica from batch $i")
          }
        }
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally spark.sql(s"DROP TABLE IF EXISTS `$table`")
  }

  test("appendBatch keeps the index join-ready: a replayed doc matches itself at agree=1") {
    val (hist, inc) = parts
    spark.sql("DROP TABLE IF EXISTS inc_dedup_spec_idx2")
    IncrementalDedup.buildBandIndex(spark, hist, K, Bands, "inc_dedup_spec_idx2")
    IncrementalDedup.appendBatch(spark, inc, K, Bands, "inc_dedup_spec_idx2")
    try {
      // probe: one appended doc under a fresh id — its signature is in the
      // index now, so every band collides and agreement is exactly 1.0
      val incHead = inc.orderBy("doc_id").limit(1)
      val origId = incHead.collect()(0).getLong(0)
      val probe = incHead.select((col("doc_id") + 1000000L).as("doc_id"), col("sig"))
      val got = IncrementalDedup.screenBatch(
          spark, "inc_dedup_spec_idx2", probe, K, Bands, minAgree = 0.99)
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      assert(got.contains((origId, 1.0)), got.mkString(", "))
    } finally {
      spark.sql("DROP TABLE IF EXISTS inc_dedup_spec_idx2")
    }
  }
}
