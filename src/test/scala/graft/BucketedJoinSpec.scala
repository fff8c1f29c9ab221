package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing demo: pre-shuffled co-located joins (SURVEY §4 "Partitioning &
  * shuffle"). At 100 TB the lineitem ⋈ orders shuffle dominates the join;
  * bucketing both tables on the join key at ingest removes the Exchange
  * from every subsequent join. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits a planted hot key at runtime (skew=true in the " +
       "executed sort-merge join)") {
    // The contract's manual mitigation is salting (q_salted_join); this
    // pins the AUTOMATIC path: AQE's OptimizeSkewedJoin detects a
    // reducer partition far above the median at runtime and splits it,
    // visible as `skew=true` on the executed SMJ — the reason PERF.md's
    // r9 audit kept AQE defaults ON. Thresholds are lowered to make the
    // toy-scale skew eligible (production sizes trip the defaults).
    import spark.implicits._
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.get(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // left: one hot key with 200k wide incompressible rows + uniform
      // tail; right: the key set. The aggregate CONSUMES the payload —
      // column pruning would otherwise strip it before the exchange and
      // the shuffled rows (bare 8-byte keys) would sit under the skew
      // threshold (how this test was first defeated).
      val hot = spark.range(200000).select(lit(7L).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string"))).as("pay"))
      val tail = spark.range(2000).select((col("id") % 100 + 100).as("k"),
        concat(lit("t"), col("id").cast("string")).as("pay"))
      val left = hot.unionByName(tail)
      val right = spark.range(200).select(col("id").as("k"),
        (col("id") * 2).as("attr"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(length(col("pay"))).as("s"))
      val row = joined.collect()(0)
      assert(row.getLong(0) == 202000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "expected a skew-split SMJ in:\n" + plan.take(3000))
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("joins on co-bucketed tables plan without a shuffle on the bucketed side") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val li = graft.tables.Tables.lineitem(spark, TestSpark.Sf0001)
    val o = graft.tables.Tables.orders(spark, TestSpark.Sf0001)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_bucketed").mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_bucketed").mode("overwrite").saveAsTable("o_bucketed")

    // force the shuffle-join path (at sf0.001 auto-broadcast would win;
    // at fact-fact scale broadcast is off the table and THIS plan is what
    // bucketing buys)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    // bucketed join: SortMergeJoin with NO Exchange below it on either side
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    val joinIdx = plan.indexOf("Join")
    val exchangesBeforeAgg = plan.linesIterator
      .filter(_.contains("Exchange")).size
    // only the final groupBy aggregation may shuffle — the join itself must not
    assert(exchangesBeforeAgg <= 1, plan)

    // and the result matches the plain (shuffling) join
    val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }

    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
