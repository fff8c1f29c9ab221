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
