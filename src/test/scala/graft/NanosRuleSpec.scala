package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.NanosPredicatePushdown

/** The optimizer rule derives raw-nanos scan predicates from AD-HOC filters
  * on the derived events timestamp (windowFilter adds them by hand; the
  * rule covers everything else). */
class NanosRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  private def withRule[T](f: => T): T = {
    val prev = classic.experimental.extraOptimizations
    classic.experimental.extraOptimizations = prev :+ NanosPredicatePushdown
    try f finally classic.experimental.extraOptimizations = prev
  }

  test("ad-hoc range filter on derived ts reaches the parquet scan") {
    withRule {
      // NOT via TimeseriesOps.windowFilter — a plain user filter
      val df = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
                col("ts") < lit("2024-01-12 00:00:00"))
        .select("event_id", "value")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(ts,1704844800000000000)"),
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
      assert(plan.contains("LessThan(ts,1705017600000000000)"))
    }
  }

  test("rule preserves results exactly (strict vs non-strict bounds)") {
    val base = graft.tables.Tables.events(spark, TestSpark.Sf0001)
    def slice(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ts") > lit("2024-01-10 12:00:00") &&
              col("ts") <= lit("2024-01-11 12:00:00"))
      .agg(count(lit(1)), sum(col("event_id"))).collect().toSeq
    val without = slice(base)
    val withR = withRule(slice(base))
    assert(without == withR)
  }

  test("rule is idempotent (no predicate duplication on re-run)") {
    withRule {
      val df = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .filter(col("ts") >= lit("2024-01-10 00:00:00"))
      val optimized = df.queryExecution.optimizedPlan
      val again = NanosPredicatePushdown(optimized)
      assert(again.toString == optimized.toString)
    }
  }
}
