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
      val df = graft.tables.Tables.events(spark, TestSpark.NanosFixtureDir)
        .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
                col("ts") < lit("2024-01-12 00:00:00"))
        .select("event_id", "value")
      val plan = df.queryExecution.executedPlan.toString
      // lower bound relaxed by 999 ns: valid on the negative-nanos domain
      // too (IntegralDivide truncates toward zero, not floor)
      assert(plan.contains("GreaterThanOrEqual(ts,1704844799999999001)"),
        plan.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
      assert(plan.contains("LessThan(ts,1705017600000000000)"))
    }
  }

  test("negative (pre-1970) nanos are never dropped by derived bounds") {
    import spark.implicits._
    val ns = Seq(-1500L, -1000L, -500L, -1L, 0L, 1L, 500L, 1000L, 1500L)
    def frame = ns.toDF("ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    // trunc-toward-zero: -999..-1 all map to epoch, so ts >= epoch keeps them
    def kept(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ts") >= lit(java.sql.Timestamp.from(java.time.Instant.EPOCH)))
      .select("ts_ns").collect().map(_.getLong(0)).sorted.toSeq
    val without = kept(frame)
    val withR = withRule(kept(frame))
    assert(without == Seq(-500L, -1L, 0L, 1L, 500L, 1000L, 1500L))
    assert(withR == without)
  }

  test("rule preserves results exactly (strict vs non-strict bounds)") {
    val base = graft.tables.Tables.events(spark, TestSpark.NanosFixtureDir)
    def slice(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("ts") > lit("2024-01-10 12:00:00") &&
              col("ts") <= lit("2024-01-11 12:00:00"))
      .agg(count(lit(1)), sum(col("event_id"))).collect().toSeq
    val without = slice(base)
    val withR = withRule(slice(base))
    assert(without == withR)
  }

  test("rule is a pure no-op on native-timestamp (micros) events") {
    withRule {
      // current driver testdata: ts is native TIMESTAMP_MICROS — no nanos
      // shape exists for the rule to match, and no shadow column appears
      val df = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .filter(col("ts") >= lit("2024-01-10 00:00:00"))
      assert(!df.columns.contains(graft.tables.Tables.EventsTsNanosCol))
      val optimized = df.queryExecution.optimizedPlan
      assert(NanosPredicatePushdown(optimized).toString == optimized.toString)
    }
  }

  test("nanos-layout and native-micros-layout reads are value-identical") {
    def slice(dir: String) = {
      val d = graft.tables.Tables.events(spark, dir)
      d.filter(col("ts") > lit("2024-01-08 00:00:00") &&
               col("ts") <= lit("2024-01-14 00:00:00"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s"),
             max(col("ts")).as("mx"), min(col("ts")).as("mn"))
        .collect().toSeq
    }
    assert(slice(TestSpark.Sf0001) == slice(TestSpark.NanosFixtureDir))
  }

  test("rule is idempotent (no predicate duplication on re-run)") {
    withRule {
      val df = graft.tables.Tables.events(spark, TestSpark.NanosFixtureDir)
        .filter(col("ts") >= lit("2024-01-10 00:00:00"))
      val optimized = df.queryExecution.optimizedPlan
      val again = NanosPredicatePushdown(optimized)
      assert(again.toString == optimized.toString)
    }
  }
}
