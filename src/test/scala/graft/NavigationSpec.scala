package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import graft.plans.RollupNavigation

/** Aggregate navigation ([[RollupNavigation]]): the rewrite fires only
  * for the registered definition, is invisible to results, and vetoes
  * itself on any mismatch. */
class NavigationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dailyAgg(): DataFrame =
    graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .withColumn("day", to_date(col("ts")))
      .groupBy("day").agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 1e6, 0).cast("long")).as("sum_micro"))

  private def aggCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  private def cleanup(): Unit = {
    spark.conf.unset(RollupNavigation.TargetKey)
    spark.conf.unset(RollupNavigation.SignatureKey)
  }

  test("navigated query reads the MV — no Aggregate in the plan — and " +
      "returns exactly the re-aggregated answer") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      // expected answer BEFORE registration (plain aggregation)
      val expected = dailyAgg().orderBy("day").collect().toSeq
      RollupNavigation.materialize(spark, dailyAgg(), target)
      val q = dailyAgg().orderBy("day")
      assert(aggCount(q) == 0,
        s"navigation did not fire:\n${q.queryExecution.optimizedPlan}")
      val scanned = q.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString).mkString(",")
            case _ => ""
          }
      }.mkString(";")
      assert(scanned.contains("nav_mv"), s"scanned: $scanned")
      assert(q.collect().toSeq == expected)
    } finally cleanup()
  }

  test("a different aggregate over the same source still aggregates — " +
      "signature mismatch vetoes the rewrite") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      RollupNavigation.materialize(spark, dailyAgg(), target)
      val other = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .withColumn("day", to_date(col("ts")))
        .groupBy("day").agg(max(col("value")).as("mx"))
      assert(aggCount(other) >= 1, "unrelated aggregate was rewritten")
    } finally cleanup()
  }

  test("schema mismatch at the target vetoes the rewrite instead of " +
      "producing a broken plan") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      RollupNavigation.materialize(spark, dailyAgg(), target)
      // poison the target: same signature registered, but the files now
      // hold a different schema — substitute() must refuse
      spark.conf.set(RollupNavigation.TargetKey,
        s"${TestSpark.Sf0001}/documents.parquet")
      val q = dailyAgg()
      assert(aggCount(q) >= 1, "rewrite proceeded against a foreign schema")
      assert(q.count() > 0)
    } finally cleanup()
  }

  test("unregistered session never rewrites") {
    cleanup()
    assert(aggCount(dailyAgg()) >= 1)
  }

  test("a day-range filter navigates too: pushed below the aggregate by " +
      "the optimizer, proven group-factoring, remapped onto the MV") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      val range = (df: DataFrame) => df.filter(
        col("day") >= lit("2024-01-08").cast("date") &&
        col("day") < lit("2024-01-15").cast("date"))
      val expected = range(dailyAgg()).orderBy("day").collect().toSeq
      RollupNavigation.materialize(spark, dailyAgg(), target)
      val q = range(dailyAgg()).orderBy("day")
      assert(aggCount(q) == 0,
        s"filtered navigation did not fire:\n${q.queryExecution.optimizedPlan}")
      assert(q.collect().toSeq == expected)
      // the remapped predicate reaches the MV scan: parquet row-group
      // pruning on the rollup comes free after the rewrite
      val pushed = q.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("PushedFilters")).mkString
      assert(pushed.contains("GreaterThanOrEqual(day") ||
        pushed.contains("day"), pushed)
    } finally cleanup()
  }

  test("maintenance handoff: after the MV advances in place, register() " +
      "re-points navigation and the query serves the fresh version") {
    val target = new java.io.File("target/fixtures/nav_mv2").getAbsolutePath
    try {
      RollupNavigation.materialize(spark, dailyAgg(), target)
      // the IVM stand-in: the target advances in place (here: a version
      // with every count doubled — distinguishable from the original)
      val advanced = dailyAgg().withColumn("n", col("n") * 2)
      spark.conf.unset(RollupNavigation.SignatureKey) // write w/o navigating
      advanced.write.mode("overwrite").parquet(target)
      RollupNavigation.register(spark, dailyAgg(), target)
      val q = dailyAgg().orderBy("day")
      assert(aggCount(q) == 0, "navigation did not re-fire after register()")
      // freshness contract: the navigated answer IS the advanced content
      val got = q.collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val want = advanced.collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(got == want)
    } finally cleanup()
  }

  test("a SUBSET of the MV's measures navigates to a projection of it — " +
      "the common serving case") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      RollupNavigation.materialize(spark, dailyAgg(), target)
      // query only (day, n): fewer measures than the registered view
      val q = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .withColumn("day", to_date(col("ts")))
        .groupBy("day").agg(count(lit(1)).as("n"))
        .orderBy("day")
      assert(aggCount(q) == 0,
        s"subset query did not navigate:\n${q.queryExecution.optimizedPlan}")
      val expected = dailyAgg().select("day", "n").orderBy("day")
        .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toSeq
      assert(q.collect().map(r => r.getDate(0).toString -> r.getLong(1))
        .toSeq == expected)
    } finally cleanup()
  }

  test("an intra-group predicate (hour of ts) vetoes navigation — it " +
      "cuts within groups, which an MV cannot answer") {
    val target = new java.io.File("target/fixtures/nav_mv").getAbsolutePath
    try {
      RollupNavigation.materialize(spark, dailyAgg(), target)
      val q = graft.tables.Tables.events(spark, TestSpark.Sf0001)
        .filter(hour(col("ts")) === 3)
        .withColumn("day", to_date(col("ts")))
        .groupBy("day").agg(
          count(lit(1)).as("n"),
          sum(round(col("value") * 1e6, 0).cast("long")).as("sum_micro"))
      assert(aggCount(q) >= 1,
        s"intra-group filter was navigated:\n${q.queryExecution.optimizedPlan}")
    } finally cleanup()
  }
}
