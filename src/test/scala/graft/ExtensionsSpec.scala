package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions

/** The native kernels are usable from plain SQL once registered
  * (`GraftFunctions.register` — same builders the SparkSessionExtensions
  * path injects at session build). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftFunctions.register(s)
    s
  }

  test("vector_dot from SQL") {
    val dot = spark.sql(
      "SELECT vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
  }

  test("word_shingles from SQL") {
    val sh = spark.sql("SELECT word_shingles('a b c d', 3) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("hyperplane_bands from SQL: band count, bucket range, determinism") {
    val q = "SELECT hyperplane_bands(array(CAST(0.5 AS DOUBLE), " +
      "CAST(-1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)), 3, 8) AS b"
    val a = spark.sql(q).head().getSeq[Long](0)
    val b = spark.sql(q).head().getSeq[Long](0)
    assert(a.length == 8)
    assert(a.forall(v => v >= 0 && v < 8))
    assert(a == b)
  }

  test("minhash_sig and simhash64 aggregates from SQL") {
    val r = spark.sql(
      """SELECT minhash_sig(h, 16) AS sig, simhash64(h) AS fp FROM
        |(SELECT xxhash64(x) AS h FROM VALUES ('a'), ('b'), ('c') AS t(x))
        |""".stripMargin).head()
    assert(r.getSeq[Long](0).length == 16)
    // deterministic across invocations
    val again = spark.sql(
      """SELECT simhash64(h) AS fp FROM
        |(SELECT xxhash64(x) AS h FROM VALUES ('a'), ('b'), ('c') AS t(x))
        |""".stripMargin).head().getLong(0)
    assert(again == r.getLong(1))
  }

  test("topk_by and topk_by_pay aggregates from SQL") {
    val r = spark.sql(
      """SELECT g, topk_by(m, id, 2) AS tk, topk_by_pay(m, id, p, 2) AS tkp
        |FROM VALUES (0, 50L, 7L, 700L), (0, 90L, 9L, 900L), (0, 70L, 2L, 200L)
        |  AS t(g, m, id, p)
        |GROUP BY g""".stripMargin).head()
    val tk = r.getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getLong(0), e.getLong(1)))
    val tkp = r.getSeq[org.apache.spark.sql.Row](2)
      .map(e => (e.getLong(0), e.getLong(1), e.getLong(2)))
    assert(tk == Seq((90L, 9L), (70L, 2L)))
    assert(tkp == Seq((90L, 9L, 900L), (70L, 2L, 200L)))
  }

  test("a FRESH session built with GraftExtensions plans AsOfJoinPlan → " +
      "AsOfJoinExec with no manual strategy injection") {
    // newSession() clones session state from the extensions-built parent
    // but shares nothing mutable — in particular it does NOT inherit any
    // experimental.extraStrategies a prior JoinOps call self-registered,
    // so a strategy resolved here can only have come from the
    // SparkSessionExtensions wiring
    val fresh = TestSpark.spark.newSession()
    assert(fresh.experimental.extraStrategies.isEmpty,
      "precondition: no self-registered strategies on the fresh session")
    import fresh.implicits._
    val probes = Seq((1L, 5L, "p")).toDF("user_id", "ts", "tag")
    val events = Seq((1L, 3L, 9.0, 1L)).toDF("user_id", "ts", "value", "event_id")
    def attr(df: org.apache.spark.sql.DataFrame, n: String) =
      df.queryExecution.analyzed.output.find(_.name == n).get
    val df = org.apache.spark.sql.graftbridge.PlanBridge.ofRows(fresh,
      graft.plans.AsOfJoinPlan(
        probes.queryExecution.analyzed, events.queryExecution.analyzed,
        attr(probes, "user_id"), attr(events, "user_id"),
        attr(probes, "ts"), attr(events, "ts"),
        attr(events, "event_id"), Seq(attr(events, "value"))))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.collect().map(_.getDouble(3)).toSeq == Seq(9.0))
  }

  test("nanos-pushdown optimizer rule is active on the extensions-built " +
      "session (injectOptimizerRule wiring)") {
    val fresh = TestSpark.spark.newSession()
    val batches = fresh.sessionState.optimizer.batches.flatMap(_.rules)
    assert(batches.exists(_ eq graft.plans.NanosPredicatePushdown),
      "NanosPredicatePushdown must be injected by GraftExtensions")
  }

  test("gram_micro aggregate from SQL") {
    val g = spark.sql(
      """SELECT gram_micro(v, 2) AS g FROM VALUES
        |(array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)""".stripMargin)
      .selectExpr("explode(g) AS e")
      .select("e.i", "e.j", "e.s")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(g == Seq((1, 1, 10000000L), (1, 2, 14000000L), (2, 2, 20000000L)))
  }
}
