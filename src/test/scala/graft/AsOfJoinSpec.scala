package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.JoinOps

/** The custom as-of physical operator ([[graft.plans.AsOfJoinExec]]):
  * hand-case semantics, equivalence to the window composition on real
  * data, the one documented divergence (NULL keys), the type-envelope
  * fallback, and the physical plan shape (merge node, no union/window,
  * co-partitioning exchanges — the SMJ-class plan the node declares). */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def probes = Seq(
    (10L, 1L, "2024-01-01 12:00:00"), // after two events → latest wins
    (11L, 1L, "2024-01-01 10:00:00"), // exactly AT an event → ties match
    (12L, 1L, "2024-01-01 08:00:00"), // pre-history → NULL payload
    (13L, 2L, "2024-01-01 12:00:00")  // key with no events at all
  ).map { case (o, u, t) => (o, u, ts(t)) }.toDF("o", "user_id", "ts")

  private def events = Seq(
    (1L, "2024-01-01 09:00:00", 1.0, 100L),
    (1L, "2024-01-01 10:00:00", 2.0, 200L),
    (1L, "2024-01-01 10:00:00", 3.0, 300L) // same ts, higher tie → wins
  ).map { case (u, t, v, e) => (u, ts(t), v, e) }.toDF("user_id", "ts", "value", "event_id")

  test("hand case: latest-at-or-before, same-ts visibility, tie to " +
      "highest tieBreak, NULL payload for pre-history and unmatched keys") {
    val got = JoinOps.asofJoinMerge(probes, events, "user_id", "ts",
        Seq("value", "event_id"), "event_id")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got(10L) == ((Some(3.0), Some(300L)))) // 10:00 pair, tie 300
    assert(got(11L) == ((Some(3.0), Some(300L)))) // ties match (>= join)
    assert(got(12L) == ((None, None)))
    assert(got(13L) == ((None, None)))
  }

  test("merge operator ≡ window composition on the real tables") {
    val p = graft.tables.Tables.orders(spark, TestSpark.Sf0001).select(
      col("o_orderkey"), (col("o_custkey") % 150).as("user_id"),
      to_timestamp(concat(lit("2024-01-"),
        lpad((col("o_orderkey") % 28 + 1).cast("string"), 2, "0"),
        lit(" 00:00:00"))).as("ts"))
    val ev = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id", "ts", "value", "event_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        Option(r.get(3)), Option(r.get(4)))).sortBy(_._1).toSeq
    val merge = rows(JoinOps.asofJoinMerge(p, ev, "user_id", "ts",
      Seq("value", "event_id"), "event_id"))
    val comp = rows(JoinOps.asofJoinComposed(p, ev, "user_id", "ts",
      Seq("value", "event_id"), "event_id"))
    assert(merge == comp)
    assert(merge.nonEmpty && merge.exists(_._4.isDefined) &&
      merge.exists(_._4.isEmpty)) // both outcomes exercised
  }

  test("NULL-key probe emits NULL payload (SQL equi-join semantics — " +
      "the documented divergence from the window composition)") {
    val p = Seq((1L, Option(1L), "2024-01-01 12:00:00"),
        (2L, Option.empty[Long], "2024-01-01 12:00:00"))
      .map { case (o, u, t) => (o, u, ts(t)) }.toDF("o", "user_id", "ts")
    val got = JoinOps.asofJoinMerge(p, events, "user_id", "ts",
        Seq("value"), "event_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(1L) == Some(3.0))
    assert(got(2L).isEmpty, "null key must not match")
  }

  test("widened envelope: STRING keys run the merge operator " +
      "(UTF8String comparison path), result correct incl. null keys") {
    val p = probes.withColumn("user_id",
      when(col("o") === 13L, lit(null).cast("string"))
        .otherwise(concat(lit("u"), col("user_id"))))
    val e = events.withColumn("user_id", concat(lit("u"), col("user_id")))
    val df = JoinOps.asofJoinMerge(p, e, "user_id", "ts",
      Seq("value"), "event_id")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(10L) == Some(3.0)) // latest-at-or-before, tie to 300
    assert(got(11L) == Some(3.0)) // ties match
    assert(got(12L).isEmpty)      // pre-history
    assert(got(13L).isEmpty)      // NULL string key never matches
  }

  test("widened envelope: INT keys are widened to long through a temp " +
      "column — merge node planned, output schema keeps the int key") {
    val p = probes.withColumn("user_id", col("user_id").cast("int"))
    val e = events.withColumn("user_id", col("user_id").cast("int"))
    val df = JoinOps.asofJoinMerge(p, e, "user_id", "ts",
      Seq("value"), "event_id")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.schema("user_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(df.columns.toSeq == Seq("o", "user_id", "ts", "value"))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(10L) == Some(3.0) && got(12L).isEmpty && got(13L).isEmpty)
  }

  test("type envelope: MISMATCHED time types (long probe ts vs timestamp " +
      "event ts) never reach the merge — raw longs must not be compared " +
      "to epoch-micros; the fallback fails LOUDLY at the union type check") {
    val p = probes.withColumn("ts", col("ts").cast("long"))
    // before the envelope fix this planned AsOfJoinExec and silently
    // produced wrong matches; now it routes to the composition, whose
    // union rejects the incompatible column — an error, never bad rows
    intercept[org.apache.spark.sql.AnalysisException] {
      JoinOps.asofJoinMerge(p, events, "user_id", "ts",
        Seq("value"), "event_id").collect()
    }
    // both sides carrying the SAME long encoding is eligible and correct
    val e2 = events.withColumn("ts", col("ts").cast("long"))
    val df2 = JoinOps.asofJoinMerge(p, e2, "user_id", "ts",
      Seq("value"), "event_id")
    assert(df2.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val got = df2.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(10L) == Some(3.0) && got(12L).isEmpty)
  }

  test("primary asofJoin entry point DELEGATES to the merge operator on " +
      "eligible types (plan shows AsOfJoin, no Window/Union)") {
    val df = JoinOps.asofJoin(probes, events, "user_id", "ts",
      Seq("value", "event_id"), "event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("Window") && !plan.contains("Union"), plan.take(2000))
    val got = df.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(got(10L) == Some(3.0) && got(13L).isEmpty)
  }

  test("randomized agreement: merge ≡ composition over seeded adversarial " +
      "shapes (dense ties, empty keys, pre-history, duplicate timestamps)") {
    val rnd = new scala.util.Random(20260815L)
    // small key domain forces collisions; coarse time grid forces ties
    val evRows = Seq.fill(400) {
      (rnd.nextInt(8).toLong,
        ts(f"2024-01-${rnd.nextInt(9) + 1}%02d ${rnd.nextInt(4) * 6}%02d:00:00"),
        rnd.nextInt(100) / 10.0, rnd.nextInt(1000).toLong)
    }
    val prRows = Seq.tabulate(300) { i =>
      (i.toLong, rnd.nextInt(10).toLong, // keys 8,9 have no events
        ts(f"2024-01-${rnd.nextInt(10) + 1}%02d ${rnd.nextInt(4) * 6}%02d:00:00"))
    }
    val ev = evRows.toDF("user_id", "ts", "value", "event_id")
      // duplicate (key, ts, tie) rows must not break determinism either
      .unionByName(evRows.take(50).toDF("user_id", "ts", "value", "event_id"))
    val pr = prRows.toDF("o", "user_id", "ts")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), Option(r.get(3)), Option(r.get(4))))
      .sortBy(_._1).toSeq
    val merge = rows(JoinOps.asofJoinMerge(pr, ev, "user_id", "ts",
      Seq("value", "event_id"), "event_id"))
    val comp = rows(JoinOps.asofJoinComposed(pr, ev, "user_id", "ts",
      Seq("value", "event_id"), "event_id"))
    assert(merge.size == 300)
    val diffs = merge.zip(comp).filter { case (a, b) => a != b }
    assert(diffs.isEmpty, s"${diffs.size} rows diverge, first: ${diffs.headOption}")
    assert(merge.exists(_._2.isEmpty) && merge.exists(_._2.isDefined))
  }

  test("plan shape: one AsOfJoin merge node, key-hash exchanges on both " +
      "sides, NO window and NO union (the composition's machinery)") {
    val df = JoinOps.asofJoinMerge(probes, events, "user_id", "ts",
      Seq("value", "event_id"), "event_id")
    df.collect() // materialize through AQE so the final plan is real
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(2000))
    assert(!plan.contains("Window") && !plan.contains("Union"), plan.take(2000))
    // AQE's final-plan rendering repeats each exchange (stage tree +
    // stage reference): count DISTINCT exchange plan ids, not lines
    val exchangeIds = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning(user_id"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .toSet
    assert(exchangeIds.size == 2, plan.take(3000))
    // sorts render with codegen prefixes (`*(1) Sort [...]`) — match on
    // the operator token, one per side with the declared key+time order
    assert(plan.linesIterator.count(l =>
      l.contains(" Sort [user_id") && l.contains("ts")) >= 2,
      plan.take(3000))
  }
}
