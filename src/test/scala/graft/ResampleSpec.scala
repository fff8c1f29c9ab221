package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Pins the pandas-resample-compatibility traps from SURVEY §7.5. */
class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("A1 buckets anchor to midnight (origin='start_day' parity)") {
    val df = Seq(
      (ts("2024-03-05 00:04:59"), 1.0), // bucket 00:00
      (ts("2024-03-05 00:05:00"), 3.0), // bucket 00:05 (left-closed)
      (ts("2024-03-05 00:09:59"), 5.0), // bucket 00:05
      (ts("2024-03-05 23:55:00"), 7.0)  // bucket 23:55
    ).toDF("ts", "value")
    val got = ResampleOps.resampleMean(df, "ts", "value", "5m")
      .orderBy("bucket_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-03-05 00:00:00.0", 1.0, 1L),
      ("2024-03-05 00:05:00.0", 4.0, 2L),
      ("2024-03-05 23:55:00.0", 7.0, 1L)))
  }

  test("NaN treated as missing (skipna), all-NaN bucket dropped (P5)") {
    val df = Seq(
      (ts("2024-03-05 00:00:01"), 2.0),
      (ts("2024-03-05 00:00:02"), Double.NaN),
      (ts("2024-03-05 01:00:00"), Double.NaN) // bucket with only NaN → dropped
    ).toDF("ts", "value")
    val got = ResampleOps.resampleMean(df, "ts", "value", "1h")
      .orderBy("bucket_start")
      .collect().map(r => (r.getTimestamp(0).toString, r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2024-03-05 00:00:00.0", 2.0, 1L)))
  }

  test("P4 finite filter drops NULL/NaN/±Inf only") {
    val df = Seq(Some(1.5), Some(Double.NaN), Some(Double.PositiveInfinity),
      Some(Double.NegativeInfinity), None, Some(-2.5)).toDF("v")
    val kept = TimeseriesOps.finiteOnly(df, "v").collect().map(_.getDouble(0)).sorted
    assert(kept.toSeq == Seq(-2.5, 1.5))
  }

  test("A4 time-of-day summary groups across days") {
    val df = Seq(
      (ts("2024-03-05 06:30:00"), "63", 10.0),
      (ts("2024-03-06 06:30:00"), "63", 20.0), // same tod, next day
      (ts("2024-03-05 06:30:00"), "125", 5.0)
    ).toDF("ts", "band", "value")
    val got = DailySummaryOps.timeOfDaySummary(df, "ts", "band", "value")
      .orderBy("tod", "band")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("06:30:00", "125", 5.0, 5.0, 5.0, 1L),
      ("06:30:00", "63", 15.0, 10.0, 20.0, 2L)))
  }

  test("A5 tod bucketing is midnight-anchored with HH:mm:ss label round-trip") {
    val df = Seq(
      (ts("2024-03-05 00:14:59"), 2.0),
      (ts("2024-03-06 00:00:30"), 4.0), // different day, same first bucket
      (ts("2024-03-05 23:59:59"), 8.0)
    ).toDF("ts", "value")
    val got = DailySummaryOps.todBucketMean(df, "ts", "value", 900)
      .orderBy("tod_bucket")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("00:00:00", 3.0), ("23:45:00", 8.0)))
  }

  test("J3 last-wins merge prefers the later chunk on key collision") {
    val c1 = Seq(("2024-01-01", 1.0), ("2024-01-02", 2.0)).toDF("day", "v")
    val c2 = Seq(("2024-01-02", 99.0), ("2024-01-03", 3.0)).toDF("day", "v")
    val got = MergeOps.lastWinsMerge(Seq(c1, c2), Seq("day"))
      .orderBy("day").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("2024-01-01", 1.0), ("2024-01-02", 99.0), ("2024-01-03", 3.0)))
  }

  test("pivot/unpivot round-trip: toLong(toWide(x)) == x, numeric band order") {
    import graft.ops.BandOps
    val long = Seq(
      ("t1", "63", 1.0), ("t1", "125", 2.0), ("t2", "63", 3.0))
      .toDF("ts", "band", "value")
    val wide = BandOps.toWide(long, "ts", "band", "value")
    // numeric label order, not lexicographic ("125" < "63" as strings)
    assert(wide.columns.toSeq == Seq("ts", "63", "125"))
    val back = BandOps.toLong(wide, "ts", "band", "value")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(back == long.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet)
    // the t2/125 NULL cell introduced by the pivot is dropped, not emitted
    assert(back.size == 3)
  }

  test("U3 schema consistency guard raises AggregationError") {
    val c1 = Seq((1, 2.0)).toDF("a", "b")
    val c2 = Seq((1, "x")).toDF("a", "c")
    assertThrows[graft.planner.Errors.AggregationError] {
      MergeOps.requireSameSchema(Seq(c1, c2))
    }
  }
}
