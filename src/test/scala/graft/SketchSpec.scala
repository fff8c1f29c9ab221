package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Approximate-sketch error bounds vs exact answers — the 100 TB path for
  * cardinality/quantile questions where exact shuffles are unaffordable.
  * (No DuckDB oracle by nature; bounds pinned here instead.) */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct within 5% of exact per group") {
    val ev = graft.tables.Tables.events(spark, TestSpark.Sf0001)
    val rows = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact"),
           approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("approx_percentile within 2% relative error of exact interpolated median") {
    val ev = graft.tables.Tables.events(spark, TestSpark.Sf0001)
    val rows = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("exact"),
           expr("approx_percentile(value, 0.5, 1000)").as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / math.max(math.abs(e), 1.0) <= 0.02,
        s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
