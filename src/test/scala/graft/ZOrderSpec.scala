package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder2

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit interleave matches a reference implementation") {
    def refInterleave(a: Int, b: Int): Long = {
      val ua = (a.toLong & 0xFFFFFFFFL) ^ 0x80000000L
      val ub = (b.toLong & 0xFFFFFFFFL) ^ 0x80000000L
      var out = 0L
      for (i <- 0 until 32) {
        out |= ((ua >> i) & 1L) << (2 * i)
        out |= ((ub >> i) & 1L) << (2 * i + 1)
      }
      out ^ 0x8000000000000000L
    }
    val cases = Seq((0, 0), (1, 0), (0, 1), (5, 3), (12345, 67890),
      (-1, 7), (Int.MaxValue, Int.MinValue))
    cases.foreach { case (a, b) =>
      assert(ZOrder2.interleave(a.toLong, b.toLong) == refInterleave(a, b), (a, b))
    }
  }

  test("expression evaluates through codegen and preserves per-dim order locally") {
    val df = Seq((0, 0), (0, 1), (1, 0), (1, 1), (2, 2)).toDF("a", "b")
      .withColumn("z", ZOrder2.z_order(col("a"), col("b")))
    val z = df.orderBy("a", "b").collect().map(_.getLong(2))
    assert(z.distinct.length == z.length)       // injective on distinct inputs
    assert(z.head == ZOrder2.interleave(0L, 0L))
  }

  test("signed-long key order: negatives sort below positives on either dim") {
    assert(ZOrder2.interleave(0L, -1L) < ZOrder2.interleave(0L, 0L))
    assert(ZOrder2.interleave(-1L, 0L) < ZOrder2.interleave(0L, 0L))
    assert(ZOrder2.interleave(0L, 0L) < ZOrder2.interleave(0L, 1L))
    assert(ZOrder2.interleave(0L, 0L) < ZOrder2.interleave(1L, 0L))
  }

  test("z-order clustering yields tighter 2-D chunk bounding boxes than 1-D sort") {
    // dims min-max scaled (from the data's actual bounds) to 16 bits each —
    // unequal bit widths would let the wider dim dominate the interleave
    // (see ZOrder2 scaladoc)
    val raw = graft.tables.Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id").cast("double").as("ur"),
        (unix_timestamp(col("ts")) % 2592000).cast("double").as("tr"))
    val b = raw.agg(min("ur"), max("ur"), min("tr"), max("tr")).head()
    val (uMin, uMax, tMin, tMax) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val ev = raw.select(
      (((col("ur") - uMin) / (uMax - uMin)) * 65535).cast("int").as("u"),
      (((col("tr") - tMin) / (tMax - tMin)) * 65535).cast("int").as("t"))
    def chunkCost(sorted: org.apache.spark.sql.DataFrame): Double = {
      val rows = sorted.collect().map(r => (r.getInt(0), r.getInt(1)))
      rows.grouped(100).map { chunk =>
        val us = chunk.map(_._1); val ts = chunk.map(_._2)
        // row-group "selectivity cost": fraction of each dim's domain the
        // chunk's min/max span covers (what stats-based pruning sees)
        (us.max - us.min).toDouble / 65535 + (ts.max - ts.min).toDouble / 65535
      }.sum
    }
    val byTime = chunkCost(ev.orderBy("t"))
    val byZ = chunkCost(ev.orderBy(ZOrder2.z_order(col("u"), col("t"))))
    // time-sort leaves every chunk spanning all users; z-order must beat it.
    // (The margin grows with dim cardinality — sf0.001 has only 15 users, so
    // ~15-20% here; wider dims prune far harder.)
    assert(byZ < byTime, s"z=$byZ time=$byTime")
  }

  test("q_zorder_layout files are bounded 128x128 tiles covering all rows") {
    // a 14-bit z-range cut = a 2^7 x 2^7 tile: every "file" must bound BOTH
    // dimensions within 128 — the property that makes min/max stats prune
    // scans filtered on either dimension
    val rows = SparkEntry.queries("q_zorder_layout")(spark, TestSpark.Sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (xMin, xMax, yMin, yMax) =
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))
      assert(xMax - xMin < 128 && yMax - yMin < 128, r)
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read
      .parquet(s"${TestSpark.Sf0001}/events.parquet").count())
  }
}
