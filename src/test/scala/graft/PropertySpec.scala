package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Property-based invariants the reference encodes implicitly (SURVEY §5.2).
  * Generators are driven directly (scalatestplus bridge unavailable in the
  * offline dependency set): each property checks 10 generated cases. */
class PropertySpec extends AnyFunSuite {

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit = {
    val rng = new scala.util.Random(42)
    (0 until 10).foreach { _ =>
      val a = Iterator.continually(ga.sample).flatten.next()
      val b = Iterator.continually(gb.sample).flatten.next()
      f(a, b)
    }
    rng.nextInt() // keep rng referenced
  }

  private def forAll[A](ga: Gen[A])(f: A => Unit): Unit =
    forAll(ga, Gen.const(0))((a, _) => f(a))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb), gc)((ab, c) => f(ab._1, ab._2, c))
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val baseEpoch = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private val seriesGen: Gen[List[(Long, Double)]] = Gen.nonEmptyListOf(for {
    offset <- Gen.choose(0L, 3L * 86400 * 1000)     // 3 days
    value <- Gen.oneOf(Gen.choose(-200.0, 200.0), Gen.const(Double.NaN))
  } yield (baseEpoch + offset, value))

  test("bucket starts are interval-aligned and every emitted mean is finite") {
    forAll(seriesGen, Gen.oneOf("10s", "1m", "5m", "15m", "1h", "1d")) {
      (rows, interval) =>
        val df = rows.map { case (ms, v) => (new Timestamp(ms), v) }.toDF("ts", "value")
        val out = ResampleOps.resampleMean(df, "ts", "value", interval).collect()
        val secs = ResampleOps.IntervalSeconds(interval)
        out.foreach { r =>
          assert(r.getTimestamp(0).getTime / 1000 % secs == 0)   // epoch-aligned
          assert(java.lang.Double.isFinite(r.getDouble(1)))      // NaN skipped
          assert(r.getLong(2) > 0)                               // P5: no empty buckets
        }
        // point counts sum to the number of non-NaN inputs
        assert(out.map(_.getLong(2)).sum == rows.count(r => !r._2.isNaN))
    }
  }

  test("union-of-chunks ≡ single scan for resample (the chunk loop is safe to kill)") {
    forAll(seriesGen, Gen.choose(baseEpoch, baseEpoch + 3L * 86400 * 1000)) {
      (rows, splitMs) =>
        val df = rows.map { case (ms, v) => (new Timestamp(ms), v) }.toDF("ts", "value")
        val whole = ResampleOps.resampleMean(df, "ts", "value", "1d")
          .collect().map(r => r.getTimestamp(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
        // split at a DAY boundary (the reference chunks on day/month
        // boundaries precisely so buckets never straddle chunks)
        val dayMs = 86400 * 1000L
        val alignedSplit = splitMs / dayMs * dayMs
        val c1 = df.filter(col("ts") < lit(new Timestamp(alignedSplit)))
        val c2 = df.filter(col("ts") >= lit(new Timestamp(alignedSplit)))
        val chunked = ResampleOps.resampleMean(c1, "ts", "value", "1d")
          .unionByName(ResampleOps.resampleMean(c2, "ts", "value", "1d"))
          .collect().map(r => r.getTimestamp(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
        assert(chunked.keySet == whole.keySet)
        chunked.foreach { case (k, (mean, n)) =>
          val (wMean, wN) = whole(k)
          assert(n == wN)
          // equal modulo FP summation-order noise
          assert(math.abs(mean - wMean) <= 1e-9 * math.max(1.0, math.abs(wMean)))
        }
    }
  }

  test("band filter keeps exactly the labels in [low, high]") {
    val bandGen = Gen.listOf(Gen.oneOf(
      Gen.choose(10.0, 10000.0).map(_.toString), Gen.const("not_a_band")))
    forAll(bandGen, Gen.choose(10.0, 5000.0), Gen.choose(0.0, 5000.0)) {
      (labels: List[String], lo: Double, span: Double) =>
        val hi = lo + span
        val df = labels.zipWithIndex.map { case (b, i) => (i, b) }.toDF("id", "band")
        val kept = BandOps.bandRange(df, "band", lo, hi).collect().map(_.getString(1))
        kept.foreach { b =>
          val d = b.toDouble // never "not_a_band"
          assert(d >= lo && d <= hi)
        }
        val expected = labels.count(b =>
          scala.util.Try(b.toDouble).toOption.exists(d => d >= lo && d <= hi))
        assert(kept.length == expected)
    }
  }

  test("expected_point_count ≥ emitted points for any window (A9 bound)") {
    forAll(seriesGen) { rows =>
      val start = java.time.Instant.ofEpochMilli(baseEpoch)
      val end = java.time.Instant.ofEpochMilli(baseEpoch + 86400 * 1000L)
      val df = rows.map { case (ms, v) => (new Timestamp(ms), v) }.toDF("ts", "value")
      // delta_t = 1s data ⇒ at most one row per second can fall in-window
      val pts = TimeseriesOps.windowFilter(df, "ts", start, end)
        .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("s"))
        .distinct().count()
      assert(pts <= TimeseriesOps.expectedPointCount(start, end, 1L))
    }
  }

  test("property: sharded packing equals the sequential concat-then-chunk fold") {
    forAll(Gen.listOfN(40, Gen.choose(0, 300)), Gen.choose(16, 257)) {
      (lens, capacity) =>
        val docs = lens.zipWithIndex.map { case (n, i) =>
          (i.toLong, (0 until n).map(j => s"t$j").mkString(" "))
        }.toDF("doc_id", "text")
        val got = graft.text.TextOps
          .packSequences(docs, "doc_id", "text", capacity, nShards = 3)
          .collect()
          .map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
          .toMap
        // reference: per shard, walk docs in id order carrying the offset
        val byShard = lens.zipWithIndex.groupBy { case (_, i) => i % 3 }
        byShard.foreach { case (shard, ds) =>
          var cum = 0L
          ds.sortBy(_._2).foreach { case (n, i) =>
            val (start, end) = (cum, cum + n)
            val expStart = shard * (1L << 40) + start / capacity
            val (gn, gs, goff, ge) = got(i.toLong)
            assert(gn == n)
            assert(gs == expStart, s"doc $i start")
            assert(goff == start % capacity)
            if (n > 0)
              assert(ge == shard * (1L << 40) + (end - 1) / capacity, s"doc $i end")
            else assert(ge == gs, s"doc $i: empty doc must not span")
            cum = end
          }
        }
    }
  }

  test("chunk windows tile every document: stride-spaced starts, full cover, truncated tail") {
    val lens = Gen.listOfN(8, Gen.choose(0, 400))
    val params = for {
      stride <- Gen.choose(1, 64)
      extra <- Gen.choose(0, 64)
    } yield (stride + extra, stride) // window >= stride > 0
    forAll(lens, params) { case (ns, (window, stride)) =>
      val df = ns.zipWithIndex
        .map { case (n, i) => (i.toLong, (0 until n).map(j => s"w$j").mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.text.TextOps.chunkWindows(df, "doc_id", "text", window, stride)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .groupBy(_._1)
      ns.zipWithIndex.foreach { case (n, i) =>
        val chunks = got.getOrElse(i.toLong, Array.empty).sortBy(_._2)
        if (n == 0) assert(chunks.isEmpty, s"doc $i: empty doc yields no chunks")
        else {
          // starts are exactly 0, stride, 2·stride, …; all non-empty
          assert(chunks.map(_._3).toSeq == chunks.indices.map(_ * stride))
          assert(chunks.forall(_._4 > 0))
          // every chunk fits in the doc; all but the last are full windows
          chunks.dropRight(1).foreach(c => assert(c._4 == window, s"doc $i"))
          val last = chunks.last
          assert(last._3 + last._4 == n, s"doc $i: last chunk must end at n")
          // minimality: one fewer chunk would leave a tail uncovered
          if (chunks.length > 1)
            assert(chunks(chunks.length - 2)._3 + window < n, s"doc $i over-chunks")
        }
      }
    }
  }

  test("md5Key64 is a total, stable, non-negative 60-bit key; prefix changes the draw") {
    forAll(Gen.listOfN(30, Gen.choose(0L, 1000000L))) { idsRaw =>
      val ids = idsRaw.distinct
      val df = ids.toDF("id")
      def keys(prefix: String) = df
        .select(col("id"), graft.text.TextOps.md5Key64(col("id"), prefix).as("hv"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val a = keys("")
      assert(a.values.forall(v => v >= 0 && v < (1L << 60)))
      assert(keys("") == a) // stable across evaluations
      val b = keys("epoch2:")
      // a different salt re-draws (distinct ids hashing identically under
      // BOTH salts would need a 2⁻¹²⁰ coincidence)
      if (ids.size > 1) assert(ids.exists(i => a(i) != b(i)))
    }
  }
}
