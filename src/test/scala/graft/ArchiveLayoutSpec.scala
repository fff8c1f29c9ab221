package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PartitionedArchive
import graft.ops.TimeseriesOps

/** Round-trips the canonical partitioned layout and pins the pruning
  * behavior that replaces the reference's filename-based file selection. */
class ArchiveLayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_archive").toString

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val written: Unit = {
    val bb = Seq(
      ("ORCASOUND_LAB", 1, ts("2024-01-01 00:00:00"), 100.0),
      ("ORCASOUND_LAB", 1, ts("2024-01-01 00:00:01"), 101.0),
      ("ORCASOUND_LAB", 60, ts("2024-01-01 00:01:00"), 102.0),
      ("PORT_TOWNSEND", 1, ts("2024-01-01 00:00:00"), 90.0)
    ).toDF("hydrophone", "delta_t", "ts", "value")
    PartitionedArchive.writeBroadband(bb, root)
    val psd = Seq(
      ("ORCASOUND_LAB", "octave_bands", 3, 1, ts("2024-01-01 00:00:00"), 63.0, 95.0),
      ("ORCASOUND_LAB", "octave_bands", 3, 1, ts("2024-01-01 00:00:00"), 125.0, 96.0)
    ).toDF("hydrophone", "freq_type", "delta_f", "delta_t", "ts", "band", "value")
    PartitionedArchive.writePsd(psd, root)
  }

  test("partition-column filters become PartitionFilters (pruning, not scanning)") {
    written
    val df = PartitionedArchive.readBroadband(spark, root)
      .filter(col("hydrophone") === "ORCASOUND_LAB" && col("delta_t") === 1)
    assert(df.count() == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("isnotnull(hydrophone"), plan.linesIterator.take(20).mkString("\n"))
  }

  test("window filter on archive data pushes into the scan") {
    written
    val df = TimeseriesOps.windowFilter(
      PartitionedArchive.readBroadband(spark, root),
      "ts", java.time.Instant.parse("2024-01-01T00:00:01Z"),
      java.time.Instant.parse("2024-01-02T00:00:00Z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"))
  }

  test("S1/S3/A7: filesystem listing feeds the catalog with partition metadata") {
    written
    val listing = PartitionedArchive.listing(spark, s"$root/broadband")
    val parquetOnly = listing.filter(col("path").endsWith(".parquet"))
    assert(parquetOnly.count() >= 3)
    // _SUCCESS markers carry no hydrophone= segment and are filtered by the
    // catalog's P7 predicate before parsing
    assert(parquetOnly.select("hydrophone").distinct().count() == 2)
  }

  test("S5: metadata-only matching-file count never opens data") {
    written
    val n = PartitionedArchive.matchingFileCount(spark, root, "broadband",
      Map("hydrophone" -> "ORCASOUND_LAB", "delta_t" -> 1))
    assert(n >= 1)
    val none = PartitionedArchive.matchingFileCount(spark, root, "broadband",
      Map("hydrophone" -> "NOPE", "delta_t" -> 1))
    assert(none == 0)
  }

  test("compaction rewrites a partition into fewer sorted files, same rows") {
    written
    val part = Seq("hydrophone" -> "ORCASOUND_LAB", "delta_t" -> 1)
    val dir = s"$root/broadband/hydrophone=ORCASOUND_LAB/delta_t=1"
    // fragment: write the partition as many single-row files first
    val before = spark.read.parquet(dir)
    before.repartition(4).write.mode("overwrite").parquet(dir + "_frag")
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.rename(new org.apache.hadoop.fs.Path(dir + "_frag"),
      new org.apache.hadoop.fs.Path(dir))
    val fragFiles = PartitionedArchive.matchingFileCount(spark, root, "broadband",
      Map("hydrophone" -> "ORCASOUND_LAB", "delta_t" -> 1))
    assert(fragFiles >= 2) // 2 rows → at most 2 non-empty fragment files
    val rowsBefore = spark.read.parquet(dir).collect().map(_.toSeq).toSet

    PartitionedArchive.compactPartition(spark, root, "broadband", part)
    val filesAfter = PartitionedArchive.matchingFileCount(spark, root, "broadband",
      Map("hydrophone" -> "ORCASOUND_LAB", "delta_t" -> 1))
    assert(filesAfter == 1)
    assert(spark.read.parquet(dir).collect().map(_.toSeq).toSet == rowsBefore)
  }

  test("retention drops matching partitions, leaves the rest") {
    written
    val dropped = PartitionedArchive.dropPartitions(spark, root, "broadband",
      pv => pv.get("hydrophone").contains("PORT_TOWNSEND"))
    assert(dropped.length == 1)
    val left = PartitionedArchive.readBroadband(spark, root)
      .select("hydrophone").distinct().collect().map(_.getString(0)).toSet
    assert(left == Set("ORCASOUND_LAB"))
  }

  test("scale evidence: 10× archive, same window → same rows scanned") {
    // Two archives, 1 day vs 10 days of minutely broadband, laid out one
    // time-ranged file per day (the compaction invariant). The SAME 1-hour
    // window query must scan a near-constant row count — row-group ts
    // stats prune the other days — so query cost tracks the requested
    // window, not the archive size (the reference's headline pathology,
    // upstream-notes.md:122-127, structurally cannot reproduce).
    def build(days: Int): String = {
      val r = Files.createTempDirectory(s"graft_scale_$days").toString
      val rows = (0 until days * 1440).map { i =>
        ("ORCASOUND_LAB", 60, new Timestamp(
          ts("2024-01-01 00:00:00").getTime + i * 60000L), 100.0 + i % 7)
      }
      // range-split by day first; the archive writer keeps the split (its
      // sortWithinPartitions preserves partitioning) → one time-ranged
      // file per day, stats-bearing TIMESTAMP_MICROS
      PartitionedArchive.writeBroadband(
        rows.toDF("hydrophone", "delta_t", "ts", "value")
          .repartitionByRange(days, col("ts")), r)
      r
    }
    def scanned(root: String): (Long, Long) = {
      val df = TimeseriesOps.windowFilter(
        PartitionedArchive.readBroadband(spark, root)
          .filter(col("hydrophone") === "ORCASOUND_LAB" && col("delta_t") === 60),
        "ts", java.time.Instant.parse("2024-01-01T06:00:00Z"),
        java.time.Instant.parse("2024-01-01T07:00:00Z"))
      assert(df.count() == 60)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.head
      (scan.metrics("numOutputRows").value, scan.metrics("numFiles").value)
    }
    val (rows1, files1) = scanned(build(1))
    val (rows10, files10) = scanned(build(10))
    assert(files10 >= files1 * 5, s"expected a genuinely larger archive ($files1 vs $files10 files)")
    // row-group pruning: the 10× archive feeds the scan ~one day-file's
    // rows, same as the 1× archive (range-partitioner boundaries are
    // sampled, so a file may spill slightly past a day edge — allow 2×,
    // which is still 5× below the no-pruning outcome of 14400)
    assert(rows10 <= rows1 * 2,
      s"scan read $rows10 rows on the 10× archive vs $rows1 on 1× — pruning lost")
    assert(rows1 <= 1500L, s"scan read $rows1 rows for a 60-point window")
  }

  test("service runs end-to-end over the partitioned archive") {
    written
    val svc = graft.serve.AmbientService.fromFrames(
      PartitionedArchive.readBroadband(spark, root),
      PartitionedArchive.readPsd(spark, root))
    val r = svc.getBroadbandTimeseries("ORCASOUND_LAB",
      java.time.Instant.parse("2024-01-01T00:00:00Z"),
      java.time.Instant.parse("2024-01-01T01:00:00Z"), 1)
    assert(r.pointCount == 2)
  }
}
