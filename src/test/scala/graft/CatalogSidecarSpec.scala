package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.CatalogSidecar
import graft.serve.AmbientService
import graft.sources.{PartitionedArchive, SkipIndex}

/** Pins the r16 catalog-bootstrap sidecar: the persisted footer-index
  * aggregation must equal `AmbientService.derivedCatalog` (the full-scan
  * recompute `fromFrames` used to pay at every process start) exactly —
  * on first build, after batch appends, and after partition deletes (the
  * sidecar self-heals via the listing diff, no writer hooks) — and an
  * up-to-date bootstrap must not rewrite the persisted index. */
class CatalogSidecarSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // single-file-per-partition inputs: the integrity-probe case below
  // reasons about one file's zone, so the layout must be deterministic
  private def bbDf(rows: Seq[(String, Int, Timestamp, Double)]): DataFrame =
    rows.toDF("hydrophone", "delta_t", "ts", "value").repartition(1)

  private def psdDf(rows: Seq[(String, String, Int, Int, Timestamp, Double, Double)]): DataFrame =
    rows.toDF("hydrophone", "freq_type", "delta_f", "delta_t", "ts", "band", "value")
      .repartition(1)

  private def freshArchive(): String = {
    val root = Files.createTempDirectory("graft_sidecar").toString
    PartitionedArchive.writeBroadband(bbDf(Seq(
      ("ORCASOUND_LAB", 1, ts("2024-01-01 00:00:00"), 100.0),
      ("ORCASOUND_LAB", 1, ts("2024-01-01 00:00:05"), 101.0),
      ("ORCASOUND_LAB", 60, ts("2024-01-02 00:01:00"), 102.0),
      ("PORT_TOWNSEND", 1, ts("2024-01-03 00:00:00"), 90.0))), root)
    PartitionedArchive.writePsd(psdDf(Seq(
      ("ORCASOUND_LAB", "octave_bands", 3, 1, ts("2024-01-01 00:00:00"), 63.0, 95.0),
      ("ORCASOUND_LAB", "octave_bands", 3, 1, ts("2024-01-01 00:00:03"), 125.0, 96.0),
      ("PORT_TOWNSEND", "delta_hz", 500, 60, ts("2024-02-01 00:00:00"), 50.0, 91.0))), root)
    root
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().toIndexedSeq
      .map(r => r.toSeq.map(v => String.valueOf(v)).mkString("|")).sorted

  private def recompute(root: String): Seq[String] =
    canon(AmbientService.derivedCatalog(
      PartitionedArchive.readBroadband(spark, root),
      PartitionedArchive.readPsd(spark, root)))

  private def sidecar(root: String): Seq[String] =
    canon(CatalogSidecar.inventory(spark, root))

  test("sidecar catalog == full-scan recompute on first build") {
    val root = freshArchive()
    val s = sidecar(root)
    assert(s.nonEmpty && s == recompute(root))
  }

  test("sidecar self-heals after batch appends and partition deletes") {
    val root = freshArchive()
    sidecar(root) // build + persist
    // append: a new hydrophone and a min-extension of an existing key
    PartitionedArchive.appendBroadbandBatch(bbDf(Seq(
      ("SUNSET_BAY", 1, ts("2024-03-01 00:00:00"), 80.0),
      ("ORCASOUND_LAB", 1, ts("2023-12-31 00:00:00"), 99.0))), root, 0L, "t")
    assert(sidecar(root) == recompute(root))
    // delete: drop whole partitions out from under the persisted index
    PartitionedArchive.dropPartitions(spark, root, "broadband",
      vals => vals.get("hydrophone").contains("PORT_TOWNSEND"))
    assert(sidecar(root) == recompute(root))
  }

  test("up-to-date bootstrap rewrites nothing") {
    val root = freshArchive()
    sidecar(root) // persist
    val idxDir = new java.io.File(SkipIndex.indexPath(s"$root/broadband"))
    val snapshot = idxDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    Thread.sleep(1100) // fs mtime granularity
    assert(sidecar(root) == recompute(root))
    val after = idxDir.listFiles().map(f => f.getName -> f.lastModified()).toMap
    assert(after == snapshot,
      "an unchanged archive must not rewrite the persisted index")
  }

  test("fromArchive service answers endpoints from the sidecar catalog") {
    val root = freshArchive()
    val s = AmbientService.fromArchive(spark, root)
    assert(s.getOptions(None).hydrophones.map(_.hydrophone).sorted ==
      Seq("ORCASOUND_LAB", "PORT_TOWNSEND"))
    val bb = s.getBroadbandTimeseries("orcasound_lab",
      java.time.Instant.parse("2024-01-01T00:00:00Z"),
      java.time.Instant.parse("2024-01-01T01:00:00Z"), 1)
    assert(bb.pointCount == 2)
  }

  test("S5 integrity probe: empty window inside a matching file's zone 502s") {
    val root = freshArchive()
    val s = AmbientService.fromArchive(spark, root)
    // [00:00:01, 00:00:05): inside the single ORCASOUND_LAB delta_t=1
    // file's zone [00:00:00, 00:00:05] but between its two data points —
    // zero rows read, a file matched -> DataIntegrityError (the
    // reference's probe, get_timeseries.py:223-229)
    intercept[graft.planner.Errors.DataIntegrityError] {
      s.getBroadbandTimeseries("orcasound_lab",
        java.time.Instant.parse("2024-01-01T00:00:01Z"),
        java.time.Instant.parse("2024-01-01T00:00:05Z"), 1)
    }
  }
}
