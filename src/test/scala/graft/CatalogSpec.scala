package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.ArchiveCatalog
import graft.planner.Errors

/** Mirrors `tests/test_get_options.py` + the malformed-key robustness notes
  * (`docs/upstream-notes.md:19-25`). */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val listing = ArchiveCatalog.listingFromPaths(spark, Seq(
    // broadband, delta_t=1, two monthly files
    ("ORCASOUND_LAB", "h/2020-01-01T00-00-00_2020-02-01T00-00-00_1s.parquet"),
    ("ORCASOUND_LAB", "h/2020-02-01T00-00-00_2020-03-01T00-00-00_1s.parquet"),
    // octave_bands (3oct) delta_t=1
    ("ORCASOUND_LAB", "h/2020-01-01T00-00-00_2020-02-01T00-00-00_1s_3oct.parquet"),
    // delta_hz (500hz) delta_t=10
    ("ORCASOUND_LAB", "h/2020-01-01T00-00-00_2020-02-01T00-00-00_10s_500hz.parquet"),
    // skipped: non-parquet, ancient, malformed
    ("ORCASOUND_LAB", "h/readme.txt"),
    ("ORCASOUND_LAB", "h/ancient2019_1s.parquet"),
    ("ORCASOUND_LAB", "h/garbage_name.parquet"),
    // second hydrophone
    ("SANDBOX", "s/2021-01-01T00-00-00_2021-02-01T00-00-00_1s.parquet")))

  private lazy val inv = ArchiveCatalog.inventory(ArchiveCatalog.parseListing(listing))
  private lazy val entries = ArchiveCatalog.collectEntries(inv)

  test("S3/P7 parse skips malformed, ancient and non-parquet keys") {
    assert(ArchiveCatalog.parseListing(listing).count() == 5)
  }

  test("A7 inventory groups by (hydrophone, freq_type, delta_f, delta_t)") {
    assert(entries.size == 4)
    val bb = entries.find(e =>
      e.hydrophone == "ORCASOUND_LAB" && e.freqType == "broadband").get
    assert(bb.fileCount == 2)
    assert(bb.firstStart == Instant.parse("2020-01-01T00:00:00Z"))
    assert(bb.lastEnd == Instant.parse("2020-03-01T00:00:00Z"))
    val oct = entries.find(_.freqType == "octave_bands").get
    assert(oct.deltaF.contains(3) && oct.deltaT == 1)
    val hz = entries.find(_.freqType == "delta_hz").get
    assert(hz.deltaF.contains(500) && hz.deltaT == 10)
  }

  test("J1 unknown combination → ValidationError (ref test :41-66)") {
    ArchiveCatalog.requireCombination(entries, "ORCASOUND_LAB", "octave_bands", Some(3), 1)
    assertThrows[Errors.ValidationError] {
      ArchiveCatalog.requireCombination(entries, "ORCASOUND_LAB", "octave_bands", Some(6), 1)
    }
  }

  test("J2 coverage is overlap, not containment (ref test :68-93, SURVEY §7.5.8)") {
    val e = entries.find(_.freqType == "broadband").get
    // straddling the start boundary overlaps → ok
    ArchiveCatalog.requireOverlap(e,
      Instant.parse("2019-12-31T00:00:00Z"), Instant.parse("2020-01-02T00:00:00Z"))
    // fully before coverage → rejected
    assertThrows[Errors.ValidationError] {
      ArchiveCatalog.requireOverlap(e,
        Instant.parse("2019-01-01T00:00:00Z"), Instant.parse("2019-06-01T00:00:00Z"))
    }
  }
}
