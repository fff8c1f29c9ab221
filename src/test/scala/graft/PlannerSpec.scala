package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.planner.{Errors, RequestPlanner => P}

/** Mirrors the reference's own planning tests
  * (`tests/test_get_aggregations.py`, `tests/test_get_timeseries.py`). */
class PlannerSpec extends AnyFunSuite {
  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def plus(h: Long) = t0.plusSeconds(h * 3600)

  test("F9 auto over 24h resolves to 5m → 288 buckets (ref test :53-57)") {
    val iv = P.resolveInterval("auto", t0, plus(24))
    assert(iv == "5m")
    assert(P.estimatedPoints(t0, plus(24), iv) == 288L)
  }

  test("F9 auto picks finest interval meeting the ≤1000 target") {
    assert(P.resolveInterval("auto", t0, t0.plusSeconds(3600)) == "10s")  // 360
    assert(P.resolveInterval("auto", t0, t0.plusSeconds(4 * 3600)) == "1m") // 240
    assert(P.resolveInterval("auto", t0, plus(24 * 90)) == "1d")          // 90 days
  }

  test("O4 explicit 10s over 24h exceeds the 2000 cap (ref test :79-87)") {
    val pts = P.estimatedPoints(t0, plus(24), "10s")
    assert(pts == 8640L)
    assertThrows[Errors.ValidationError] { P.enforcePointCap(pts) }
  }

  test("O4 cap passes at exactly 2000") {
    P.enforcePointCap(2000L) // no throw
    assertThrows[Errors.ValidationError] { P.enforcePointCap(2001L) }
  }

  test("raw window 31-day cap (ref get_timeseries.py:19)") {
    P.enforceRawWindow(t0, plus(24 * 31)) // exactly 31d ok
    assertThrows[Errors.ValidationError] { P.enforceRawWindow(t0, plus(24 * 32)) }
  }

  test("F1 hydrophone name normalization (ref get_options.py:22-26)") {
    assert(P.normalizeName("  Orcasound Lab ") == "ORCASOUND_LAB")
    assert(P.normalizeName("port-townsend") == "PORT_TOWNSEND")
    assertThrows[Errors.ValidationError] { P.normalizeName("   ") }
  }

  test("F2 delta_f selector parse (ref get_timeseries.py:84-98)") {
    assert(P.parseDeltaF("3oct") == (("octave_bands", 3)))
    assert(P.parseDeltaF("500hz") == (("delta_hz", 500)))
    assertThrows[Errors.ValidationError] { P.parseDeltaF("3octave") }
    assertThrows[Errors.ValidationError] { P.parseDeltaF("oct3") }
  }

  test("empty / inverted window rejected") {
    assertThrows[Errors.ValidationError] { P.resolveInterval("auto", plus(1), t0) }
    assertThrows[Errors.ValidationError] { P.resolveInterval("1h", t0, t0) }
  }

  test("unknown interval label rejected") {
    assertThrows[Errors.ValidationError] { P.resolveInterval("2h", t0, plus(24)) }
  }

  test("F6 monthly chunks cover the window with month-aligned boundaries") {
    import graft.ops.TimeChunks
    val s = Instant.parse("2024-01-15T06:00:00Z")
    val e = Instant.parse("2024-03-10T00:00:00Z")
    val chunks = TimeChunks.monthlyChunks(s, e)
    assert(chunks == Seq(
      (s, Instant.parse("2024-02-01T00:00:00Z")),
      (Instant.parse("2024-02-01T00:00:00Z"), Instant.parse("2024-03-01T00:00:00Z")),
      (Instant.parse("2024-03-01T00:00:00Z"), e)))
    // seamless + ordered
    chunks.sliding(2).foreach { case Seq(a, b) => assert(a._2 == b._1); case _ => }
  }

  test("F7 fixed chunks: day steps, ragged tail") {
    import graft.ops.TimeChunks
    val s = Instant.parse("2024-01-01T00:00:00Z")
    val e = Instant.parse("2024-01-03T12:00:00Z")
    val chunks = TimeChunks.fixedChunks(s, e, 86400)
    assert(chunks.length == 3)
    assert(chunks.last == ((Instant.parse("2024-01-03T00:00:00Z"), e)))
  }
}
