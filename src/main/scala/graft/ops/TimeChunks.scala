package graft.ops

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** F6/F7 — chunk-boundary stepping (reference `_next_month_start` /
  * `_iter_monthly_chunks` / `_iter_fixed_chunks`,
  * `app/services/get_aggregations.py:202-237`).
  *
  * The engine deliberately does NOT chunk execution (one partitioned scan
  * replaces the loop — SURVEY §4.2.1); these helpers exist for the cases
  * where chunk *windows* are still the right abstraction: incremental
  * backfill scheduling, per-month compaction jobs, and the last-wins merge
  * (MergeOps) over recomputed partitions. */
object TimeChunks {

  /** F6 — first instant of the month after `t` (UTC). */
  def nextMonthStart(t: Instant): Instant = {
    val z = ZonedDateTime.ofInstant(t, ZoneOffset.UTC)
    z.toLocalDate.withDayOfMonth(1).plusMonths(1).atStartOfDay(ZoneOffset.UTC).toInstant
  }

  /** F6 — calendar-month chunks covering `[start, end)`; the first chunk
    * starts at `start`, later chunks at month boundaries. */
  def monthlyChunks(start: Instant, end: Instant): Seq[(Instant, Instant)] = {
    val out = Seq.newBuilder[(Instant, Instant)]
    var cur = start
    while (cur.isBefore(end)) {
      val next = nextMonthStart(cur)
      val chunkEnd = if (next.isBefore(end)) next else end
      out += ((cur, chunkEnd))
      cur = chunkEnd
    }
    out.result()
  }

  /** F7 — fixed-size chunks covering `[start, end)`. */
  def fixedChunks(start: Instant, end: Instant, stepSeconds: Long): Seq[(Instant, Instant)] = {
    require(stepSeconds > 0, "chunk step must be positive")
    val out = Seq.newBuilder[(Instant, Instant)]
    var cur = start
    while (cur.isBefore(end)) {
      val next = cur.plusSeconds(stepSeconds)
      out += ((cur, if (next.isBefore(end)) next else end))
      cur = next
    }
    out.result()
  }
}
