package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: derive scan-pushable raw-nanos predicates from filters
  * on a nanos-backed derived timestamp.
  *
  * `events.ts` is stored as TIMESTAMP(NANOS) and surfaced as
  * `timestamp_micros(ts_ns div 1000)` (Tables.events). By the time
  * predicate pushdown runs, a user filter `ts >= T` has been rewritten to
  * `timestamp_micros(ns div 1000) >= T` — an expression the parquet reader
  * cannot accept, so the scan reads everything. `TimeseriesOps.windowFilter`
  * adds the raw predicate by hand; this rule does it for EVERY comparison
  * of that shape, so ad-hoc user filters get row-group skipping too.
  *
  * Correctness domain: `div` is Spark's IntegralDivide, which truncates
  * toward ZERO — so `ts = micros(trunc(ns/1000))` floors for `ns ≥ 0` but
  * CEILS for `ns < 0` (pre-1970 data). The added conjunct must therefore be
  * a NECESSARY condition of the original predicate on BOTH domains (the
  * original predicate is always kept; the conjunct only enables row-group
  * skipping). Upper bounds already are: `trunc(ns/1000) < v` implies
  * `ns < v*1000` for every ns. Lower bounds are not (`trunc(-500/1000) =
  * 0 ≥ 0` but `-500 ≥ 0` fails), so each derived lower bound is RELAXED by
  * 999 ns — `trunc(ns/1000) ≥ v` implies `ns ≥ v*1000 − 999` exactly
  * (tight on the negative side, 999 ns slack on the positive side, which
  * at parquet row-group granularity prunes identically). This keeps the
  * conjunct a single comparison (an OR-guard would not push down).
  * Idempotent: skips predicates already present. Installed via
  * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object NanosPredicatePushdown extends Rule[LogicalPlan] {

  /** Matches `timestamp_micros(a div 1000)` → the raw nanos attribute. */
  private object TsFromNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) =>
        (d.left, d.right) match {
          case (a: Attribute, Literal(1000L, LongType)) => Some(a)
          case _ => None
        }
      case _ => None
    }
  }

  private def nanosBound(micros: Long): Option[Long] =
    try Some(Math.multiplyExact(micros, 1000L)) catch { case _: ArithmeticException => None }

  /** Lower bound valid on BOTH sign domains: `trunc(ns/1000) ≥ v` ⟹
    * `ns ≥ v*1000 − 999` (see class doc). */
  private def nanosLowerBound(micros: Long): Option[Long] =
    try Some(Math.subtractExact(Math.multiplyExact(micros, 1000L), 999L))
    catch { case _: ArithmeticException => None }

  private def derive(e: Expression): Option[Expression] = e match {
    case GreaterThanOrEqual(TsFromNanos(ns), Literal(v: Long, TimestampType)) =>
      nanosLowerBound(v).map(b => GreaterThanOrEqual(ns, Literal(b, LongType)))
    case GreaterThan(TsFromNanos(ns), Literal(v: Long, TimestampType)) =>
      // trunc(ns/1000) > v ⇔ trunc(ns/1000) >= v+1 ⟹ ns >= (v+1)*1000 - 999
      nanosLowerBound(v + 1).map(b => GreaterThanOrEqual(ns, Literal(b, LongType)))
    case LessThan(TsFromNanos(ns), Literal(v: Long, TimestampType)) =>
      // trunc(ns/1000) < v ⟹ ns < v*1000 on both domains
      nanosBound(v).map(b => LessThan(ns, Literal(b, LongType)))
    case LessThanOrEqual(TsFromNanos(ns), Literal(v: Long, TimestampType)) =>
      // trunc(ns/1000) <= v ⟹ ns < (v+1)*1000 on both domains
      nanosBound(v + 1).map(b => LessThan(ns, Literal(b, LongType)))
    // literal-first mirrored forms
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), t @ TsFromNanos(_)) =>
      derive(LessThanOrEqual(t, l))
    case GreaterThan(l @ Literal(_, TimestampType), t @ TsFromNanos(_)) =>
      derive(LessThan(t, l))
    case LessThan(l @ Literal(_, TimestampType), t @ TsFromNanos(_)) =>
      derive(GreaterThan(t, l))
    case LessThanOrEqual(l @ Literal(_, TimestampType), t @ TsFromNanos(_)) =>
      derive(GreaterThanOrEqual(t, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = splitConjuncts(cond)
      val extras = existing.flatMap(derive)
        .filterNot(e => existing.exists(_.semanticEquals(e)))
        .distinct
      if (extras.isEmpty) f
      else Filter((existing ++ extras).reduce(And), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
