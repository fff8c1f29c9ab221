package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Optimizer rule: AGGREGATE NAVIGATION — rewrite a query that *is* a
  * registered materialized rollup's definition to read the materialized
  * table instead of re-aggregating the fact scan. This is the serving
  * pattern the reference hardcodes (precomputed PSD/daily tables read
  * back per request, `app/services/get_*.py`) done the engine way: the
  * user writes the aggregate over raw events, Catalyst substitutes the
  * rollup — at 100 TB the difference between a 3-year fact scan and a
  * 1000-row read, with the IVM family (`RollupOps`) keeping the target
  * exact as batches land.
  *
  * Matching is SIGNATURE-exact, the conservative end of
  * materialized-view matching (Goldstein & Larson, SIGMOD'01, §3: an
  * MV can answer a query when the query's expression tree maps onto
  * the view's — equality is the degenerate safe case): the Aggregate's
  * grouping + aggregate expressions are inlined through any Project
  * chain down to a single parquet relation, rendered qualifier-free,
  * and compared with the signature captured at registration from the
  * DEFINITION's analyzed plan. Anything unexpected en route — a
  * filter, a join, a second relation, a name/type mismatch against the
  * target's schema — vetoes the rewrite; the query then runs as
  * written, so a non-match is never a correctness event.
  *
  * Two caveats, by design:
  *  - distinct aggregates are not navigable: `RewriteDistinctAggregates`
  *    (a default batch that runs BEFORE user-provided rules) expands
  *    them into multi-Aggregate plans the signature no longer matches —
  *    register MVs without DISTINCT;
  *  - freshness is the registrar's contract, exactly as with real MV
  *    systems: register after (each) maintenance, or navigate to a
  *    stale answer.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * (see [[install]]) or through `GraftExtensions`.
  */
object RollupNavigation extends Rule[LogicalPlan] {

  val TargetKey = "spark.graft.rollup.navigate.target"
  val SignatureKey = "spark.graft.rollup.navigate.signature"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val target = conf.getConfString(TargetKey, "")
    val sig = conf.getConfString(SignatureKey, "")
    if (target.isEmpty || sig.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        (for {
          parsed <- parse(agg) if covers(sig, parsed.sig)
          conds <- remapFilters(parsed, agg)
          sub <- substitute(agg, target)
        } yield if (conds.isEmpty) sub
                else org.apache.spark.sql.catalyst.plans.logical
                  .Filter(conds.reduce(And), sub))
          .getOrElse(agg)
    }
  }

  /** The registered MV answers the query when the source path and the
    * grouping list are IDENTICAL and the query's aggregate columns are
    * a SUBSET of the view's (each compared as `name:=expression`) — a
    * query computing fewer of the MV's measures navigates to a
    * projection of it, the common serving case. More columns, different
    * expressions under the same name, or different grouping granularity
    * never match. */
  private[graft] def covers(registered: String, query: String): Boolean = {
    (registered.split(" \\| ", -1), query.split(" \\| ", -1)) match {
      case (Array(rPath, rGroups, rAggs), Array(qPath, qGroups, qAggs)) =>
        // agg entries split only at a comma DIRECTLY followed by the
        // next `name:=` (expressions contain commas; alias names are
        // word-only and `:=` never appears in rendered SQL)
        rPath == qPath && rGroups == qGroups &&
          qAggs.split(",(?=\\w+:=)", -1).toSet
            .subsetOf(rAggs.split(",(?=\\w+:=)", -1).toSet)
      case _ => registered == query
    }
  }

  /** Parse result: the aggregate-structure signature (filters excluded —
    * they rewrite separately) plus any filter conditions found in the
    * chain, inlined to relation attributes, grouped by grouping
    * expression (also inlined). */
  private[graft] case class Parsed(sig: String,
      inlinedFilters: Seq[Expression], inlinedGroupings: Seq[Expression])

  /** Canonicalize an Aggregate whose child is a Project/Filter chain
    * over ONE parquet relation: `sourcePath | groupings | name:=expr…`,
    * all expressions inlined to relation attributes and rendered
    * qualifier-free. None if the shape is anything else.
    *
    * Filters are legal in the chain (predicate pushdown moves a user's
    * post-aggregate `day >= X` below the Aggregate before user rules
    * run) and are returned for [[remapFilters]] to judge — they do NOT
    * contribute to the signature, because the registered definition has
    * none. */
  private[graft] def parse(agg: Aggregate): Option[Parsed] = {
    // walk the chain top-down, then process bottom-up so each level's
    // aliases/conditions inline through everything beneath them
    val chain = collection.mutable.ListBuffer[Either[Seq[NamedExpression], Expression]]()
    var node: LogicalPlan = agg.child
    var done = false
    while (!done) node match {
      case p: Project =>
        chain.prepend(scala.Left(p.projectList)); node = p.child
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        chain.prepend(scala.Right(f.condition)); node = f.child
      case _ => done = true
    }
    val path = node match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.toString).getOrElse(return None)
          case _ => return None
        }
      case _ => return None
    }
    // substitution map: exprId → definition over relation attributes
    var defs = Map.empty[ExprId, Expression]
    def inline(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
    }
    val filters = collection.mutable.ListBuffer[Expression]()
    chain.foreach {
      case scala.Left(pl) =>
        defs = defs ++ pl.map {
          case al: Alias => al.exprId -> inline(al.child)
          case ne => ne.exprId -> inline(ne.toAttribute)
        }.toMap
      case scala.Right(cond) =>
        filters ++= splitConjuncts(cond).map(inline)
    }
    def render(e: Expression): String =
      e.transformUp {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql
    val inlinedGroups = agg.groupingExpressions.map(inline)
    val groups = inlinedGroups.map(render)
    val aggs = agg.aggregateExpressions.map {
      case al: Alias => s"${al.name}:=${render(inline(al.child))}"
      case ne => s"${ne.name}:=${render(inline(ne))}"
    }
    Some(Parsed(s"$path | ${groups.mkString(",")} | ${aggs.mkString(",")}",
      filters.toSeq, inlinedGroups))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A filter below the aggregate is navigable iff it FACTORS THROUGH
    * the grouping expressions — then it removes whole groups, which
    * commutes with aggregation (each group's value depends only on its
    * own rows). Structurally: replace every occurrence of a grouping
    * expression in the conjunct with the aggregate's output attribute
    * for it; if any raw relation attribute survives, the predicate cuts
    * WITHIN groups (e.g. `hour(ts) = 3` under day grouping) and the
    * whole rewrite is vetoed. Returns the remapped conjuncts to apply
    * ABOVE the MV scan — where the parquet reader then gets them pushed
    * for free. */
  private def remapFilters(parsed: Parsed, agg: Aggregate)
      : Option[Seq[Expression]] = {
    if (parsed.inlinedFilters.isEmpty) return Some(Nil)
    // grouping expr → the aggregate output attribute carrying it
    val groupOut: Seq[(Expression, Attribute)] =
      parsed.inlinedGroupings.flatMap { g =>
        agg.aggregateExpressions.collectFirst {
          case al: Alias if al.child.semanticEquals(
              agg.groupingExpressions(parsed.inlinedGroupings.indexOf(g))) =>
            al.toAttribute
          case ar: AttributeReference if agg.groupingExpressions(
              parsed.inlinedGroupings.indexOf(g)).semanticEquals(ar) =>
            ar
        }.map(g -> _)
      }
    if (groupOut.size != parsed.inlinedGroupings.size) return None
    val allowed = AttributeSet(agg.output)
    // DATE-CAST groupings get an extra re-derivation: the optimizer
    // rewrites `cast(ts as date) >= d` into TIMESTAMP space
    // (`ts >= midnight(d)` + `isnotnull(ts)`) before user rules run, so
    // the grouping expression no longer appears structurally. The
    // inverse holds exactly when the bound sits ON midnight in the
    // session zone: `ts >= midnight(d) ⇔ date(ts) >= d` and
    // `ts < midnight(d) ⇔ date(ts) < d`; `isnotnull(ts) ⇔
    // isnotnull(date(ts))` (casts preserve nullness). Anything else —
    // strict >, <=, =, off-midnight bounds — cuts within a day group
    // and vetoes.
    val dateCasts: Map[ExprId, Attribute] = groupOut.collect {
      case (c: Cast, out) if c.dataType ==
          org.apache.spark.sql.types.DateType &&
          c.child.isInstanceOf[AttributeReference] =>
        c.child.asInstanceOf[AttributeReference].exprId -> out
    }.toMap
    val zone = java.time.ZoneId.of(conf.sessionLocalTimeZone)
    def midnightDate(micros: Long): Option[Literal] = {
      val zdt = java.time.Instant.EPOCH
        .plus(micros, java.time.temporal.ChronoUnit.MICROS).atZone(zone)
      if (zdt.toLocalTime == java.time.LocalTime.MIDNIGHT)
        Some(Literal(zdt.toLocalDate.toEpochDay.toInt,
          org.apache.spark.sql.types.DateType))
      else None
    }
    def dateBound(a: Expression, v: Any): Option[(Attribute, Literal)] =
      a match {
        case ar: AttributeReference if dateCasts.contains(ar.exprId) =>
          v match {
            case micros: Long => midnightDate(micros).map(dateCasts(ar.exprId) -> _)
            case _ => None
          }
        case _ => None
      }
    def remapConjunct(c: Expression): Option[Expression] = {
      val structural = c.transformUp {
        case e if groupOut.exists(_._1.semanticEquals(e)) =>
          groupOut.find(_._1.semanticEquals(e)).get._2
      }
      if (structural.references.subsetOf(allowed)) Some(structural)
      else c match {
        case IsNotNull(a: AttributeReference) if dateCasts.contains(a.exprId) =>
          Some(IsNotNull(dateCasts(a.exprId)))
        case GreaterThanOrEqual(a, Literal(v, _: org.apache.spark.sql.types.TimestampType)) =>
          dateBound(a, v).map { case (out, d) => GreaterThanOrEqual(out, d) }
        case LessThan(a, Literal(v, _: org.apache.spark.sql.types.TimestampType)) =>
          dateBound(a, v).map { case (out, d) => LessThan(out, d) }
        case _ => None
      }
    }
    val remapped = parsed.inlinedFilters.map(remapConjunct)
    if (remapped.forall(_.isDefined)) Some(remapped.map(_.get)) else None
  }

  /** Replace the Aggregate with a read of the target, aliased onto the
    * Aggregate's own output attribute ids so parents resolve untouched.
    * None (→ keep the aggregate) on any name/type mismatch. */
  private def substitute(agg: Aggregate, target: String): Option[LogicalPlan] = {
    val mv = SparkSession.active.read.parquet(target).queryExecution.analyzed
    val byName = mv.output.map(a => a.name -> a).toMap
    val projected = agg.output.map { o =>
      val c = byName.getOrElse(o.name, return None)
      if (c.dataType != o.dataType) return None
      Alias(c, o.name)(exprId = o.exprId)
    }
    Some(Project(projected, mv))
  }

  /** Idempotently add this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val cur = classic.experimental.extraOptimizations
    if (!cur.contains(this))
      classic.experimental.extraOptimizations = cur :+ this
  }

  /** Materialize `definition` (an un-executed aggregate DataFrame) at
    * `target` and register it for navigation on this session.
    *
    * The signature comes from the definition's OPTIMIZED plan, captured
    * with navigation unregistered: expression-level rewrites
    * (`to_date(ts)` → `cast(ts as date)`, constant folding, alias
    * collapse) run in the default batches BEFORE user-provided rules,
    * so the analyzed-time form of an expression never reaches this rule
    * — the optimized form is the one future queries present. */
  def materialize(spark: SparkSession, definition: DataFrame,
      target: String): Unit = {
    // unregister BEFORE anything touches the plan: the signature
    // capture and the write itself must re-aggregate, not navigate to
    // the (absent or stale) previous target
    spark.conf.unset(SignatureKey)
    val sig = definition.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => parse(a).map(_.sig)
    }.flatten.getOrElse(throw new IllegalArgumentException(
      "definition is not a navigable single-relation aggregate"))
    definition.write.mode("overwrite").parquet(target)
    spark.conf.set(TargetKey, target)
    spark.conf.set(SignatureKey, sig)
    install(spark)
  }

  /** Register WITHOUT writing — the maintenance path: after the IVM
    * family ([[graft.ops.RollupOps]]) advances the target in place,
    * re-point navigation at the fresh version. The definition is only
    * consulted for its signature. */
  def register(spark: SparkSession, definition: DataFrame,
      target: String): Unit = {
    spark.conf.unset(SignatureKey)
    val sig = definition.queryExecution.optimizedPlan.collectFirst {
      case a: Aggregate => parse(a).map(_.sig)
    }.flatten.getOrElse(throw new IllegalArgumentException(
      "definition is not a navigable single-relation aggregate"))
    spark.conf.set(TargetKey, target)
    spark.conf.set(SignatureKey, sig)
    install(spark)
  }
}
