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
      case agg: Aggregate if signatureOf(agg).contains(sig) =>
        substitute(agg, target).getOrElse(agg)
    }
  }

  /** Canonical signature of an Aggregate whose child is a Project chain
    * over ONE parquet relation: `sourcePath | groupings | name:=expr…`,
    * all expressions inlined to relation attributes and rendered
    * qualifier-free. None if the shape is anything else. */
  private[graft] def signatureOf(agg: Aggregate): Option[String] = {
    // walk the Project chain, collecting alias definitions bottom-up
    val projects = collection.mutable.ListBuffer[Seq[NamedExpression]]()
    var node: LogicalPlan = agg.child
    while (node.isInstanceOf[Project]) {
      val p = node.asInstanceOf[Project]
      projects.prepend(p.projectList)
      node = p.child
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
    projects.foreach { pl =>
      defs = defs ++ pl.map {
        case al: Alias => al.exprId -> inline(al.child)
        case ne => ne.exprId -> inline(ne.toAttribute)
      }.toMap
    }
    def render(e: Expression): String =
      e.transformUp {
        case a: AttributeReference => a.withQualifier(Seq.empty)
      }.sql
    val groups = agg.groupingExpressions.map(g => render(inline(g)))
    val aggs = agg.aggregateExpressions.map {
      case al: Alias => s"${al.name}:=${render(inline(al.child))}"
      case ne => s"${ne.name}:=${render(inline(ne))}"
    }
    Some(s"$path | ${groups.mkString(",")} | ${aggs.mkString(",")}")
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
      case a: Aggregate => signatureOf(a)
    }.flatten.getOrElse(throw new IllegalArgumentException(
      "definition is not a navigable single-relation aggregate"))
    definition.write.mode("overwrite").parquet(target)
    spark.conf.set(TargetKey, target)
    spark.conf.set(SignatureKey, sig)
    install(spark)
  }
}
