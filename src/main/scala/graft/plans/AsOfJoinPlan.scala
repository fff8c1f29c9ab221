package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, Ascending}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS operator — logical node, planner
  * strategy, and physical merge — the one place this engine drops to a
  * custom `SparkPlan` because the built-in operators genuinely can't
  * express the execution shape (SURVEY §7.6 names as-of the canonical
  * candidate):
  *
  *  - the composition ([[graft.ops.JoinOps.asofJoin]]: tagged union +
  *    running ignore-nulls `last` window) materializes BOTH sides into
  *    one window buffer and pays the window machinery per row;
  *  - a true as-of is a single forward MERGE over two co-partitioned,
  *    co-sorted streams: each probe advances a cursor over its key's
  *    events and carries the latest payload — O(1) state, no window
  *    frames, no union row inflation.
  *
  * [[AsOfJoinExec]] declares `ClusteredDistribution` on the key for both
  * children and per-child `SortOrder`s, so EnsureRequirements plans the
  * SAME exchanges/sorts a SortMergeJoin would get — the operator slots
  * into Catalyst's planning like a native join instead of hand-managing
  * its shuffles. Semantics match the composition: latest event with
  * `event.ts <= probe.ts` per key, same-ts events visible, ties broken
  * by the highest `tieBreak`; probes with no preceding event emit NULL
  * payload. One deliberate divergence: NULL keys never match (SQL
  * equi-join semantics — the window composition would co-partition
  * nulls), pinned by AsOfJoinSpec.
  *
  * Type envelope (checked by [[graft.ops.JoinOps.asofJoinMerge]], which
  * falls back to the composition outside it): long-backed OR string key
  * (string keys merge on UTF8String comparison — only key EQUALITY
  * matters semantically, ordering just has to agree with the child
  * sort, and both use binary order), any atomic tie (never read by the
  * merge — the required child sort enforces it), identical long-backed
  * event-time type on BOTH sides. Payload columns are arbitrary.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, payload: Seq[Attribute])
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] → [[AsOfJoinExec]]; injected via
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions) or
  * appended to `spark.experimental.extraStrategies` by the JoinOps
  * entry point. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.rightKey, p.leftTime, p.rightTime,
        p.rightTie, p.payload, planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}

/** Physical single-pass merge. Requirements do the heavy lifting:
  * both children hash-cluster on the key (co-partitioned by
  * EnsureRequirements exactly as for a shuffled join) and sort by
  * (key, time[, tie]), so `doExecute` is a per-partition two-iterator
  * merge holding ONE buffered event payload — the held payload is
  * copied (sorter rows are reused buffers), everything else streams. */
case class AsOfJoinExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    rightTie: Attribute, payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending)))

  // probe rows pass through 1:1, so the left child's partitioning (and
  // ordering) survive — a downstream per-key aggregate reuses the
  // exchange, same as after a sort-merge join
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadAttrs = payload
    val rightOut = right.output
    val leftOut = left.output
    val outAttrs = output
    val stringKey =
      leftKey.dataType == org.apache.spark.sql.types.StringType
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOut)
      // bind the payload side NULLABLE: the no-match row is all nulls,
      // and binding with the events schema's non-null fields would read
      // them as zeros instead of checking isNullAt
      val resultProj = UnsafeProjection.create(outAttrs,
        leftOut ++ payloadAttrs.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(payloadAttrs.length)
      val joined = new JoinedRow
      if (stringKey) {
        // UTF8String-keyed merge — same cursor discipline as the long
        // path; held/cursor keys are COPIED because they point into
        // reused sorter buffers
        import org.apache.spark.unsafe.types.UTF8String
        var rValid = false
        var rKey: UTF8String = null; var rTs = 0L
        var rRow: InternalRow = null
        var heldKey: UTF8String = null
        var held: InternalRow = null
        def advanceR(): Unit = {
          rValid = false
          while (!rValid && rIt.hasNext) {
            val r = rIt.next()
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTimeIdx)) {
              rKey = r.getUTF8String(rKeyIdx).copy()
              rTs = r.getLong(rTimeIdx)
              rRow = r; rValid = true
            }
          }
        }
        advanceR()
        lIt.map { l =>
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTimeIdx)) {
            resultProj(joined(l, nullPayload))
          } else {
            val lKey = l.getUTF8String(lKeyIdx); val lTs = l.getLong(lTimeIdx)
            while (rValid && {
              val c = rKey.compareTo(lKey)
              c < 0 || (c == 0 && rTs <= lTs)
            }) {
              if (rKey.equals(lKey)) {
                heldKey = rKey // already a copy
                held = payloadProj(rRow).copy()
              }
              advanceR()
            }
            if (heldKey != null && heldKey.equals(lKey))
              resultProj(joined(l, held))
            else resultProj(joined(l, nullPayload))
          }
        }
      } else {
        // cursor state: the next unconsumed event (key, ts) + whether one
        // exists, and the latest matching payload for `heldKey`
        var rValid = false
        var rKey = 0L; var rTs = 0L
        var rRow: InternalRow = null // copied — sorter reuses buffers
        var heldKey = 0L
        var heldValid = false
        var held: InternalRow = null
        def advanceR(): Unit = {
          rValid = false
          while (!rValid && rIt.hasNext) {
            val r = rIt.next()
            // NULL key or NULL time: unmatchable under equi/as-of
            // semantics — skip (the probe side emits NULL payload)
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTimeIdx)) {
              rKey = r.getLong(rKeyIdx); rTs = r.getLong(rTimeIdx)
              rRow = r; rValid = true
            }
          }
        }
        advanceR()
        lIt.map { l =>
          if (l.isNullAt(lKeyIdx) || l.isNullAt(lTimeIdx)) {
            resultProj(joined(l, nullPayload))
          } else {
            val lKey = l.getLong(lKeyIdx); val lTs = l.getLong(lTimeIdx)
            // consume every event at-or-before this probe; the LAST one
            // consumed for this key is the as-of match (ties: the sort
            // put the highest tieBreak last)
            while (rValid && (rKey < lKey || (rKey == lKey && rTs <= lTs))) {
              if (rKey == lKey) {
                heldKey = lKey; heldValid = true
                held = payloadProj(rRow).copy()
              }
              advanceR()
            }
            if (heldValid && heldKey == lKey) resultProj(joined(l, held))
            else resultProj(joined(l, nullPayload))
          }
        }
      }
    }
  }
}
