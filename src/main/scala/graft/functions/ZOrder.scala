package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) interleave of two integer dimensions.
  *
  * Sorting an ingest by `z_order(dimA, dimB)` clusters rows so that
  * consecutive parquet row groups cover small rectangles in (A, B) space —
  * min/max stats then prune scans filtered on EITHER dimension, where a
  * single-column sort only helps its own column. The classic remedy for
  * "time-sorted archive, but half the queries filter on device/user".
  *
  * Accepts INT inputs only (a BIGINT would silently truncate to 32 bits
  * and wrap — scale/rank wide dimensions down to ints first); sign bits are
  * flipped so signed order per dimension is preserved, and the final key is
  * flipped back so it sorts correctly as a signed BIGINT.
  *
  * IMPORTANT: interleaving is positional, so dimensions must first be
  * scaled to comparable bit widths (e.g. rank or min-max scale each to
  * 0..65535) — otherwise the wider dimension's high bits dominate the sort
  * and the key degenerates to a single-column order. See ZOrderSpec.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt == IntegerType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_order needs INT inputs (scale wider types down first — silent " +
          s"32-bit truncation would destroy locality), got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder2.interleave(a.asInstanceOf[Int].toLong, b.asInstanceOf[Int].toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder2$$.MODULE$$.interleave((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {

  /** Spread the low 32 bits of x so bit i lands at position 2i. */
  def spread(x: Long): Long = {
    var v = x & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8))  & 0x00FF00FF00FF00FFL
    v = (v | (v << 4))  & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** Morton interleave of the low 32 bits of a and b (a in even bits).
    * Each dimension's sign bit is flipped so signed numeric order maps to
    * unsigned bit order; the final key's top bit is flipped BACK so the
    * interleaved value also sorts correctly as a signed BIGINT (b's flipped
    * sign bit lands in bit 63). */
  def interleave(a: Long, b: Long): Long = {
    val ua = (a & 0xFFFFFFFFL) ^ 0x80000000L
    val ub = (b & 0xFFFFFFFFL) ^ 0x80000000L
    (spread(ua) | (spread(ub) << 1)) ^ 0x8000000000000000L
  }

  def z_order(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
