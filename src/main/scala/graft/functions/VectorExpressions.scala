package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * `aggregate`/`zip_with` higher-order functions evaluate their lambda per
  * element through the interpreter — measured ~100× slower than a fused
  * loop on the 64-dim corpus (Bench r1: q_cosine_pairs 140 s → see
  * BENCH notes). This expression generates a tight Java loop via
  * `doGenCode`, stays inside whole-stage codegen, and accumulates in
  * `double` regardless of input element type (FLOAT or DOUBLE arrays), so
  * results are bit-identical to the DuckDB oracle's DOUBLE[] math.
  *
  * Null elements contribute 0; a NULL array yields NULL (standard
  * `BinaryExpression` null semantics).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(aa.numElements(), ba.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!aa.isNullAt(i) && !ba.isNullAt(i)) {
        val x = if (lf) aa.getFloat(i).toDouble else aa.getDouble(i)
        val y = if (rf) ba.getFloat(i).toDouble else ba.getDouble(i)
        acc += x * y
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Banded random-hyperplane signatures for cosine-LSH candidate
  * generation: `nBands` buckets per vector, band `b` packing the sign bits
  * of `rowsPerBand` hyperplane projections (planes `b*r .. b*r+r-1`) into a
  * BIGINT. Vectors sharing any (band, bucket) are candidate near-pairs —
  * the OR-of-ANDs construction (Indyk–Motwani LSH; MMDS ch.3 applied to
  * random hyperplanes per Charikar '02).
  *
  * Plane components are a deterministic splitmix64 of (plane, dim) mapped
  * to [-1, 1) — stable across JVMs/runs with no stored model. The plane
  * matrix is cached per (nPlanes, dims), so per-row cost is one fused
  * multiply-add loop; the expression stays inside whole-stage codegen.
  */
case class HyperplaneBands(child: Expression, rowsPerBand: Int, nBands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(rowsPerBand >= 1 && rowsPerBand <= 63, "rowsPerBand packs into one BIGINT")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands needs ARRAY<FLOAT|DOUBLE> input, got ${dt.catalogString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], isFloat, rowsPerBand, nBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneBands$$.MODULE$$.compute($c, $isFloat, $rowsPerBand, $nBands)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {
  /** splitmix64 of (plane, dim) → uniform double in [-1, 1). */
  private def component(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L +
      0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    z.toDouble / Long.MaxValue.toDouble
  }

  private val matrices =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** Row-major (plane, dim) component matrix, cached per shape. */
  private def planeMatrix(nPlanes: Int, dims: Int): Array[Double] =
    matrices.computeIfAbsent((nPlanes, dims), { key =>
      val (p, d) = key
      val m = new Array[Double](p * d)
      var i = 0
      while (i < m.length) { m(i) = component(i / d, i % d); i += 1 }
      m
    })

  /** Static kernel referenced from generated code. */
  def compute(a: ArrayData, isFloat: Boolean, r: Int, nBands: Int): ArrayData = {
    val d = a.numElements()
    val mat = planeMatrix(r * nBands, d)
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      var bucket = 0L
      var j = 0
      while (j < r) {
        val row = (b * r + j) * d
        var acc = 0.0
        var i = 0
        while (i < d) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          acc += x * mat(row + i)
          i += 1
        }
        if (acc > 0) bucket |= 1L << j
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-level wrappers for the native vector expressions. */
object VectorFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm via the fused dot kernel. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** ARRAY<BIGINT> of `nBands` LSH band buckets (see [[HyperplaneBands]]). */
  def hyperplane_bands(vec: Column, rowsPerBand: Int, nBands: Int): Column =
    ColumnBridge.column(HyperplaneBands(
      ColumnBridge.expression(vec), rowsPerBand, nBands))
}
