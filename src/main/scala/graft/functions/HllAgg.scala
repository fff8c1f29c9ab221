package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog register array (Flajolet et al. 2007) as one imperative
  * aggregate — the cardinality sketch next to the engine's Count-Min
  * (frequency) and Bloom (membership) kernels.
  *
  * The child evaluates to ONE pre-hashed 60-bit key per item (the
  * engine's shared [[graft.text.TextOps.md5Key64]] recipe), so a SQL
  * oracle can rebuild the identical register state: register =
  * `key % 2^p`, and the rank is derived from the REMAINING `60-p` bits
  * `w = key >> p` as `rho = (60-p) + 1 - bitlen(w)` (`bitlen` = length
  * of the binary representation — DuckDB replays it as
  * `length(bin(w))`), with `rho = (60-p)+1` for `w = 0`. `update` takes
  * the per-register max, `merge` is element-wise max — idempotent and
  * commutative, so partial aggregation, tree-merge, and streaming
  * state-store replay all yield the BIT-IDENTICAL register array the
  * single-pass batch aggregate produces. `eval` emits the `2^p`-element
  * register array (values in `[0, 61-p]`).
  *
  * The estimate is then pure register arithmetic (see
  * [[HllRegisterAgg.hllStats]]): `Σ 2^-M_j` is kept as an EXACT
  * integer (`Σ 2^(S-M_j)` with scale `S = 61-p` never exceeds
  * `2^(61-p)·2^p = 2^61`), and the raw estimate
  * `α_m · m² / Σ 2^-M_j` is one correctly-rounded double divide —
  * both engines agree bit-for-bit, no fixture seam needed.
  *
  * Scale: the buffer is a fixed `2^p` bytes (512 B at p=9) regardless
  * of corpus size — at 100 TB this replaces `q_count_distinct`'s
  * full-key-set shuffle with map-side-combined constant-size partials;
  * the exchange carries one register array per partition, not one row
  * per distinct key, and per-day/per-partition sketch columns stay
  * mergeable after the fact (union = element-wise max).
  */
case class HllRegisterAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(p >= 4 && p <= 16, s"hll_registers: p must be in [4, 16], got $p")

  private val m = 1 << p
  /** Usable hash bits after the register index — md5Key64 yields 60. */
  private val keyBits = 60
  private val rankBits = keyBits - p

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (key < 0L || key >= (1L << keyBits))
        throw new IllegalArgumentException(
          s"hll_registers: key $key outside [0, 2^$keyBits) — caller must pre-hash with md5Key64")
      val reg = (key & (m - 1)).toInt
      val w = key >>> p
      val rho =
        if (w == 0L) rankBits + 1
        else rankBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllRegisterAgg =
    copy(child = newChildren.head)
}

object HllRegisterAgg {
  /** Aggregate Column: the `2^p`-element HLL register array for a
    * pre-hashed 60-bit `key` column ([[graft.text.TextOps.md5Key64]]).
    * Keep the md5 OUT of the aggregate child — pre-project it in a
    * codegen stage (the engine's interpreted-agg-child rule). */
  def hll_registers(key: Column, p: Int): Column =
    ColumnBridge.column(
      HllRegisterAgg(ColumnBridge.expression(key), p).toAggregateExpression())

  /** Register-array → `(v_zero, sum_scaled, est_raw)` columns, all
    * oracle-exact: `v_zero` = empty registers (the linear-counting
    * input), `sum_scaled` = `Σ_j 2^(S − M_j)` as an exact BIGINT with
    * scale `S = 61−p` (empty registers contribute `2^S`, i.e. `2^-0`
    * scaled), and `est_raw` = `α_m · m² / (sum_scaled / 2^S)` — the
    * uncorrected HLL estimate as ONE double divide of exactly-known
    * inputs, so DuckDB reproduces it bit-for-bit. */
  def hllStats(regs: Column, p: Int): (Column, Column, Column) = {
    val m = 1 << p
    val scale = 60 - p + 1
    val vZero = size(filter(regs, r => r === lit(0)))
    // 2^(S−M_j) via double pow: exact for exponents ≤ 52, and the long
    // cast is exact too (shiftleft's DSL form only takes literal shifts)
    val sumScaled = aggregate(regs, lit(0L),
      (acc, r) => acc + pow(lit(2.0), lit(scale) - r).cast("long"))
    // α_m for m ≥ 128 (Flajolet et al. 2007, fig. 3)
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val est = round(
      alpha * lit(m.toDouble) * lit(m.toDouble) *
        lit((1L << scale).toDouble) / sumScaled.cast("double"), 6)
    (vZero, sumScaled, est)
  }

  /** The bias-corrected estimator (small-range linear counting `m·ln(m/V)`
    * when the raw estimate is below `2.5m` and empty registers remain) —
    * the API a consumer would actually call; NOT oracle-compared because
    * `ln` carries no cross-engine bit guarantee. Accuracy pinned in
    * SketchSpec instead. */
  def hllEstimate(regs: Column, p: Int): Column = {
    val m = 1 << p
    val (vZero, _, estRaw) = hllStats(regs, p)
    when(estRaw <= lit(2.5 * m) && vZero > lit(0),
      round(lit(m.toDouble) * log(lit(m.toDouble) / vZero.cast("double")), 6))
      .otherwise(estRaw)
  }
}
