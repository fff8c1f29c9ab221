package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV — the k-minimum-values distinct sketch (Bar-Yossef et al. 2002;
  * Beyer et al. SIGMOD'07 "On synopses for distinct-value estimation
  * under multiset operations") — the fourth member of the engine's
  * sketch family: CMS answers frequency, HLL answers cardinality, Bloom
  * answers membership; KMV answers cardinality AND set algebra — two
  * KMV sketches union by merge and, unlike HLL registers, support
  * INTERSECTION/Jaccard estimates, because the sketch IS a uniform
  * sample of the hashed key space.
  *
  * State: the k smallest DISTINCT pre-hashed keys per group (the child
  * evaluates to one [[graft.text.TextOps.md5Key64]] 60-bit key per
  * item — same caller-hashes discipline as HLL, so a SQL oracle
  * rebuilds the identical sketch as a rank-k window over distinct
  * hashes). Set semantics make the sketch ORDER-INVARIANT and exactly
  * mergeable: update inserts into a capped sorted set, merge is set
  * union re-capped at k — partial aggregation, tree-merge, and
  * streaming state-store replay all produce the bit-identical k-vector.
  *
  * Estimate: with m = stored values, `m < k` means the sketch saw the
  * whole set — the count is EXACT. Otherwise the k-th minimum of
  * uniform hashes on [0, 2^60) estimates density: `D ≈ (k−1)·2^60 /
  * kth_min` — one divide of exactly-known integers, bit-identical in
  * DuckDB. σ ≈ 1/√(k−2): ~4.5% at k=512.
  *
  * Scale: 8k bytes per group, map-side combined — the same
  * constant-state contract as the other sketches; per-partition/per-day
  * sketch columns stay mergeable (union = merge), and Jaccard between
  * any two groups' sketches needs no raw-data revisit. */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 2 && k <= (1 << 16), s"kmv: k must be in [2, 65536], got $k")

  private val keyBound = 1L << 60

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (key < 0L || key >= keyBound)
        throw new IllegalArgumentException(
          s"kmv: key $key outside [0, 2^60) — caller must pre-hash with md5Key64")
      if (buf.size < k) buf.add(key)
      else if (key < buf.last()) { buf.add(key); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) {
      val key = it.next()
      if (a.size < k) a.add(key)
      else if (key < a.last()) { a.add(key); if (a.size > k) a.pollLast() }
    }
    a
  }

  /** The ≤k minima in ascending order. */
  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.add(bb.getLong())
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
}

object KmvAgg {
  /** 60-bit key space of [[graft.text.TextOps.md5Key64]]. */
  val KeyBound: Long = 1L << 60

  /** Aggregate Column: the ≤k smallest distinct pre-hashed keys. */
  def kmv_sketch(key: Column, k: Int): Column =
    ColumnBridge.column(
      KmvAgg(ColumnBridge.expression(key), k).toAggregateExpression())

  /** Distinct-count estimate from a KMV array: exact `size` when the
    * sketch is under-full, else `(k−1)·2^60 / kth_min` — a single
    * divide of exactly-known integers, rounded to the engine-standard
    * 6 decimals for the oracle compare. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    val m = size(sketch)
    val kth = element_at(sketch, k) // 1-based; null if under-full
    when(m < lit(k), m.cast("double"))
      .otherwise(round(
        lit((k - 1).toDouble) * lit(KeyBound.toDouble) / kth.cast("double"), 6))
  }

  /** Jaccard estimate between two KMV sketches (Beyer et al. §5): the
    * k smallest of the UNION of the two arrays form a uniform sample of
    * A ∪ B; the fraction of that sample present in BOTH sketches
    * estimates |A∩B|/|A∪B|. Pure array algebra over two ≤k-vectors —
    * serving-edge work, SQL-replayable. */
  def kmvJaccard(a: Column, b: Column, k: Int): Column = {
    val unionK = slice(array_sort(array_union(a, b)), 1, k)
    val inBoth = size(filter(unionK,
      x => array_contains(a, x) && array_contains(b, x)))
    round(inBoth.cast("double") / size(unionK).cast("double"), 6)
  }
}
