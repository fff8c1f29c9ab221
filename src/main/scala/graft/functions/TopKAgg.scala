package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact top-k per group as a PARTIAL aggregate — the scale replacement for
  * the `row_number().over(partitionBy(g).orderBy(m desc))  WHERE rank <= k`
  * pattern. The window formulation shuffles and SORTS every input row; this
  * aggregate keeps a bounded k-entry heap per group, so map-side combine
  * reduces each partition to at most k entries per group BEFORE the
  * exchange, and nothing is ever fully sorted. The asymptotic win is
  * `input_rows → k·groups` rows shuffled: decisive when groups are hot
  * (many rows per group) at 100 TB; irrelevant when input ≈ k·groups.
  *
  * Semantics: keeps the k largest `ord` values (ties broken toward the
  * SMALLER `id` — a total order, so the result is deterministic under any
  * partitioning or merge order). Emits `ARRAY<STRUCT<ord:BIGINT,
  * id:BIGINT>>` sorted by (ord DESC, id ASC) — `posexplode` downstream
  * recovers dense ranks. Payload stays narrow by design: carry the metric
  * and the row's key through the aggregate, join wide payload columns
  * AFTER, on the k·groups-sized result (shuffling wide rows through an agg
  * buffer is the anti-pattern this operator exists to avoid).
  *
  * Buffer is a binary min-heap on the KEPT set ordered worst-first, so a
  * full buffer replaces its root in O(log k); serialization is 16 bytes per
  * entry. `merge` folds the smaller heap into the larger.
  */
case class TopKByAgg(
    ord: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(ord, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    if (o != null && i != null) {
      buf.insert(o.asInstanceOf[Long], i.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach(into.insert)
    into
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sortedDesc.map { case (o, i) =>
      InternalRow(o, i): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 2 * buf.size)
    buf.foreach { (o, i) => bb.putLong(o); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k)
    var n = bytes.length / 16
    while (n > 0) { buf.insert(bb.getLong(), bb.getLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByAgg =
    copy(ord = newChildren(0), id = newChildren(1))
}

/** Like [[TopKByAgg]] but each entry carries one extra BIGINT `pay`load
  * that rides along without participating in the ordering — for rank
  * stages whose output must keep a per-candidate attribute (an LSH
  * bucket, an IVF cell) that a (ord, id)-only heap would lose and a
  * post-rank join would have to RECOMPUTE from a corpus-sized frame.
  * Heap semantics are identical ((ord DESC, id ASC) total order);
  * serialization is 24 bytes per entry. */
case class TopKPayByAgg(
    ord: Expression,
    id: Expression,
    pay: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk_by_pay needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(ord, id, pay)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("pay", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, withPay = true)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ord.eval(input)
    val i = id.eval(input)
    val p = pay.eval(input)
    if (o != null && i != null && p != null) {
      buf.insert(o.asInstanceOf[Long], i.asInstanceOf[Long], p.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
    from.foreach3(into.insert)
    into
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sortedDesc3.map { case (o, i, p) =>
      InternalRow(o, i, p): Any
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * 3 * buf.size)
    buf.foreach3 { (o, i, p) => bb.putLong(o); bb.putLong(i); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(k, withPay = true)
    var n = bytes.length / 24
    while (n > 0) { buf.insert(bb.getLong(), bb.getLong(), bb.getLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPayByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPayByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPayByAgg =
    copy(ord = newChildren(0), id = newChildren(1), pay = newChildren(2))
}

/** Bounded worst-first binary heap over (ord, id) pairs, each optionally
  * carrying an inert payload long. "Worse" = smaller ord, then larger
  * id — so the root is the entry the next better candidate evicts. The
  * payload never participates in ordering (it is an attribute of the id,
  * not a rank key). */
final class TopKBuffer(k: Int, withPay: Boolean = false) {
  private val ords = new Array[Long](k)
  private val ids = new Array[Long](k)
  // allocated only for the payload-carrying aggregate: the plain TopKByAgg
  // keeps many live group buffers in ObjectHashAggregate, and a third
  // always-on k-long array would be a 50% buffer-memory tax it never reads
  private val pays: Array[Long] = if (withPay) new Array[Long](k) else null
  var size: Int = 0

  // (a) worse than (b)?
  private def worse(oa: Long, ia: Long, ob: Long, ib: Long): Boolean =
    oa < ob || (oa == ob && ia > ib)

  def insert(o: Long, i: Long): Unit = insert(o, i, 0L)

  def insert(o: Long, i: Long, p: Long): Unit = {
    if (size < k) {
      // sift up from the new leaf
      var c = size
      ords(c) = o; ids(c) = i
      if (pays != null) pays(c) = p
      size += 1
      while (c > 0 && worse(ords(c), ids(c), ords((c - 1) / 2), ids((c - 1) / 2))) {
        val par = (c - 1) / 2
        swap(c, par); c = par
      }
    } else if (worse(ords(0), ids(0), o, i)) {
      // replace the worst kept entry, sift down
      ords(0) = o; ids(0) = i
      if (pays != null) pays(0) = p
      var c = 0
      var continue = true
      while (continue) {
        val l = 2 * c + 1; val r = l + 1
        var w = c
        if (l < size && worse(ords(l), ids(l), ords(w), ids(w))) w = l
        if (r < size && worse(ords(r), ids(r), ords(w), ids(w))) w = r
        if (w == c) continue = false
        else { swap(c, w); c = w }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val to = ords(a); ords(a) = ords(b); ords(b) = to
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    if (pays != null) { val tp = pays(a); pays(a) = pays(b); pays(b) = tp }
  }

  def foreach(f: (Long, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ords(i), ids(i)); i += 1 }
  }

  def foreach3(f: (Long, Long, Long) => Unit): Unit = {
    var i = 0
    while (i < size) { f(ords(i), ids(i), pays(i)); i += 1 }
  }

  /** Kept entries, best first: (ord DESC, id ASC). Overflow-safe: no
    * negation (−Long.MinValue == Long.MinValue, which would float the
    * ascending-path NaN sentinel to rank 1 instead of last). */
  def sortedDesc: Seq[(Long, Long)] =
    (0 until size).map(i => (ords(i), ids(i)))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))

  /** Kept (ord, id, pay) entries, best first: (ord DESC, id ASC). */
  def sortedDesc3: Seq[(Long, Long, Long)] =
    (0 until size).map(i => (ords(i), ids(i), pays(i)))
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

object TopKByAgg {
  /** Aggregate Column: the k largest (ord, id) pairs per group, best
    * first. Join wide payload AFTER, on the k·groups result. */
  def topk_by(ord: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByAgg(ColumnBridge.expression(ord), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Aggregate Column: the k largest (ord, id) pairs per group, best
    * first, each carrying an inert BIGINT `pay` attribute. */
  def topk_by_pay(ord: Column, id: Column, pay: Column, k: Int): Column =
    ColumnBridge.column(
      TopKPayByAgg(ColumnBridge.expression(ord), ColumnBridge.expression(id),
        ColumnBridge.expression(pay), k)
        .toAggregateExpression())
}
