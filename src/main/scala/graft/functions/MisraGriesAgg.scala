package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary (Misra & Gries 1982) as one
  * imperative aggregate — the heavy-hitter member of the engine's sketch
  * family: CMS answers point frequency, HLL/KMV answer cardinality, this
  * answers "which keys are frequent" WITHOUT shuffling the key universe.
  *
  * State: at most `k` (key → counter) pairs plus the total item count
  * `n`. `update` is the classic rule — increment a present key, insert
  * when a slot is free, otherwise decrement ALL counters and drop zeros.
  * `merge` is the mergeable-summaries rule (Agarwal et al. PODS'12):
  * sum counters keyby-key, then subtract the (k+1)-th largest counter
  * from every entry and drop non-positives. Both preserve the MG
  * invariant: every counter undercounts its key's true frequency by at
  * most n/(k+1), so EVERY key with true count > n/(k+1) is guaranteed
  * present in the summary — under any partitioning, merge tree, or
  * micro-batch split (the state itself is order-dependent; the
  * guarantee, and therefore the exact second-pass answer built on it,
  * is not — MisraGriesSpec pins this under adversarial splits).
  *
  * This sketch is deliberately NOT the final answer: candidate counters
  * are lower bounds. [[graft.ops.FrequencyOps.exactHeavyHitters]] runs
  * the standard two-pass protocol — pass 1 collects the ≤k candidates,
  * pass 2 recounts exactly the candidate keys and filters
  * `count·k > n`. The output is then exactly {key : freq > n/k},
  * DETERMINISTIC and SQL-expressible, which is what lets a DuckDB
  * oracle hash-check a query built on an order-dependent sketch.
  *
  * Scale: exact heavy hitters via groupBy shuffles one row per DISTINCT
  * key — 10^10 shuffle rows for an n-gram universe at 100 TB. This
  * carries ≤k entries per partial (map-side combined), the exchange is
  * k rows per partition, and the second pass is a candidate-membership
  * row filter (an `InSet` of ≤k keys — no join, no extra shuffle beyond
  * the ≤k-group recount). Eval emits `(n, entries[(key, lb)])` with
  * entries sorted (lb desc, key) for a deterministic presentation. */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesAgg.MgState] {

  require(k >= 1 && k <= (1 << 16), s"misra_gries: k must be in [1, 65536], got $k")

  /** String keys only, rejected at ANALYSIS time: update() casts the
    * child's value to UTF8String, so without this a non-string column
    * (easy via the SQL-registered `misra_gries`) would fail at executor
    * runtime with ClassCastException instead of a plan-time error. */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a STRING key, got ${child.dataType.catalogString}")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesAgg.OutType

  override def createAggregationBuffer(): MisraGriesAgg.MgState =
    new MisraGriesAgg.MgState()

  override def update(buf: MisraGriesAgg.MgState,
                      input: InternalRow): MisraGriesAgg.MgState = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.counts.get(key)
      if (cur != null) buf.counts.put(key, java.lang.Long.valueOf(cur + 1L))
      else if (buf.counts.size < k) buf.counts.put(key, java.lang.Long.valueOf(1L))
      else {
        // decrement-all: one unit leaves every counter AND the new item
        // (k+1 distinct keys each lose one occurrence — the charging
        // argument behind the n/(k+1) bound)
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val d = e.getValue - 1L
          if (d <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(d))
        }
      }
    }
    buf
  }

  override def merge(a: MisraGriesAgg.MgState,
                     b: MisraGriesAgg.MgState): MisraGriesAgg.MgState = {
    a.n += b.n
    val bit = b.counts.entrySet().iterator()
    while (bit.hasNext) {
      val e = bit.next()
      val cur = a.counts.get(e.getKey)
      a.counts.put(e.getKey,
        java.lang.Long.valueOf(if (cur == null) e.getValue.longValue
                               else cur + e.getValue))
    }
    if (a.counts.size > k) {
      // subtract the (k+1)-th largest counter from all, drop non-positive
      val vals = new Array[Long](a.counts.size)
      val vit = a.counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it = a.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val d = e.getValue - sub
        if (d <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(d))
      }
    }
    a
  }

  override def eval(buf: MisraGriesAgg.MgState): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (key, lb) => (-lb, key) }
    val rows: Array[Any] = sorted.map { case (key, lb) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), lb))
    }
    new GenericInternalRow(Array[Any](buf.n, new GenericArrayData(rows)))
  }

  override def serialize(buf: MisraGriesAgg.MgState): Array[Byte] = {
    var size = 8 + 4
    val keys = new Array[Array[Byte]](buf.counts.size)
    val vals = new Array[Long](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.getBytes(StandardCharsets.UTF_8)
      vals(i) = e.getValue
      size += 4 + keys(i).length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(size)
    bb.putLong(buf.n).putInt(keys.length)
    i = 0
    while (i < keys.length) {
      bb.putInt(keys(i).length).put(keys(i)).putLong(vals(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.MgState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new MisraGriesAgg.MgState()
    st.n = bb.getLong()
    val m = bb.getInt()
    var i = 0
    while (i < m) {
      val len = bb.getInt()
      val kb = new Array[Byte](len)
      bb.get(kb)
      st.counts.put(new String(kb, StandardCharsets.UTF_8),
        java.lang.Long.valueOf(bb.getLong()))
      i += 1
    }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {

  /** Mutable summary: total item count + ≤k lower-bound counters. */
  final class MgState {
    var n: Long = 0L
    val counts = new java.util.HashMap[String, java.lang.Long]()
  }

  val EntryType: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("lb", LongType, nullable = false)))

  val OutType: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(EntryType, containsNull = false),
      nullable = false)))

  /** Aggregate Column: `(n, entries[(key, lb)])`, entries sorted
    * (lb desc, key). Every key with true frequency > n/(k+1) is present. */
  def misra_gries(key: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(key), k).toAggregateExpression())
}
