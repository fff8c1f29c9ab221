package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MAP-ONLY MinHash signature of a text column: shingle → hash → k
  * affine-permutation minima fused into one per-row kernel, no explode
  * and NO SHUFFLE.
  *
  * The batch pipeline ([[graft.dedup.DedupOps.minhashSignatures]])
  * computes the identical signature as `explode(shingles)` → `xxhash64`
  * → [[MinHashSigAgg]]: a shuffle-free per-doc aggregate was the right
  * shape there because the exploded frame is REUSED for the exact-Jaccard
  * verification join. This expression exists for consumers that need the
  * signature alone — above all the STREAMING ingest path, where a
  * groupBy-based signature would be a stateful aggregate (complete-mode
  * state per doc forever) while a map-only projection composes freely
  * with downstream stateful operators. FunctionsSpec pins
  * kernel ≡ explode+agg equality on the real corpus.
  *
  * Equality is achieved by construction: tokens/shingles come from
  * [[WordShingles.compute]] (distinct set semantics), the base hash is
  * Spark's own `xxhash64` (`XXH64.hashUTF8String`, seed 42), and the k
  * affine permutations reuse [[MinHashSigAgg]]'s generator (same
  * `scala.util.Random(seed)` draw sequence, same `mod 2^31-1` fold).
  */
case class MinHashTextSig(child: Expression, n: Int, k: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_text_sig needs STRING input, got ${child.dataType.catalogString}")

  @transient private lazy val perms = new MinHashSig.Perms(k, seed)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.signature(input.asInstanceOf[UTF8String], n, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("minhashPerms", perms,
      classOf[MinHashSig.Perms].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig$$.MODULE$$.signature($c, $n, $p)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashTextSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Same prime and coefficient draw as [[MinHashSigAgg]] — the spec
    * asserts bit-equality of the resulting signatures. */
  val Prime = 2147483647L // 2^31 - 1

  final class Perms(val k: Int, seed: Long) extends Serializable {
    private[MinHashSig] val a = new Array[Long](k)
    private[MinHashSig] val b = new Array[Long](k)
    locally {
      val rng = new scala.util.Random(seed)
      var i = 0
      while (i < k) {
        a(i) = rng.nextInt(Int.MaxValue - 1).toLong + 1
        b(i) = rng.nextInt(Int.MaxValue).toLong
        i += 1
      }
    }
  }

  /** Spark's `xxhash64` seed for single-argument calls. */
  private val XxSeed = 42L

  /** Static kernel referenced from generated code: distinct word
    * n-shingles ([[WordShingles.compute]]) → `xxhash64` → fold to
    * `[0, p)` → k affine minima. Empty shingle set yields the same
    * all-`Prime` signature the aggregate's empty buffer produces. */
  def signature(input: UTF8String, n: Int, perms: Perms): ArrayData = {
    val shingles = WordShingles.compute(input, n, distinct = true)
    val k = perms.k
    val sig = Array.fill(k)(Prime)
    var s = 0
    val nSh = shingles.numElements()
    while (s < nSh) {
      val h64 = XXH64.hashUTF8String(shingles.getUTF8String(s), XxSeed)
      val h = java.lang.Math.floorMod(h64, Prime)
      var i = 0
      while (i < k) {
        val m = java.lang.Math.floorMod(perms.a(i) * h + perms.b(i), Prime)
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** Column form: k-element minhash signature of `text`'s word n-shingles. */
  def minhash_text_sig(text: Column, n: Int, k: Int, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashTextSig(ColumnBridge.expression(text), n, k, seed))
}
