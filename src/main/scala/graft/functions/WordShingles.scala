package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass word-shingle kernel (see /root/repo/SURVEY.md §7.6).
  *
  * The composable formulation — `regexp_extract_all` tokens, then a
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * lambda — runs the lambda interpreter per position and copies a slice per
  * shingle; it dominated the dedup/fingerprint queries (~10 s each at
  * sf0.1). This expression lowercases, tokenizes (ASCII whitespace, same
  * class as regex `\s`) and emits DISTINCT n-gram shingles in one JVM pass,
  * and stays codegen-compatible via a static kernel call.
  *
  * Token/shingle semantics are identical to the lambda version (and the
  * DuckDB oracles): tokens are `\S+` runs of `lower(text)`, shingles are
  * space-joined n-grams, de-duplicated preserving nothing (set semantics).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs STRING input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles$$.MODULE$$.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  /** Matches RE2's ASCII `\s` class `[\t\n\f\r ]` — the regex engine behind
    * the DuckDB oracles. NOTE: Java's `\s` additionally includes vertical
    * tab (0x0B); it is deliberately EXCLUDED here so tokenization agrees
    * with the oracle's `\S+` on any input. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Static kernel referenced from generated code. `distinct=false` keeps
    * every positional shingle in order (winnowing needs positions). */
  def compute(input: UTF8String, n: Int, distinct: Boolean = true): ArrayData = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    // tokenize: \S+ runs
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String](toks.length * 2)
      else new java.util.ArrayList[String](toks.length)
    val sb = new java.lang.StringBuilder(64)
    var p = 0
    while (p <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(p + j))
        j += 1
      }
      seen.add(sb.toString)
      p += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_shingles(text: Column, n: Int, distinct: Boolean = true): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n, distinct))
}
