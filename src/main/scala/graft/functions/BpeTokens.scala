package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Subword token counting by greedy longest-prefix segmentation over a
  * vocabulary — the INFERENCE shape shared by BPE and WordPiece tokenizers
  * (Sennrich et al. 2016; the greedy longest-match-first variant is
  * WordPiece's, and is what production token-budget accounting runs):
  * lowercase, split on whitespace (`\S+`, identical to [[WordShingles]] and
  * the DuckDB oracles), then segment each pretoken left-to-right, at each
  * position consuming the LONGEST vocabulary entry that matches, falling
  * back to a single character (the byte/char-fallback every real vocab
  * guarantees). Returns the total segment count — the "how many tokens is
  * this document" number that drives context packing, cost estimation and
  * per-token quality ratios (`q_token_stats` counts whitespace words; real
  * pipelines budget in SUBWORD tokens, typically 1.3-4× larger).
  *
  * The vocabulary is a plain `Seq[String]` baked into the expression (a
  * production tokenizer file is a few tens of thousands of entries —
  * kilobytes, task-broadcast with the serialized plan exactly like the
  * quantizer codebooks). Matching uses a per-length hash-set probe from
  * `maxLen` down to 2 (vocab entries are ≥2 chars; length-1 entries would
  * be equivalent to the fallback), so each position costs at most
  * `maxLen-1` hash lookups — no per-row allocation beyond the lowercase
  * copy. Codegen-compatible via a static kernel + a referenced matcher
  * object, same pattern as [[WordShingles]].
  */
case class BpeTokenCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count needs STRING input, got ${child.dataType.catalogString}")

  @transient private lazy val matcher = new BpeTokens.Matcher(vocab)

  override def nullSafeEval(input: Any): Any =
    BpeTokens.count(input.asInstanceOf[UTF8String], matcher)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bpeMatcher", matcher,
      classOf[BpeTokens.Matcher].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeTokens$$.MODULE$$.count($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokens {
  /** Greedy-longest-match vocabulary: one string hash-set per entry
    * length, probed longest-first. Entries shorter than 2 chars are
    * dropped (the single-char fallback subsumes them). */
  final class Matcher(vocab: Seq[String]) extends Serializable {
    private[BpeTokens] val byLen: Map[Int, java.util.HashSet[String]] =
      vocab.filter(_.length >= 2).groupBy(_.length).map { case (l, es) =>
        val s = new java.util.HashSet[String](es.size * 2)
        es.foreach(s.add); l -> s
      }
    private[BpeTokens] val maxLen: Int =
      if (byLen.isEmpty) 0 else byLen.keys.max
    /** Longest vocab match starting at `pos` in `s(pos until end)`, or 1
      * (fallback). `end` is the pretoken boundary — matches never span
      * whitespace into the next token. */
    def advance(s: String, pos: Int, end: Int): Int = {
      var l = math.min(maxLen, end - pos)
      while (l >= 2) {
        val set = byLen.getOrElse(l, null)
        if (set != null && set.contains(s.substring(pos, pos + l))) return l
        l -= 1
      }
      1
    }
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Static kernel referenced from generated code: lowercase, `\S+`
    * pretokenize, greedily segment each pretoken, return total segments. */
  def count(input: UTF8String, m: Matcher): Int = {
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    var n = 0
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      var p = start
      while (p < i) { p += m.advance(s, p, i); n += 1 }
    }
    n
  }

  /** Column form: subword token count of `text` under `vocab`. */
  def bpe_token_count(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), vocab))
}
