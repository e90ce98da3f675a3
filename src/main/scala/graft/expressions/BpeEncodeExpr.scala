package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a trained BPE merge list (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the public
  * algorithm behind GPT-2/RoBERTa vocabularies) to text: per
  * whitespace word, start from characters plus an end-of-word marker
  * and repeatedly merge the adjacent pair with the LOWEST merge rank
  * until no learned pair remains.
  *
  * Like WordPieceExpr, the merge table is a literal constructor
  * argument (bounded KB–MB artifact shipped with the plan, broadcast
  * once per executor — the train-bounded-artifact / score-as-
  * projection discipline). The per-row loop is compiled Scala invoked
  * from generated code; O(word-len²·merges-applied) worst case per
  * word, shuffle-free.
  *
  * Reference analog: the reference compresses activation streams with
  * dictionary codecs (compression.c:145-204); BPE is the text-corpus
  * equivalent — a learned dictionary of frequent adjacent units.
  */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects a string input, got ${other.simpleString}")
  }

  @transient private lazy val ranks: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, r) => m.put(p, r) }
    m
  }

  /** Java-regex `\s` ([ \t\n\x0B\f\r]) — the EXACT predicate of
    * BpeTrain's `split("\\s+")` training tokenization.
    * Character.isWhitespace additionally accepts U+001C–001F and
    * U+2028/2029, which would split apply-side words the model
    * trained as single symbol sequences. */
  private def isRegexSpace(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
      ch == '\f' || ch == '\r'

  /** Compiled per-row encoder, invoked from generated code. */
  def applyText(text: UTF8String): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || isRegexSpace(s.charAt(i))) {
        if (i > start) {
          val pieces = graft.operators.BpeTrain.encodeWordRanked(
            s.substring(start, i), ranks)
          var k = 0
          while (k < pieces.length) {
            out.add(UTF8String.fromString(pieces(k))); k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = applyText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}
