package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match WordPiece tokenization (the standard public
  * BERT algorithm: per whitespace word, repeatedly take the longest
  * vocab piece, continuation pieces spelled "##x"; a word with no
  * match at some position becomes a single `unk` token). The
  * production subword op for token-budget accounting — the regex
  * `subword_count` stays as the cheap approximation
  * (TextFunctions.subwordCount).
  *
  * The vocabulary is a literal constructor argument (the reference's
  * ≤512 KB-artifact discipline: vocab ships with the plan like FC
  * weights do, broadcast once per executor — no runtime state, no
  * side files). Matching is a per-row compiled loop invoked from
  * generated code (VecMapExpr pattern), O(Σ word-len · max-piece-len)
  * per row, shuffle-free. */
case class WordPieceExpr(child: Expression, vocab: Seq[String],
                         unk: String = "[UNK]")
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_tokenize expects a string input, got ${other.simpleString}")
  }

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxPieceLen: Int =
    if (vocab.isEmpty) 0 else vocab.iterator.map(_.length).max
  private val maxWordChars = 200

  private def tokenizeWord(word: String, out: java.util.ArrayList[UTF8String]): Unit = {
    if (word.isEmpty) return
    if (word.length > maxWordChars) { out.add(UTF8String.fromString(unk)); return }
    val pieces = new java.util.ArrayList[UTF8String](4)
    var i = 0
    while (i < word.length) {
      val prefix = if (i == 0) "" else "##"
      var end = math.min(word.length, i + maxPieceLen - prefix.length)
      var matched = -1
      while (end > i && matched < 0) {
        if (vocabSet.contains(prefix + word.substring(i, end))) matched = end
        else end -= 1
      }
      if (matched < 0) { out.add(UTF8String.fromString(unk)); return }
      pieces.add(UTF8String.fromString(prefix + word.substring(i, matched)))
      i = matched
    }
    out.addAll(pieces)
  }

  /** Compiled per-row tokenizer, invoked from generated code. */
  def applyText(text: UTF8String): GenericArrayData = {
    val out = new java.util.ArrayList[UTF8String]()
    val s = text.toString
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || Character.isWhitespace(s.charAt(i))) {
        if (i > start) tokenizeWord(s.substring(start, i), out)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(v: Any): Any = applyText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordPiece", this, classOf[WordPieceExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceExpr =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_tokenize"
}

object WordPieceExpr {
  /** Deterministic default vocabulary: every printable ASCII char as
    * both start and continuation piece (total coverage — no word ever
    * degrades to [UNK]) plus a seeded set of common English subwords
    * so realistic text compresses below char-level. A production
    * pipeline passes its trained vocab instead. */
  val defaultVocab: Seq[String] = {
    val chars = (33 to 126).map(_.toChar.toString)
    val subwords = Seq(
      "the", "and", "ing", "ion", "tion", "ent", "ous", "ate", "ed",
      "er", "est", "ly", "re", "un", "in", "on", "at", "or", "an",
      "data", "model", "train", "learn", "sample", "token", "word")
    chars ++ chars.map("##" + _) ++
      subwords ++ subwords.map("##" + _)
  }
}
