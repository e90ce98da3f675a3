package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled marker-lexicon language ID — the kernel spelling of the
  * HOF composition `array_max(array(struct(size(filter(tokens,
  * isin(markers))), lang), ...))` (TextFunctions.langIdHof, parity
  * reference). Catalyst HOF lambdas do not codegen: the HOF spelling
  * interprets one lambda call per token PER LANGUAGE (~tokens×langs
  * interpreter dispatches per row — the same anti-pattern class the
  * VecDot/activation kernels removed from the vector path). This
  * kernel tokenizes once and resolves each token with ONE hash-map
  * probe into a token→language-bitmask table, so per-row cost is
  * O(tokens), language-count-independent, inside whole-stage codegen.
  *
  * Exact HOF parity (spec-asserted): tokens = `split(lower(text),
  * "\\s+")` with Java-regex limit -1 semantics; score = marker hits
  * counted WITH multiplicity; winner = lexicographically max
  * (score, lang) struct — ties go to the later language code; zero
  * hits → 'und'; null text → null.
  *
  * Reference analog: the cascade classifier gate
  * (/root/reference/firmware/middleware/cascade_model.c:71-133) —
  * score-and-argmax per item; here over language marker lexicons. */
case class LangIdExpr(child: Expression, markers: Map[String, Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects a string input, got ${other.simpleString}")
  }

  /** Languages in sorted order — the tie-break order of the struct
    * array_max (later code wins a score tie). */
  @transient private lazy val langs: Array[String] = markers.keys.toArray.sorted

  /** token → bitmask of the languages whose lexicon contains it. */
  @transient private lazy val tokenMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    langs.zipWithIndex.foreach { case (lang, i) =>
      markers(lang).foreach { t =>
        m.merge(t, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }

  @transient private lazy val und = UTF8String.fromString("und")
  @transient private lazy val langU8: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  def applyText(text: UTF8String): UTF8String = {
    val toks = TextTokens.split(text.toLowerCase.toString)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val mask = tokenMask.get(toks(i))
      if (mask != null) {
        var m = mask.intValue()
        while (m != 0) {
          val b = java.lang.Integer.numberOfTrailingZeros(m)
          counts(b) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    var best = 0
    var bestScore = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) >= bestScore) { best = l; bestScore = counts(l) }
      l += 1
    }
    if (bestScore > 0) langU8(best) else und
  }

  override def nullSafeEval(v: Any): Any = applyText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langId", this, classOf[LangIdExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)

  override def prettyName: String = "lang_id"
}
