package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-language trigram log-prob table: top-vocab trigram → logp plus
  * the Laplace smoothing floor for out-of-vocabulary trigrams. */
case class TrigramModel(logp: java.util.HashMap[String, java.lang.Double],
                        floor: Double) extends Serializable {
  /** Compact — the full table must NOT be inlined into plan strings
    * (explain/PLANS.md would carry the whole vocab per language). */
  override def toString: String =
    f"TrigramModel(${logp.size()} grams, floor=$floor%.4f)"
}

/** Compiled trigram-LM document scorer — the kernel spelling of
  * LmScore.scoreDocs' scoring side. The relational spelling explodes
  * every document into its char trigrams (~len rows per doc), joins
  * the model, and re-aggregates by doc id: one row-amplifying explode
  * plus a full corpus-sized shuffle PER SCORING RUN. The model is
  * vocab-bounded (langs × vocabPerLang rows, KB–MB at any corpus
  * size), so scoring belongs on the projection side: this kernel
  * carries the collected model as a task-closure table and scores a
  * document in one pass over its code points — zero shuffles, zero
  * row amplification, whole-stage codegen. The model BUILD stays the
  * relational one-explode aggregate (that part is genuinely
  * distributed work over the corpus).
  *
  * Parity with the relational spelling (LmScoreSpec): trigrams are
  * code-point windows of the LOWERCASED text at positions
  * 1..len-2 (`substring(_t, i, 3)` counts code points); docs shorter
  * than 3 code points yield NULL (the `where length >= 3` row drop);
  * a language absent from the model yields NULL (the inner floor-join
  * row drop); OOV trigrams score the language's smoothing floor;
  * score = mean trigram log-prob. Summation order differs from the
  * hash-aggregate's, so parity is asserted to 1e-9, and report
  * consumers round to 4 dp. */
case class LmScoreExpr(left: Expression, right: Expression,
                       models: Map[String, TrigramModel])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lm_score expects (string lang, string text), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  def applyScore(lang: UTF8String, text: UTF8String): Any = {
    val model = models.getOrElse(lang.toString, null)
    if (model == null) return null
    // code-point array of the lowercased text (substring() in the
    // relational spelling counts code points, not UTF-16 chars)
    val cps = text.toLowerCase.toString.codePoints().toArray
    val n = cps.length - 2
    if (n <= 0) return null
    var sum = 0.0
    val sb = new java.lang.StringBuilder(8)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      sb.appendCodePoint(cps(i)).appendCodePoint(cps(i + 1)).appendCodePoint(cps(i + 2))
      val p = model.logp.get(sb.toString)
      sum += (if (p == null) model.floor else p.doubleValue())
      i += 1
    }
    sum / n
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    applyScore(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmScore", this, classOf[LmScoreExpr].getName)
    nullSafeCodeGen(ctx, ev, (l, r) => s"""
       |Object score = $ref.applyScore($l, $r);
       |if (score == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) score).doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LmScoreExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "lm_score"
}
