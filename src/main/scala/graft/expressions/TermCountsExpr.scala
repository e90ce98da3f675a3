package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document query-term counts in one compiled pass — the scoring
  * primitive of lexical retrieval (TF for BM25/TF-IDF). Returns
  * `struct(counts: array<int>, n_tokens: int)` where `counts(i)` is
  * the occurrence count of `terms(i)` among the lowercased whitespace
  * tokens and `n_tokens` is the document length in tokens (BM25's
  * `|d|`).
  *
  * The relational spelling (explode tokens → filter to query terms →
  * groupBy doc × term → pivot back to the doc row) shuffles the
  * exploded corpus twice; like LangIdExpr, this kernel resolves each
  * token with ONE hash-map probe, so scoring is a shuffle-free
  * projection — at 100 TB retrieval cost is scan bandwidth.
  * Query terms are matched lowercased; a null document yields null. */
case class TermCountsExpr(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "terms must be non-empty")

  override def dataType: DataType = StructType(Seq(
    StructField("counts", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"term_counts expects a string input, got ${other.simpleString}")
  }

  @transient private lazy val index: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.putIfAbsent(t.toLowerCase(java.util.Locale.ROOT), Integer.valueOf(i))
    }
    m
  }

  def applyText(text: UTF8String): Any = {
    val toks = TextTokens.split(text.toLowerCase.toString)
    val counts = new Array[Int](terms.length)
    var i = 0
    while (i < toks.length) {
      val idx = index.get(toks(i))
      if (idx != null) counts(idx.intValue()) += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UnsafeArrayData.fromPrimitiveArray(counts), toks.length))
  }

  override def nullSafeEval(v: Any): Any = applyText(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounts", this, classOf[TermCountsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (InternalRow) $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)

  override def prettyName: String = "term_counts"
}
