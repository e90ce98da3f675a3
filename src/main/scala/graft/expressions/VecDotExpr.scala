package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen dot product over two `array<float|double>` columns —
  * the promoted form of VectorFunctions.vecDot (SURVEY §7: "promote
  * hot ones to custom Catalyst Expression with codegen only if BENCH
  * needs it"). Mirrors the reference's innermost MAC loop
  * (/root/reference/simulator/sim_reflex.py:72 `np.dot`;
  * /root/reference/imc22_sdk/imc22_cim.c:110-127 accumulate loop).
  *
  * Generates a tight scalar loop over the ArrayData, accumulating in
  * double with left-to-right order — bit-identical to the sequential
  * `aggregate(zip_with(...))` fold it replaces, so oracle-checked
  * queries can swap spellings without result drift. That parity
  * includes the null cases: a length mismatch or a null element
  * yields NULL, exactly as `zip_with` + `aggregate` (and DuckDB's
  * `list_*` spellings) do — never a silent truncation.
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  /** Nullable regardless of child nullability: a dim mismatch or a
    * null array element produces NULL even from non-null inputs. */
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElems(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot_fast expects array<float|double> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val la = elemType(left) == FloatType
    val rb = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (la) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rb) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(e: Expression, v: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      // element null checks only emitted when the array type admits
      // null elements — the common containsNull=false scan data pays
      // no per-element branch
      val nullCheck =
        if (mayHaveNullElems(left) || mayHaveNullElems(right)) {
          val checks = Seq(
            if (mayHaveNullElems(left)) Some(s"$a.isNullAt($i)") else None,
            if (mayHaveNullElems(right)) Some(s"$b.isNullAt($i)") else None
          ).flatten.mkString(" || ")
          s"if ($checks) { ${ev.isNull} = true; break; }"
        } else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${getter(left, a, i)} * ${getter(right, b, i)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot_fast"
}
