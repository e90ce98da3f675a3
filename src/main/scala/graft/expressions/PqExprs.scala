package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest product-quantizer centroid for one sub-vector — the PQ
  * assignment kernel (operators/ProductQuantizer). `sub` selects
  * which of the `m` per-subspace codebooks applies; the expression
  * returns the 0-based index of the L2-nearest of its `k` centroids
  * (ties to the LOWEST index — strict `<` keeps the first minimum).
  *
  * Why an expression and not Column combinators: the combinator
  * spelling (greatest over k structs, × m subspaces in one
  * projection) UNROLLS m·k·subDim arithmetic into generated code —
  * at m=16, k=32 the projection breaches janino's 64 KB method limit
  * and the whole stage silently falls back to interpreted eval, the
  * exact failure mode VecElemExprs exists to avoid. This kernel
  * generates one tight double loop with the codebooks attached as a
  * plan REFERENCE object (flat double[], never inlined in code), so
  * code size is constant in m·k·subDim.
  *
  * Null semantics: NULL on null inputs, a sub index outside [0, m),
  * a sub-vector whose length ≠ subDim, or any null element — never a
  * silent truncation (the VecDotExpr discipline). */
case class PqNearestExpr(left: Expression, right: Expression,
                         m: Int, k: Int, subDim: Int, flat: Array[Double])
    extends BinaryExpression {

  require(flat.length == m * k * subDim,
    s"flat codebook length ${flat.length} != $m*$k*$subDim")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val elemIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val mayHaveNullElems: Boolean =
    right.dataType.asInstanceOf[ArrayType].containsNull

  /** Content-based equality: the default case-class equals compares
    * `flat` referentially (Array equals is eq), so two logically
    * identical kernels built from separate flatten calls would never
    * canonicalize equal and common-subexpression elimination could
    * not deduplicate them. Compare (and hash) the codebook by value. */
  override def equals(other: Any): Boolean = other match {
    case that: PqNearestExpr =>
      left == that.left && right == that.right && m == that.m &&
        k == that.k && subDim == that.subDim &&
        java.util.Arrays.equals(flat, that.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(left, right, Int.box(m), Int.box(k),
      Int.box(subDim), Int.box(java.util.Arrays.hashCode(flat)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val svOk = right.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (left.dataType == IntegerType && svOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_nearest expects (int, array<float|double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(subAny: Any, svAny: Any): Any = {
    val sub = subAny.asInstanceOf[Int]
    val sv = svAny.asInstanceOf[ArrayData]
    if (sub < 0 || sub >= m || sv.numElements() != subDim) return null
    val isF = elemIsFloat
    val base = sub * k * subDim
    var best = -1
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var d = 0.0
      val off = base + c * subDim
      var j = 0
      while (j < subDim) {
        if (sv.isNullAt(j)) return null
        val x = if (isF) sv.getFloat(j).toDouble else sv.getDouble(j)
        val t = x - flat(off + j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val getter = (v: String, j: String) =>
      if (elemIsFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
    nullSafeCodeGen(ctx, ev, (sub, sv) => {
      val base = ctx.freshName("base")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($sv.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($sub < 0 || $sub >= $m || $sv.numElements() != $subDim) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $base = $sub * ${k * subDim};
         |  int $best = -1;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
         |    double $d = 0.0;
         |    int $off = $base + $c * $subDim;
         |    for (int $j = 0; $j < $subDim; $j++) {
         |      $nullCheck
         |      double $t = ${getter(sv, j)} - $flatRef[$off + $j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $best;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqNearestExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_nearest"
}
