package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dynamic-time-warping distance between a per-row sequence and a
  * literal probe sequence — the similarity primitive of trajectory
  * top-k search (per the retrieved "REPOSE: Distributed Top-k
  * Trajectory Similarity Search", ICDE 2021 — PAPERS.md; pattern
  * only). Classic O(n·m) DP with |a−b| local cost and
  * (i−1,j) / (i,j−1) / (i−1,j−1) steps; two rolling rows of state.
  * The probe ships in the plan like FC weights (bounded, KB-class);
  * scoring is a compiled per-row pass, so a corpus-wide top-k is a
  * shuffle-free projection into TakeOrderedAndProject. NULL sequence
  * or empty input yields NULL (no alignment exists). */
case class DtwExpr(child: Expression, probe: Seq[Double])
    extends UnaryExpression {

  require(probe.nonEmpty, "probe sequence must be non-empty")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dtw expects array<double> input, got ${other.simpleString}")
  }

  @transient private lazy val p: Array[Double] = probe.toArray
  @transient private lazy val elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  def applySeq(a: ArrayData): Any = {
    val n = a.numElements()
    if (n == 0) return null
    val m = p.length
    // rolling DP rows over the probe axis
    var prev = new Array[Double](m + 1)
    var cur = new Array[Double](m + 1)
    java.util.Arrays.fill(prev, Double.PositiveInfinity)
    prev(0) = 0.0
    var i = 1
    while (i <= n) {
      if (elemsNullable && a.isNullAt(i - 1)) return null
      val x = a.getDouble(i - 1)
      cur(0) = Double.PositiveInfinity
      var j = 1
      while (j <= m) {
        val c = math.abs(x - p(j - 1))
        cur(j) = c + math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  override def nullSafeEval(v: Any): Any = applySeq(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dtw", this, classOf[DtwExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |Object d = $ref.applySeq($a);
       |if (d == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ((Double) d).doubleValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DtwExpr =
    copy(child = newChild)

  override def prettyName: String = "dtw"
}
