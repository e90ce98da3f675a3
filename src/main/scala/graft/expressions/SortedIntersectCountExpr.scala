package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |a ∩ b| of two SORTED `array<bigint>` columns — the fused kernel of
  * the edge-iterator triangle count (Triangles.closedWedgeCountViaIntersect):
  * one long per common element, counted in a tight loop with ZERO
  * per-row allocation. The builtin `array_intersect` spelling builds a
  * hash set per row (measured 2.7 s vs the wedge join's 2.0 s on the
  * sf0.1 graph); this kernel walks the arrays directly.
  *
  * Hybrid cost shape: when the arrays are comparably sized a linear
  * merge costs |a|+|b|; when one is much smaller, iterating the small
  * one with a binary search in the large one costs min·log(max). The
  * cheaper mode is chosen per row, so the per-edge cost is
  * min(|a|+|b|, min·log max) — and Σ_{(a,b)∈E} min(deg a, deg b) is
  * O(m^1.5) on any graph, which keeps the route inside the same work
  * bound as the degree-oriented wedge probe even on skewed inputs
  * (a hub's huge in-list is binary-searched, never walked).
  *
  * Contract: both inputs sorted ascending with DISTINCT, NON-NULL
  * elements (the caller builds them with sort_array(collect_list) over
  * distinct oriented edges); a null ARRAY yields NULL. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<bigint> inputs, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCountExpr.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the kernel lives in ONE static method shared with eval — the
    // generated code stays a single call, trivially inlineable by C2,
    // and whole-stage codegen is preserved for the surrounding plan
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SortedIntersectCountExpr.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCountExpr {
  /** Count of common elements of two sorted long arrays. Hybrid:
    * linear merge when sizes are comparable, binary-search probing of
    * the larger array when min·log2(max) is cheaper. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0L
    val (s, l, ns, nl) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    // log2(nl) via numberOfLeadingZeros; merge when cheaper
    val log2l = 64 - java.lang.Long.numberOfLeadingZeros(nl.toLong)
    var c = 0L
    if (ns.toLong * log2l >= ns.toLong + nl.toLong) {
      // linear merge
      var i = 0
      var j = 0
      while (i < ns && j < nl) {
        val x = s.getLong(i)
        val y = l.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    } else {
      // iterate the small side, binary-search the large one; `lo`
      // carries forward because both arrays are sorted
      var i = 0
      var lo = 0
      while (i < ns && lo < nl) {
        val x = s.getLong(i)
        var a0 = lo
        var b0 = nl - 1
        // find first index >= x in l[a0..b0]
        while (a0 < b0) {
          val mid = (a0 + b0) >>> 1
          if (l.getLong(mid) < x) a0 = mid + 1 else b0 = mid
        }
        if (l.getLong(a0) == x) { c += 1; lo = a0 + 1 }
        else if (l.getLong(a0) < x) lo = nl // x beyond the large array
        else lo = a0
        i += 1
      }
    }
    c
  }
}
