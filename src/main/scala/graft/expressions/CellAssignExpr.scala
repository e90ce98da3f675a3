package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Best-cell id of a vector under a codebook attached as a plan
  * REFERENCE object — the SemDeDup / k-means / IVF assignment kernel
  * for codebooks too large to inline as literals: the Column spelling
  * (greatest over k structs of vecCosine/vecDot against k literal
  * arrays) UNROLLS k·dim arithmetic into generated code and breaches
  * janino's 64 KB method limit around k ≈ 100 (the PqNearestExpr
  * rationale), silently dropping the whole projection to interpreted
  * eval; this kernel is one tight double loop, code size constant in
  * k·dim.
  *
  * `metric` picks the score: "cosine" (KMeans.fit's rule —
  * dot / (||v|| · ||c||), scale-invariant) or "dot" (the IVF
  * routing rule for unit-norm codebooks). `withScore` returns
  * struct<cell int, score double> instead of the bare cell id — the
  * Lloyd-sweep shape, where the winning score feeds the objective:
  * one kernel pass replaces argmax + a whole-codebook-literal
  * re-score (`element_at(typedLit(codebook), cell+1)`), whose
  * Literal alone is k·dim boxed doubles rebuilt and reshipped every
  * sweep. Scores EXACTLY like the
  * literal spelling: VecDotExpr's left-to-right double accumulation,
  * per-centroid norms precomputed once with the same fold, and the
  * argmax compares with java.lang.Double.compare — Spark's own
  * double ordering, so ties resolve to the HIGHER cell and NaN
  * outranks everything exactly like greatest(struct(score, cell));
  * swapping spellings never moves an assignment (asserted
  * differentially in SimilaritySearchSpec/KMeansSpec). NULL on null
  * input, a vector whose length ≠ dim, or — when the array TYPE
  * admits null elements (containsNull=true) — any null element. A
  * containsNull=false schema is trusted, the Spark convention: both
  * eval paths skip the per-element check, and data that lies about
  * its schema is undefined behavior exactly as in the built-in
  * array expressions. */
case class CellAssignExpr(child: Expression, flat: Array[Double],
                          k: Int, dim: Int, metric: String = "cosine",
                          withScore: Boolean = false)
    extends UnaryExpression {

  require(flat.length == k * dim,
    s"flat codebook length ${flat.length} != $k*$dim")
  require(metric == "cosine" || metric == "dot",
    s"cell_assign metric must be 'cosine' or 'dot', got '$metric'")
  private val useCosine = metric == "cosine"

  override def dataType: DataType =
    if (withScore)
      StructType(Seq(StructField("cell", IntegerType, nullable = false),
        StructField("score", DoubleType, nullable = false)))
    else IntegerType
  override def nullable: Boolean = true

  /** Per-centroid L2 norms, computed with the literal spelling's own
    * left-to-right fold so the division sees identical doubles. */
  @transient private lazy val normC: Array[Double] =
    Array.tabulate(k) { c =>
      var d = 0.0
      var j = 0
      while (j < dim) { val x = flat(c * dim + j); d += x * x; j += 1 }
      math.sqrt(d)
    }

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val mayHaveNullElems: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  /** Content-based equality (the PqNearestExpr discipline): the
    * default case-class equals compares `flat` referentially, which
    * would defeat canonicalization/CSE across separate flatten
    * calls. */
  override def equals(other: Any): Boolean = other match {
    case that: CellAssignExpr =>
      child == that.child && k == that.k && dim == that.dim &&
        metric == that.metric && withScore == that.withScore &&
        java.util.Arrays.equals(flat, that.flat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(k), Int.box(dim), metric,
      Boolean.box(withScore), Int.box(java.util.Arrays.hashCode(flat)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cell_assign expects array<float|double>, got ${other.simpleString}")
  }

  override def nullSafeEval(vAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val isF = elemIsFloat
    // hoist the vector into a primitive double[] ONCE (dim accessor
    // calls), so the k·dim hot loop below is pure primitive-array
    // arithmetic instead of k·dim virtual ArrayData getters — same
    // doubles in the same order, just a faster spelling
    val vv = new Array[Double](dim)
    var nvS = 1.0
    var nv = 0.0
    var j = 0
    while (j < dim) {
      if (mayHaveNullElems && v.isNullAt(j)) return null
      val x = if (isF) v.getFloat(j).toDouble else v.getDouble(j)
      vv(j) = x
      nv += x * x
      j += 1
    }
    // ||v||: the same left-to-right fold as vecL2(v) (cosine only)
    if (useCosine) nvS = math.sqrt(nv)
    var best = 0
    var bestS = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var dot = 0.0
      val off = c * dim
      var i = 0
      while (i < dim) {
        dot += vv(i) * flat(off + i)
        i += 1
      }
      val s = if (useCosine) dot / (nvS * normC(c)) else dot
      // Spark's double ordering (Double.compare): tie → higher cell,
      // NaN outranks — exactly greatest(struct(score, cell))
      if (java.lang.Double.compare(s, bestS) >= 0) { bestS = s; best = c }
      c += 1
    }
    if (withScore)
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](best, bestS))
    else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("cellFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("cellNorms", normC, "double[]")
    val getter = (v: String, j: String) =>
      if (elemIsFloat) s"(double) $v.getFloat($j)" else s"$v.getDouble($j)"
    nullSafeCodeGen(ctx, ev, v => {
      val nv = ctx.freshName("nv")
      val nvS = ctx.freshName("nvS")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val vv = ctx.freshName("vv")
      val nullCheck =
        if (mayHaveNullElems)
          s"if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }"
        else ""
      // the copy pass hoists the vector into a primitive double[]
      // ONCE (dim accessor calls), so the k·dim hot loop below is
      // pure primitive-array arithmetic instead of k·dim virtual
      // ArrayData getters — same doubles in the same order; ||v|| is
      // the same left-to-right fold as vecL2(v) (cosine only)
      val normPass =
        if (useCosine)
          s"""
             |double $nv = 0.0;
             |for (int $j = 0; $j < $dim; $j++) {
             |  $nullCheck
             |  double $x = ${getter(v, j)};
             |  $vv[$j] = $x;
             |  $nv += $x * $x;
             |}
             |double $nvS = Math.sqrt($nv);""".stripMargin
        else
          s"""
             |double $nvS = 1.0;
             |for (int $j = 0; $j < $dim; $j++) {
             |  $nullCheck
             |  $vv[$j] = ${getter(v, j)};
             |}""".stripMargin
      val score =
        if (useCosine) s"$dot / ($nvS * $normRef[$c])" else dot
      val emit =
        if (withScore)
          s"""${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
             |  new Object[]{Integer.valueOf($best), Double.valueOf($bestS)});""".stripMargin
        else s"${ev.value} = $best;"
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $vv = new double[$dim];
         |  $normPass
         |  if (!${ev.isNull}) {
         |    int $best = 0;
         |    double $bestS = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $k; $c++) {
         |      double $dot = 0.0;
         |      int $off = $c * $dim;
         |      for (int $i = 0; $i < $dim; $i++) {
         |        $dot += $vv[$i] * $flatRef[$off + $i];
         |      }
         |      double $s = $score;
         |      if (java.lang.Double.compare($s, $bestS) >= 0) { $bestS = $s; $best = $c; }
         |    }
         |    $emit
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CellAssignExpr =
    copy(child = newChild)

  override def prettyName: String = "cell_assign"
}
