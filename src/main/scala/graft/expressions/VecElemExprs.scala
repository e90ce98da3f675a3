package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd elementwise vector kernels — the promoted forms of the
  * VectorFunctions activation/normalization HOF spellings (the same
  * promotion VecDotExpr made for the dot product; SURVEY §7: "promote
  * hot ones to custom Catalyst Expression with codegen only if BENCH
  * needs it" — BENCH_r03's qv8 showed interpreted HOF lambdas owning
  * the vector path).
  *
  * Reference semantics: GELU/SiLU
  * /root/reference/mlir_compiler/transformer_ops.py:43-50,117-133;
  * sigmoid/tanh/relu /root/reference/imc22_sdk/imc22_cim.c:274-293;
  * LayerNorm/RMSNorm transformer_ops.py:54-67,84-97; softmax
  * /root/reference/firmware/middleware/cascade_model.c:203-229.
  *
  * Parity contract (asserted by VecElemExprsSpec): every kernel is
  * bit-identical to the interpreted `transform`/`aggregate` spelling
  * it replaces — same double arithmetic, same left-to-right
  * accumulation, same null propagation (a null element maps to a
  * null element for maps; poisons the whole output for the
  * statistics-dependent norm/softmax kernels, exactly as the
  * aggregate-then-transform HOF graph does; a null or empty array in
  * yields null/empty out). One deliberate standardization: relu's old
  * `greatest(x, 0.0)` spelling coerced a null ELEMENT to 0.0
  * (greatest skips nulls); the kernel family propagates element
  * nulls uniformly across all five activations.
  *
  * The array-producing kernels generate a call to a compiled Scala
  * loop over primitive arrays (the StaticInvoke pattern) — one
  * invocation per row inside the WholeStageCodegen span, no
  * per-element lambda interpretation. The scalar fold (VecAggExpr)
  * inlines the loop in generated Java like VecDotExpr.
  */
private[expressions] trait VecArrayInput { self: UnaryExpression =>

  protected lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected lazy val elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  @inline protected final def elem(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> input, got ${other.simpleString}")
  }
}

object VecMapExpr {
  /** Kernel ids — resolved once at construction; the per-element
    * dispatch is a compiled switch, not a string match. */
  val Relu = 0; val Sigmoid = 1; val Tanh = 2; val Silu = 3; val Gelu = 4

  val byName: Map[String, Int] = Map(
    "relu" -> Relu, "sigmoid" -> Sigmoid, "tanh" -> Tanh,
    "silu" -> Silu, "gelu" -> Gelu)
}

/** Elementwise activation over array<float|double> → array<double>.
  * Null elements map to null elements (as `transform` does). */
case class VecMapExpr(child: Expression, fn: String)
    extends UnaryExpression with VecArrayInput {

  private val fnId: Int = VecMapExpr.byName.getOrElse(fn,
    throw new IllegalArgumentException(s"unknown vec map kernel: $fn"))

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elemsNullable)

  // StrictMath, not Math: Spark's Exp/Tanh expressions evaluate via
  // StrictMath for platform-independent results — Math.exp's platform
  // intrinsic drifts by 1 ulp, which a bit-parity swap cannot afford
  @inline private def kern(x: Double): Double = fnId match {
    case VecMapExpr.Relu => if (java.lang.Double.compare(x, 0.0) > 0) x else 0.0
    case VecMapExpr.Sigmoid => 1.0 / (1.0 + StrictMath.exp(-x))
    case VecMapExpr.Tanh => StrictMath.tanh(x)
    case VecMapExpr.Silu => x / (1.0 + StrictMath.exp(-x))
    case VecMapExpr.Gelu =>
      0.5 * x * (1.0 + StrictMath.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
  }

  /** Compiled per-row loop, invoked from generated code. */
  def applyVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (!elemsNullable) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = kern(elem(a, i)); i += 1 }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (a.isNullAt(i)) null else kern(elem(a, i))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def nullSafeEval(v: Any): Any = applyVec(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecMap", this, classOf[VecMapExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyVec($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecMapExpr =
    copy(child = newChild)

  override def prettyName: String = s"vec_$fn"
}

/** LayerNorm `(x−μ)/√(σ²+ε)` (population variance, no affine) and
  * RMSNorm `x·rsqrt(mean(x²)+ε)` over array<float|double> →
  * array<double>. Statistics accumulate left to right in double,
  * exactly as the two-aggregate HOF spelling; any null element poisons
  * every output element (the HOF's null statistic does the same). */
case class VecNormExpr(child: Expression, mode: String, eps: Double)
    extends UnaryExpression with VecArrayInput {

  require(mode == "layer" || mode == "rms", s"unknown norm mode: $mode")
  private val isLayer = mode == "layer"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elemsNullable)

  def applyVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (elemsNullable) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return new GenericArrayData(new Array[Any](n))
        i += 1
      }
    }
    // one pass for both moments: the accumulators are independent, so
    // the arithmetic is identical to the HOF's two separate folds
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      val x = elem(a, i)
      if (isLayer) s1 += x
      s2 += x * x
      i += 1
    }
    val nd = n.toDouble
    val out = new Array[Double](n)
    if (isLayer) {
      val mu = s1 / nd
      val denom = math.sqrt(s2 / nd - mu * mu + eps)
      i = 0
      while (i < n) { out(i) = (elem(a, i) - mu) / denom; i += 1 }
    } else {
      val denom = math.sqrt(s2 / nd + eps)
      i = 0
      while (i < n) { out(i) = elem(a, i) / denom; i += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = applyVec(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecNorm", this, classOf[VecNormExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyVec($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormExpr =
    copy(child = newChild)

  override def prettyName: String = s"vec_${mode}_norm"
}

/** Numerically-stable softmax: exp(x−max)/Σexp(x−max). Max uses
  * Spark's total ordering (NaN greatest), matching `array_max`; sums
  * run left to right; a null element poisons all outputs. */
case class VecSoftmaxExpr(child: Expression)
    extends UnaryExpression with VecArrayInput {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = elemsNullable)

  def applyVec(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(new Array[Double](0))
    if (elemsNullable) {
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return new GenericArrayData(new Array[Any](n))
        i += 1
      }
    }
    var mx = elem(a, 0)
    var i = 1
    while (i < n) {
      val x = elem(a, i)
      if (java.lang.Double.compare(x, mx) > 0) mx = x
      i += 1
    }
    val ex = new Array[Double](n)
    var sm = 0.0
    i = 0
    while (i < n) { val e = StrictMath.exp(elem(a, i) - mx); ex(i) = e; sm += e; i += 1 }
    i = 0
    while (i < n) { ex(i) = ex(i) / sm; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(ex)
  }

  override def nullSafeEval(v: Any): Any = applyVec(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vecSoftmax", this, classOf[VecSoftmaxExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyVec($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): VecSoftmaxExpr =
    copy(child = newChild)

  override def prettyName: String = "vec_softmax"
}

/** Scalar left-to-right fold Σx (sum) or Σx² (sumsq) over
  * array<float|double> → double, inline-codegen'd like VecDotExpr.
  * NULL on a null element or null array — identical to
  * `aggregate(v, 0.0D, (s, x) -> s + x[*x])`, which VecAggRewrite
  * folds into this expression. */
case class VecAggExpr(child: Expression, mode: String)
    extends UnaryExpression with VecArrayInput {

  require(mode == "sum" || mode == "sumsq", s"unknown agg mode: $mode")
  private val square = mode == "sumsq"

  override def dataType: DataType = DoubleType

  /** Nullable regardless of child nullability: a null element
    * produces NULL even from a non-null array. */
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = elem(a, i)
      s += (if (square) x * x else x)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter =
      if (elemIsFloat) (v: String, i: String) => s"(double) $v.getFloat($i)"
      else (v: String, i: String) => s"$v.getDouble($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val nullCheck =
        if (elemsNullable) s"if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val term = if (square) s"$x * $x" else x
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  double $x = ${getter(a, i)};
         |  $s += $term;
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecAggExpr =
    copy(child = newChild)

  override def prettyName: String = s"vec_$mode"
}
