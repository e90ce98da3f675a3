package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Scalar (SQ8) vector quantization kernels: symmetric per-vector
  * int8 codes — the third standard quantized-ANN representation
  * beside PQ/IVF-PQ (PqExprs). SQ8 stores 1 byte per dimension
  * (4× smaller than float32), so at 100 TB the candidate scan reads
  * a quarter of the bytes; ranking uses integer dot products whose
  * per-vector scales CANCEL in the cosine, making the approximate
  * score pure integer arithmetic (exactly reproducible on any
  * partitioning — no fp-summation-order drift at all).
  *
  * Same quantization rule as the reference's symmetric int8 path
  * (/root/reference/distillation/qat_ops.py:12-23: scale=absmax/127,
  * round-half-even, clamp) — shared between the expression and the
  * driver-side probe encoder via [[Sq8Exprs.quantizeSymmetric]] so
  * corpus and probe are coded identically. */
object Sq8Exprs {

  /** scale = absmax/127; codes[i] = clamp(rint(v[i]/scale)). An
    * all-zero vector gets scale 0 and zero codes. */
  def quantizeSymmetric(v: Array[Double]): (Array[Byte], Double) = {
    var absmax = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > absmax) absmax = a; i += 1 }
    val scale = absmax / 127.0
    val codes = new Array[Byte](v.length)
    if (scale > 0.0) {
      i = 0
      while (i < v.length) {
        val q = math.rint(v(i) / scale)
        codes(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    (codes, scale)
  }
}

/** `sq8_encode(vec)` → `struct<codes: binary, scale: double>` — the
  * at-rest SQ8 representation (write `codes` instead of the float
  * array for the 4× smaller index; `scale` dequantizes). */
case class Sq8EncodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("scale", DoubleType, nullable = false)))

  override def nullable: Boolean = true // null element → null row

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode expects array<float|double>, got ${other.simpleString}")
  }

  @transient private lazy val elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def encode(arr: ArrayData): Any = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      v(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val (codes, scale) = Sq8Exprs.quantizeSymmetric(v)
    new GenericInternalRow(Array[Any](codes, scale))
  }

  override def nullSafeEval(a: Any): Any = encode(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Encode", this, classOf[Sq8EncodeExpr].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, a => s"""
      Object $tmp = $ref.encode($a);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $tmp; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8EncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "sq8_encode"
}

/** `sq8_cosine(codes)` against a LITERAL probe code vector: approximate
  * cosine `dotInt / (√Σa²·√Σb²)` over the int8 codes. The per-vector
  * scales cancel, so the score is a ratio of exact integers — fully
  * partitioning-deterministic. Probe codes ship with the plan
  * (bounded artifact); content-based equality so canonicalization/CSE
  * can match identical kernels (the PqExprs discipline). */
case class Sq8CosineExpr(child: Expression, probeCodes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // dim mismatch / zero norm → null

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_cosine expects binary codes, got ${other.simpleString}")
  }

  @transient private lazy val probeSumSq: Long = {
    var s = 0L
    var i = 0
    while (i < probeCodes.length) {
      s += probeCodes(i).toLong * probeCodes(i); i += 1
    }
    s
  }

  def score(codes: Array[Byte]): Any = {
    if (codes.length != probeCodes.length) return null
    var dot = 0L
    var sumSq = 0L
    var i = 0
    while (i < codes.length) {
      val c = codes(i).toLong
      dot += c * probeCodes(i)
      sumSq += c * c
      i += 1
    }
    if (sumSq == 0L || probeSumSq == 0L) null
    else dot.toDouble / (math.sqrt(sumSq.toDouble) * math.sqrt(probeSumSq.toDouble))
  }

  override def nullSafeEval(a: Any): Any = score(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sq8Cosine", this, classOf[Sq8CosineExpr].getName)
    val tmp = ctx.freshName("tmp")
    nullSafeCodeGen(ctx, ev, a => s"""
      Object $tmp = $ref.score($a);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((Double) $tmp).doubleValue(); }""")
  }

  override def equals(other: Any): Boolean = other match {
    case that: Sq8CosineExpr =>
      child == that.child && java.util.Arrays.equals(probeCodes, that.probeCodes)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(probeCodes)))

  override protected def withNewChildInternal(newChild: Expression): Sq8CosineExpr =
    copy(child = newChild)

  override def prettyName: String = "sq8_cosine"
}
