package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed vector/tensor function library over `array<float>` /
  * `array<double>` columns — the Spark-native heirs of the
  * reference's linear-algebra operators
  * (/root/reference/simulator/sim_reflex.py:43-91 GEMV,
  *  /root/reference/imc22_sdk/imc22_cim.c:87-142 MatMul,
  *  /root/reference/mlir_compiler/quantization.py:18-57 quantize).
  *
  * Everything is a composition of Catalyst higher-order functions
  * (`transform` / `zip_with` / `aggregate` / `filter`), so the whole
  * pipeline stays inside codegen'd expressions — no Scala UDF, no
  * per-row JVM boxing beyond the array itself, and fully
  * distribution-transparent (columns scale horizontally with the
  * partitioning; no driver involvement).
  */
object VectorFunctions {

  private val D0: Column = lit(0.0).cast("double")

  /** Elementwise cast to double — fp32 arrays accumulate in fp64,
    * mirroring the reference's int8-weights/fp32-accumulator
    * discipline (DATASHEET §4) one level up. */
  def vecToDouble(v: Column): Column =
    transform(v, x => x.cast("double"))

  /** Dot product — native codegen expression (VecDotExpr, ~23× the
    * HOF fold on a 4M×64-dim microbench, bit-identical sequential
    * accumulation). Requires array<float|double> inputs. */
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.VecDotExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(a),
        org.apache.spark.sql.graftshim.ColumnBridge.expr(b)))

  /** Reference HOF spelling of the dot product (kept for
    * cross-checking the codegen path; same left-to-right fold). */
  def vecDotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      D0, (s, v) => s + v)

  def vecL2(v: Column): Column = sqrt(vecDot(v, v))

  def vecSum(v: Column): Column =
    aggregate(vecToDouble(v), D0, (s, x) => s + x)

  def vecMean(v: Column): Column = vecSum(v) / size(v).cast("double")

  def vecAbsMax(v: Column): Column =
    aggregate(transform(v, x => abs(x.cast("double"))), D0, (s, x) => greatest(s, x))

  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecL2(a) * vecL2(b))

  def vecScale(v: Column, k: Column): Column =
    transform(v, x => x.cast("double") * k)

  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  /** ReLU (ref /root/reference/imc22_sdk/imc22_cim.c:274-280). */
  def vecRelu(v: Column): Column =
    transform(v, x => greatest(x.cast("double"), lit(0.0)))

  /** Numerically-stable softmax over an array (ref
    * /root/reference/firmware/middleware/cascade_model.c:203-229). */
  def vecSoftmax(v: Column): Column = {
    val d = vecToDouble(v)
    val mx = array_max(d)
    val ex = transform(d, x => exp(x - mx))
    val sm = aggregate(ex, D0, (s, x) => s + x)
    transform(ex, x => x / sm)
  }

  /** Symmetric int8 quantization scale (absmax/127, guarded). */
  def quantScale(v: Column): Column =
    greatest(vecAbsMax(v), lit(1e-12)) / lit(127.0)

  /** Symmetric int8 quantize: round(x/scale) clipped to [-127, 127]
    * (ref /root/reference/tools/quantizer.py:24-38, zp=0 variant
    * /root/reference/simulator/codegen_cim.py:460-464). */
  def quantizeInt8(v: Column): Column = {
    val s = quantScale(v)
    transform(v, x =>
      greatest(lit(-127), least(lit(127), round(x.cast("double") / s).cast("int"))))
  }

  /** Dequantize `(q - zp) * scale` with zp=0
    * (ref /root/reference/mlir_compiler/quantization.py:54-57). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Fraction of near-zero elements (ref sparsity analysis,
    * /root/reference/mlir_compiler/sparsity_optimizer.py:66-112). */
  def vecSparsity(v: Column, threshold: Double = 0.01): Column =
    size(filter(v, x => abs(x.cast("double")) < lit(threshold))).cast("double") /
      size(v).cast("double")

  /** Reference mode recommendation thresholds (>0.7 csr, >0.3 sparse;
    * /root/reference/mlir_compiler/sparsity_optimizer.py:89-95). */
  def sparsityMode(frac: Column): Column =
    when(frac > 0.7, "csr").when(frac > 0.3, "sparse").otherwise("dense")
}
