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

  import org.apache.spark.sql.graftshim.ColumnBridge.{column => exprCol, expr => colExpr}

  /** Hot elementwise kernels are codegen'd expressions
    * (graft.expressions.VecElemExprs), not interpreted HOF lambdas —
    * bit-identical arithmetic and null behavior (VecElemExprsSpec). */
  private def mapExpr(v: Column, fn: String): Column =
    exprCol(graft.expressions.VecMapExpr(colExpr(v), fn))

  /** Let-binding for HOF expressions: Catalyst has no `let`, so a
    * per-row statistic (mean, absmax, scale…) inlined into a
    * per-element lambda re-evaluates its whole subtree for EVERY
    * element — O(d²) per row, and HOFs run interpreted. Binding the
    * statistic through a single-element `transform` evaluates it once
    * per row and exposes it to the body as a lambda variable (an O(1)
    * read). Purely structural: arithmetic and results are unchanged. */
  private def letBind(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), b => body(b)), 1)

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
    exprCol(graft.expressions.VecAggExpr(colExpr(v), "sum"))

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
  def vecRelu(v: Column): Column = mapExpr(v, "relu")

  /** Numerically-stable softmax over an array (ref
    * /root/reference/firmware/middleware/cascade_model.c:203-229). */
  def vecSoftmax(v: Column): Column =
    exprCol(graft.expressions.VecSoftmaxExpr(colExpr(v)))

  /** Elementwise sigmoid 1/(1+e^-x) (ref
    * /root/reference/imc22_sdk/imc22_cim.c:282-287). */
  def vecSigmoid(v: Column): Column = mapExpr(v, "sigmoid")

  /** Elementwise tanh (ref /root/reference/imc22_sdk/imc22_cim.c:289-293). */
  def vecTanh(v: Column): Column = mapExpr(v, "tanh")

  /** SiLU / Swish: x·sigmoid(x) (ref
    * /root/reference/mlir_compiler/transformer_ops.py:45-50,128-133;
    * model_zoo/export_tinyllama.py:64 nn.SiLU). */
  def vecSilu(v: Column): Column = mapExpr(v, "silu")

  /** GELU, tanh approximation
    * 0.5·x·(1+tanh(√(2/π)·(x+0.044715·x³))) — the hardware-friendly
    * spelling the reference compiles to (CIM_Gelu_Approx,
    * /root/reference/mlir_compiler/transformer_ops.py:43-44,117-121). */
  def vecGelu(v: Column): Column = mapExpr(v, "gelu")

  /** LayerNorm (x−μ)/√(σ²+ε) with population variance, no affine
    * (ref /root/reference/mlir_compiler/transformer_ops.py:84-97,
    * 109-116; scale/bias handled downstream per the reference). */
  def vecLayerNorm(v: Column, eps: Double = 1e-5): Column =
    exprCol(graft.expressions.VecNormExpr(colExpr(v), "layer", eps))

  /** RMSNorm x·rsqrt(mean(x²)+ε), Llama style
    * (ref /root/reference/mlir_compiler/transformer_ops.py:54-67;
    * /root/reference/model_zoo/export_tinyllama.py:5-14). */
  def vecRmsNorm(v: Column, eps: Double = 1e-6): Column =
    exprCol(graft.expressions.VecNormExpr(colExpr(v), "rms", eps))

  /** Symmetric int8 quantization scale (absmax/127, guarded). */
  def quantScale(v: Column): Column =
    greatest(vecAbsMax(v), lit(1e-12)) / lit(127.0)

  /** Symmetric int8 quantize: round(x/scale) clipped to [-127, 127]
    * (ref /root/reference/tools/quantizer.py:24-38, zp=0 variant
    * /root/reference/simulator/codegen_cim.py:460-464). */
  def quantizeInt8(v: Column): Column =
    letBind(quantScale(v), s =>
      transform(v, x =>
        greatest(lit(-127), least(lit(127), round(x.cast("double") / s).cast("int")))))

  /** Dequantize `(q - zp) * scale` with zp=0
    * (ref /root/reference/mlir_compiler/quantization.py:54-57). */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Rotary position embedding (RoPE), rotate-half convention of the
    * reference's RotaryEmbedding
    * (/root/reference/model_zoo/export_tinyllama.py:16-28:
    * inv_freq_i = base^(−2i/d), emb = cat(freqs, freqs), applied as
    * x·cos + rotate_half(x)·sin with rotate_half = [−x[d/2:], x[:d/2]]):
    *   out_k       = x_k·cos(p·f_k) − x_{k+d/2}·sin(p·f_k)      k < d/2
    *   out_{k+d/2} = x_{k+d/2}·cos(p·f_k) + x_k·sin(p·f_k)
    * Pure expression — position can be a column, so a whole token
    * table rotates in one codegen'd projection. */
  def vecRope(v: Column, pos: Column, base: Double = 10000.0): Column = {
    val d = size(v)
    val half = (d / 2).cast("int")
    transform(sequence(lit(0), d - 1), k => {
      val idx = when(k < half, k).otherwise(k - half).cast("double")
      val freq = lit(1.0) / pow(lit(base), idx * lit(2.0) / d.cast("double"))
      val angle = pos.cast("double") * freq
      val xk = element_at(v, k + 1).cast("double")
      val partner = when(k < half, -element_at(v, k + half + 1).cast("double"))
        .otherwise(element_at(v, k - half + 1).cast("double"))
      xk * cos(angle) + partner * sin(angle)
    })
  }

  // --- asymmetric (min-max zero-point) quantization — the
  // reference's DEFAULT compile path
  // (/root/reference/mlir_compiler/quantization.py:18-52 int8;
  //  /root/reference/tools/quantizer.py:28-72 uint8 + int4 pack) ---

  /** Asymmetric scale (max−min)/(qmax−qmin), guarded against
    * constant vectors. */
  def quantScaleAsym(v: Column, levels: Int = 255): Column = {
    val d = vecToDouble(v)
    greatest(array_max(d) - array_min(d), lit(1e-12)) / lit(levels.toDouble)
  }

  /** Asymmetric zero point: trunc(−min/scale) toward zero, the
    * Python `int()` semantics of quantizer.py:31. Clamped to ±10⁹
    * before the ANSI int cast: a constant vector hits the 1e-12
    * scale guard and would otherwise overflow (Python's int() is
    * arbitrary-precision); real min<0<max data never reaches the
    * clamp. */
  def quantZeroPointAsym(v: Column, levels: Int = 255): Column =
    greatest(lit(-1e9), least(lit(1e9),
      -array_min(vecToDouble(v)) / quantScaleAsym(v, levels))).cast("int")

  /** Asymmetric uint8 quantize: clip(round(x/scale + zp), 0, 255)
    * (ref quantizer.py:28-38). */
  def quantizeUint8Asym(v: Column): Column =
    letBind(struct(quantScaleAsym(v, 255).as("s"),
        quantZeroPointAsym(v, 255).cast("double").as("zp")), p =>
      transform(v, x =>
        greatest(lit(0), least(lit(255),
          round(x.cast("double") / p.getField("s") + p.getField("zp")).cast("int")))))

  /** Asymmetric int4 quantize to 0..15 (ref quantizer.py:40-51). */
  def quantizeInt4Asym(v: Column): Column =
    letBind(struct(quantScaleAsym(v, 15).as("s"),
        quantZeroPointAsym(v, 15).cast("double").as("zp")), p =>
      transform(v, x =>
        greatest(lit(0), least(lit(15),
          round(x.cast("double") / p.getField("s") + p.getField("zp")).cast("int")))))

  /** Dequantize an asymmetric code: (q − zp)·scale
    * (ref quantization.py:54-57). */
  def dequantizeAsym(q: Column, scale: Column, zp: Column): Column =
    transform(q, x => (x.cast("double") - zp.cast("double")) * scale)

  /** Pack an even-length int4 array two-per-byte, high nibble first
    * (ref quantizer.py:59-72 `_pack_int4`). */
  def packInt4(q: Column): Column =
    transform(sequence(lit(1), (size(q) / 2).cast("int")), i =>
      shiftleft(element_at(q, i * 2 - 1), 4)
        .bitwiseOR(element_at(q, i * 2)))

  /** Unpack int4 bytes back to the nibble array (inverse of
    * packInt4). */
  def unpackInt4(p: Column): Column =
    flatten(transform(p, b => array(
      shiftright(b, 4).bitwiseAND(lit(0xf)), b.bitwiseAND(lit(0xf)))))

  /** Conv/FC–BatchNorm weight fold (ref op #25 — the reference
    * relies on torch.onnx constant folding,
    * /root/reference/mlir_compiler/qat_trainer.py:411, over the
    * model_zoo's Conv+BN blocks; the fold itself is the standard
    * public identity):
    *   w' = w · γ/√(σ²+ε),  b' = β − μ·γ/√(σ²+ε)
    * so bn(conv(w, x)) ≡ conv(w', x) + b'. */
  def bnFoldScale(gamma: Column, varPop: Column, eps: Double = 1e-5): Column =
    gamma.cast("double") / sqrt(varPop.cast("double") + lit(eps))

  def vecBnFoldWeights(w: Column, gamma: Column, varPop: Column,
                       eps: Double = 1e-5): Column =
    letBind(bnFoldScale(gamma, varPop, eps), k =>
      transform(w, x => x.cast("double") * k))

  def bnFoldBias(beta: Column, mu: Column, gamma: Column, varPop: Column,
                 eps: Double = 1e-5): Column =
    beta.cast("double") - mu.cast("double") * bnFoldScale(gamma, varPop, eps)

  /** Soft-target distillation loss: KL(softmax(teacher/T) ‖
    * softmax(student/T)) · T² (ref
    * /root/reference/distillation/distiller.py:17-41 — PyTorch
    * kl_div(log_softmax(student/T), softmax(teacher/T))·T²). */
  def distillSoftLoss(student: Column, teacher: Column,
                      temp: Double = 2.0): Column = {
    val sp = vecSoftmax(vecScale(student, lit(1.0 / temp)))
    val tp = vecSoftmax(vecScale(teacher, lit(1.0 / temp)))
    aggregate(zip_with(tp, sp, (t, s) => t * (log(t) - log(s))),
      D0, (acc, x) => acc + x) * lit(temp * temp)
  }

  /** Full distillation objective α·soft + (1−α)·hard where hard is
    * the cross-entropy −log softmax(student)[label]
    * (ref distiller.py:36-41). `label` is 0-based. */
  def distillLoss(student: Column, teacher: Column, label: Column,
                  temp: Double = 2.0, alpha: Double = 0.5): Column = {
    val hard = -log(element_at(vecSoftmax(student), label + 1))
    lit(alpha) * distillSoftLoss(student, teacher, temp) + lit(1 - alpha) * hard
  }

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
