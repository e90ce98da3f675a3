package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.ColumnBridge

/** SQL-surface registration of the engine's function library — the
  * analog of the reference SDK's operator registry
  * (/root/reference/imc22_sdk/python/imc22.py:133-187 exposes the
  * same ops to Python that the firmware exposes to C).
  *
  * Each function is registered as a catalyst Expression BUILDER (the
  * Column-composition expression tree, fully codegen'd) — not a
  * Scala UDF — so `SELECT vec_cosine(embedding, probe)` plans
  * identically to the Column API spelling. */
object GraftFunctions {

  private def b1(f: Column => Column): Seq[Expression] => Expression =
    exprs => ColumnBridge.expr(f(ColumnBridge.column(exprs(0))))

  private def b2(f: (Column, Column) => Column): Seq[Expression] => Expression =
    exprs => ColumnBridge.expr(
      f(ColumnBridge.column(exprs(0)), ColumnBridge.column(exprs(1))))

  /** Column-API access to the native codegen dot product. */
  def vecDotFast(a: Column, b: Column): Column =
    ColumnBridge.column(graft.expressions.VecDotExpr(
      ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** name → (builder, arity) for everything the engine exposes to SQL. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> b2(VectorFunctions.vecDot),
    "vec_dot_fast" -> (exprs => graft.expressions.VecDotExpr(exprs(0), exprs(1))),
    "vec_cosine" -> b2(VectorFunctions.vecCosine),
    "vec_l2" -> b1(VectorFunctions.vecL2),
    "vec_sum" -> b1(VectorFunctions.vecSum),
    "vec_mean" -> b1(VectorFunctions.vecMean),
    "vec_abs_max" -> b1(VectorFunctions.vecAbsMax),
    "vec_relu" -> b1(VectorFunctions.vecRelu),
    "vec_sigmoid" -> b1(VectorFunctions.vecSigmoid),
    "vec_tanh" -> b1(VectorFunctions.vecTanh),
    "vec_silu" -> b1(VectorFunctions.vecSilu),
    "vec_gelu" -> b1(VectorFunctions.vecGelu),
    "vec_layer_norm" -> b1(VectorFunctions.vecLayerNorm(_)),
    "vec_rms_norm" -> b1(VectorFunctions.vecRmsNorm(_)),
    "vec_softmax" -> b1(VectorFunctions.vecSoftmax),
    "vec_sparsity" -> b1(VectorFunctions.vecSparsity(_)),
    "quantize_int8" -> b1(VectorFunctions.quantizeInt8),
    "quant_scale" -> b1(VectorFunctions.quantScale),
    "dequantize_int8" -> b2(VectorFunctions.dequantizeInt8),
    "quant_scale_asym" -> b1(VectorFunctions.quantScaleAsym(_)),
    "quant_zero_point_asym" -> b1(VectorFunctions.quantZeroPointAsym(_)),
    "quantize_uint8_asym" -> b1(VectorFunctions.quantizeUint8Asym),
    "quantize_int4_asym" -> b1(VectorFunctions.quantizeInt4Asym),
    "pack_int4" -> b1(VectorFunctions.packInt4),
    "unpack_int4" -> b1(VectorFunctions.unpackInt4),
    "vec_rope" -> b2(VectorFunctions.vecRope(_, _)),
    "distill_soft_loss" -> b2(VectorFunctions.distillSoftLoss(_, _)),
    "token_count" -> b1(TextFunctions.tokenCount),
    "subword_count" -> b1(TextFunctions.subwordCount),
    "wordpiece_tokenize" -> b1(TextFunctions.wordpieceTokenize(_)),
    "wordpiece_count" -> b1(TextFunctions.wordpieceCount),
    "doc_fingerprint" -> b1(TextFunctions.docFingerprint),
    "repetition_stats" -> b1(TextFunctions.repetitionStats(_)),
    "sim_hash" -> b1(TextFunctions.simHash),
    "lang_id" -> b1(TextFunctions.langId),
    "quality_score" -> b1(TextFunctions.qualityScore))

  /** Registers every function as a temporary SQL function on the
    * session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    VecAggregates.register(spark)
  }
}
