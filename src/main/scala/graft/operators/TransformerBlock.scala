package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Full transformer encoder block — the end-to-end composition of the
  * reference's BertTiny graph
  * (/root/reference/model_zoo/export_bert_tiny.py:33-65):
  *
  *   h  = LayerNorm₁(x)
  *   a  = OutProj( SDPA( Qproj(h), Kproj(h), Vproj(h) ) )
  *   h₂ = LayerNorm₂(h + a)
  *   out = h₂ + GELU( FC(h₂) )
  *
  * Every stage is an existing engine operator: the projections are
  * broadcast-weight FC layers (MatMul.fcLayer — zero shuffle), the
  * attention is Attention.scaledDotProduct (shuffles on seq only),
  * norms/activation/residuals are codegen'd vector expressions. The
  * whole block is therefore TWO shuffles end-to-end (attention score
  * join + output regroup) regardless of corpus size — sequences
  * distribute; weights broadcast as literals.
  *
  * The reference exports attention WITHOUT the multi-head
  * reshape/transpose ("Simplified for export", export_bert_tiny.py:
  * 21-24) — full-width q/k/v with 1/√d scaling — which is exactly
  * the shape composed here. */
object TransformerBlock {

  /** One BertTiny-style encoder block over a token table
    * `(seqCol, posCol, xCol: array<double>)`. Weight matrices are
    * row-major (out × in) literal arrays (the reference's ≤512 KB
    * weight budget, DATASHEET §6). Returns `(seqCol, posCol, out)`.
    *
    * `causal = true` gives the decoder (tinyllama-flavored) mask. */
  def bertTinyBlock(tokens: DataFrame, seqCol: String, posCol: String,
                    xCol: String,
                    wq: Array[Array[Double]], bq: Array[Double],
                    wk: Array[Array[Double]], bk: Array[Double],
                    wv: Array[Array[Double]], bv: Array[Double],
                    wo: Array[Array[Double]], bo: Array[Double],
                    wf: Array[Array[Double]], bf: Array[Double],
                    causal: Boolean = false): DataFrame = {
    def fc(in: DataFrame, c: String, w: Array[Array[Double]], b: Array[Double],
           out: String): DataFrame =
      MatMul.fcLayer(in, c, w, b, relu = false).withColumnRenamed("fc_out", out)

    // h = LN1(x); q/k/v projections of h (the chunked qkv_proj)
    val normed = tokens.select(col(seqCol).as("seq"), col(posCol).as("pos"),
      vecLayerNorm(col(xCol)).as("h"))
    val projected =
      fc(fc(fc(normed, "h", wq, bq, "q"), "h", wk, bk, "k"), "h", wv, bv, "v")
        .localCheckpoint(eager = false) // attention consumes q/k/v twice (score + value sides)

    // a = OutProj(SDPA(q, k, v)); residual over h needs h joined back
    val attn = Attention.scaledDotProduct(projected, "seq", "pos", "q", "k", "v", causal)
    val withH = attn.join(projected.select(col("seq"), col("pos"), col("h")),
      Seq("seq", "pos"))
    val post = fc(withH, "attn", wo, bo, "proj")
      .select(col("seq"), col("pos"),
        vecLayerNorm(vecAdd(col("h"), col("proj"))).as("h2"))

    // FFN + residual
    fc(post, "h2", wf, bf, "ff")
      .select(col("seq").as(seqCol), col("pos").as(posCol),
        vecAdd(col("h2"), vecGelu(col("ff"))).as("out"))
  }
}
