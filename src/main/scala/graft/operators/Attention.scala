package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.vecDot

/** Relational scaled-dot-product attention — the Spark-native
  * composition of the reference's attention graph pattern
  * MatMul → Div(√d) → Softmax → MatMul
  * (/root/reference/model_zoo/export_bert_tiny.py:7-30;
  *  causal variant /root/reference/model_zoo/export_tinyllama.py:29-56).
  *
  * Input is a token table `(seq, pos, q, k, v)` with
  * `array<float|double>` projections; output is `(seq, pos, attn)`
  * where `attn = softmax(q·Kᵀ/√d [+ causal mask]) · V` per sequence.
  *
  * Scale shape (100 TB): the score join shuffles on `seq` only —
  * per-sequence work is O(T²·d) exactly like the dense operator, but
  * sequences distribute across the cluster and no driver state
  * exists. The softmax is a windowed max/sum over (seq, i) — one
  * partition-local sort per sequence — and the output weighted sum
  * re-aggregates on (seq, i, dim), never materializing a whole
  * sequence's V in one task. */
object Attention {

  /** Causal or full scaled-dot-product attention. By default the
    * 1/√d scale derives per row from `size(k)` — no driver fetch (the
    * old head() threw on an empty table and silently mis-scaled
    * heterogeneous dims by assuming the first row's d everywhere).
    * `scaleDim > 0` pins the scale to 1/√scaleDim instead — the
    * convention of multi-head exports that compute full-width q·kᵀ
    * but divide by √head_dim (export_bert_tiny.py:26).
    * Mismatched q/k dims in a pair yield a NULL dot (VecDotExpr
    * contract) rather than a silent truncation. */
  def scaledDotProduct(tokens: DataFrame, seqCol: String, posCol: String,
                       qCol: String, kCol: String, vCol: String,
                       causal: Boolean = false, scaleDim: Int = 0): DataFrame = {
    val qs = tokens.select(col(seqCol).as("seq"), col(posCol).as("i"),
      col(qCol).as("qv"))
    val ks = tokens.select(col(seqCol).as("seq"), col(posCol).as("j"),
      col(kCol).as("kv"), col(vCol).as("vv"))

    val joined = qs.join(ks, Seq("seq"))
    val masked = if (causal) joined.filter(col("j") <= col("i")) else joined

    // numerically-stable softmax over j per (seq, i): one shuffle on
    // (seq, i); max and sum share the window partitioning
    val w = Window.partitionBy(col("seq"), col("i"))
    val scale =
      if (scaleDim > 0) lit(math.sqrt(scaleDim.toDouble))
      else sqrt(size(col("kv")).cast("double"))
    val scored = masked
      .withColumn("raw", vecDot(col("qv"), col("kv")) / scale)
      .withColumn("ex", exp(col("raw") - max(col("raw")).over(w)))
      .withColumn("wgt", col("ex") / sum(col("ex")).over(w))

    // attn_i = Σ_j wgt_ij · v_j, elementwise: explode the value
    // vectors to (dim, x) rows, aggregate the weighted sum per
    // (seq, i, dim), reassemble deterministically by dim order
    scored
      .select(col("seq"), col("i"), col("wgt"),
        posexplode(col("vv")).as(Seq("dim", "x")))
      .groupBy(col("seq"), col("i"), col("dim"))
      .agg(sum(col("wgt") * col("x").cast("double")).as("o"))
      .groupBy(col("seq"), col("i"))
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("o")))),
        s => s.getField("o")).as("attn"))
      .withColumnRenamed("i", "pos")
      .withColumnRenamed("seq", seqCol)
  }
}
