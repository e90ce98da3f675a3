package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Cascade early-exit — Spark-native analog of the reference's
  * per-layer confidence gating
  * (/root/reference/firmware/middleware/cascade_model.c:71-133:
  * run a cheap classifier after each layer, stop when softmax
  * confidence ≥ threshold; :121-133 tracks exit ratio and bytes
  * saved).
  *
  * Relationally: each "layer" is a linear scorer over the embedding;
  * a row exits at the first layer whose max-softmax confidence
  * clears the threshold. The whole cascade is one projection — the
  * expensive later layers are inside CASE branches that short-circuit
  * per row, which is exactly the reference's compute-saving
  * semantics (conditional evaluation instead of firmware loop
  * break). */
object Cascade {

  /** `layers(l)` = (weights out×in, bias). Adds `exit_layer` (1-based,
    * 0 = never confident) and `confidence`. */
  def earlyExit(input: DataFrame, vecCol: String,
                layers: Seq[(Array[Array[Double]], Array[Double])],
                threshold: Double): DataFrame = {
    val confs = layers.map { case (w, b) =>
      val outs = w.indices.map { o =>
        VectorFunctions.vecDot(col(vecCol), array(w(o).map(lit): _*)) + lit(b(o))
      }
      // max softmax probability = stable softmax of the max logit
      val logits = array(outs: _*)
      val mx = array_max(logits)
      val denom = aggregate(transform(logits, x => exp(x - mx)),
        lit(0.0), (s, x) => s + x)
      lit(1.0) / denom // exp(mx - mx) / Σ exp(l - mx)
    }
    val exitLayer = confs.zipWithIndex.reverse.foldLeft(lit(0)) {
      case (acc, (conf, i)) => when(conf >= threshold, lit(i + 1)).otherwise(acc)
    }
    val confidence = confs.zipWithIndex.reverse.foldLeft(lit(Double.NaN)) {
      case (acc, (conf, i)) => when(confs(i) >= threshold, confs(i)).otherwise(acc)
    }
    input.withColumn("exit_layer", exitLayer)
      .withColumn("confidence", confidence)
  }

  /** Exit-ratio / savings stats (ref cascade_model.c:152-187): share
    * of rows exiting per layer and the compute saved vs running all
    * layers. */
  def exitStats(scored: DataFrame, nLayers: Int): DataFrame =
    scored.groupBy(col("exit_layer"))
      .agg(count(lit(1)).as("n_rows"),
        round(avg(when(col("confidence").isNaN, 0.0).otherwise(col("confidence"))), 4).as("avg_conf"))
      .withColumn("layers_saved",
        when(col("exit_layer") === 0, 0).otherwise(lit(nLayers) - col("exit_layer")))
      .orderBy(col("exit_layer"))
}
