package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-trigram language-model quality scoring — the simplified
  * CCNet-style perplexity filter every large-corpus pipeline runs
  * (score each document under its language's n-gram model; drop the
  * worst). Reference analog: the cascade confidence gate
  * (/root/reference/firmware/middleware/cascade_model.c:71-133 keeps
  * or drops work by a model score threshold).
  *
  * Everything is joins and aggregates — no UDF, no driver-side
  * scoring loop:
  *  - MODEL BUILD: explode char trigrams → one (lang, tri) count
  *    aggregate → per-lang Laplace-smoothed log-probabilities, kept
  *    to the top `vocabPerLang` trigrams (window-group limit). The
  *    model is a few-thousand-row frame per language.
  *  - SCORING: explode the scored corpus the same way and
  *    broadcast-join the model on (lang, tri); out-of-vocabulary
  *    trigrams get the smoothing floor. Per-doc score = mean log-prob.
  * At 100 TB the model side stays KB–MB (vocab-bounded) and
  * broadcasts; the corpus side is one explode + one aggregate —
  * the same shuffle shape as ql12's vocabulary extraction. */
object LmScore {

  /** Char trigrams of lowercased text as (pos 1..len-2). */
  private def triGrams(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_t", lower(col(textCol)))
      .where(length(col("_t")) >= 3)
      .select(df.columns.map(col) :+
        explode(expr("transform(sequence(1, length(_t) - 2), i -> substring(_t, i, 3))"))
          .as("tri"): _*)

  /** Laplace-smoothed per-language trigram log-prob model, top
    * `vocabPerLang` trigrams by count per language. Columns:
    * (lang, tri, logp); the smoothing floor for OOV trigrams is
    * log(1 / (total + vocab)). */
  def trigramModel(docs: DataFrame, vocabPerLang: Int = 4096): DataFrame = {
    val counts = triGrams(docs, "text")
      .groupBy(col("lang"), col("tri"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("lang"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("vocab"))
    counts.join(broadcast(totals), Seq("lang"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang")).orderBy(col("c").desc, col("tri"))))
      .where(col("rn") <= vocabPerLang)
      .select(col("lang"), col("tri"),
        log((col("c") + lit(1.0)) / (col("total") + col("vocab"))).as("logp"),
        log(lit(1.0) / (col("total") + col("vocab"))).as("floor"))
  }

  /** Mean trigram log-prob per document under the doc's own language
    * model (higher = more in-language). OOV trigrams score the
    * model's smoothing floor. Output: (idCols..., lang, lm_score).
    *
    * This is the RELATIONAL spelling — explode + broadcast join + a
    * corpus-sized re-aggregation by doc id — kept as the parity
    * reference for the kernel below (LmScoreSpec asserts equality).
    * Production scoring is `scoreDocsCompiled`. */
  def scoreDocs(docs: DataFrame, model: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val floors = model.groupBy(col("lang")).agg(min(col("floor")).as("lang_floor"))
    triGrams(docs.select(col(idCol), col("lang"), col("text")), "text")
      .join(broadcast(model.select(col("lang"), col("tri"), col("logp"))),
        Seq("lang", "tri"), "left")
      .join(broadcast(floors), Seq("lang"))
      .groupBy(col(idCol), col("lang"))
      .agg(avg(coalesce(col("logp"), col("lang_floor"))).as("lm_score"))
  }

  /** Collect a (vocab-bounded) model frame into the per-language
    * lookup tables the compiled scorer carries. An index-build step:
    * langs × vocabPerLang rows — KB–MB at any corpus scale. */
  def collectModel(model: DataFrame): Map[String, graft.expressions.TrigramModel] =
    model.select(col("lang"), col("tri"), col("logp"), col("floor"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (lang, rows) =>
        val m = new java.util.HashMap[String, java.lang.Double](rows.length * 2)
        rows.foreach(r => m.put(r.getString(1), Double.box(r.getDouble(2))))
        lang -> graft.expressions.TrigramModel(m, rows.head.getDouble(3))
      }

  /** Kernel scoring pass: one compiled projection over the corpus —
    * no explode, no scoring shuffle (graft.expressions.LmScoreExpr).
    * Same output contract as `scoreDocs`; docs shorter than 3 chars
    * or with no model for their language are dropped (null score). */
  def scoreDocsCompiled(docs: DataFrame,
                        models: Map[String, graft.expressions.TrigramModel],
                        idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.graftshim.ColumnBridge.{column, expr => toExpr}
    docs.select(col(idCol), col("lang"),
        column(graft.expressions.LmScoreExpr(
          toExpr(col("lang")), toExpr(col("text")), models)).as("lm_score"))
      .where(col("lm_score").isNotNull)
  }

  /** The filter report a pipeline run reads: per-lang doc count, mean
    * score, and how many docs fall below `keepThreshold` (the drop
    * set of the quality gate). */
  def filterReport(docs: DataFrame, keepThreshold: Column): DataFrame =
    scoredReport(scoreDocsCompiled(docs, collectModel(trigramModel(docs))), keepThreshold)

  /** Report half of `filterReport`, for callers holding a pre-trained
    * (cached) model. */
  def scoredReport(scored: DataFrame, keepThreshold: Column): DataFrame =
    scored.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("lm_score")), 4).as("mean_score"),
        count(when(col("lm_score") < keepThreshold, 1)).as("n_below"))
      .orderBy(col("lang"))
}
