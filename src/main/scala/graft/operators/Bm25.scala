package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval (Robertson/Sparck Jones; the sparse
  * counterpart of the dense ANN path in SimilaritySearch): score every
  * document against a literal query, return the top k.
  *
  * Scale shape:
  *  - CORPUS STATS (index build): document frequency per query term +
  *    average document length, ONE aggregate pass over the corpus
  *    (term presence via the compiled term-counts kernel) returning a
  *    |terms|-sized row to the driver — cacheable per (session,
  *    corpus) exactly like the IVF codebook / trigram LM.
  *  - SCORING: a shuffle-free compiled projection
  *    (expressions.TermCountsExpr) + TakeOrderedAndProject for the
  *    top-k — never a global sort, never an exploded-token shuffle.
  *
  * Reference analog: the confidence-ranked cascade/argmax reporting of
  * /root/reference/firmware/middleware/cascade_model.c:71-133 — score
  * per item, keep the best; here over a text corpus. */
object Bm25 {

  case class Stats(df: Array[Long], nDocs: Long, avgdl: Double)

  private def termCounts(text: Column, terms: Seq[String]): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.TermCountsExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text), terms))

  /** One-pass corpus statistics for the query terms. The kernel
    * output is bound to a real column first so the |terms|+1
    * aggregates share one evaluation per row. */
  def stats(docs: DataFrame, textCol: String, terms: Seq[String]): Stats = {
    val bound = docs.select(termCounts(col(textCol), terms).as("tc"))
    val aggs =
      count(lit(1)).as("n") +:
      avg(col("tc.n_tokens")).as("avgdl") +:
      terms.indices.map(i =>
        sum(when(element_at(col("tc.counts"), i + 1) > 0, 1L).otherwise(0L))
          .as(s"df_$i"))
    val r = bound.agg(aggs.head, aggs.tail: _*).head()
    Stats(terms.indices.map(i => r.getAs[Long](s"df_$i")).toArray,
      r.getAs[Long]("n"), r.getAs[Double]("avgdl"))
  }

  /** Okapi BM25 idf: ln((N − df + 0.5)/(df + 0.5) + 1) — always
    * positive, the Lucene convention. */
  def idf(s: Stats): Array[Double] =
    s.df.map(d => math.log((s.nDocs - d + 0.5) / (d + 0.5) + 1.0))

  /** Top-k documents by BM25 score for a literal query. Ties broken
    * by id for determinism; docs matching no term score 0 and are
    * filtered out. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], s: Stats, k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val w = idf(s)
    // bind the kernel output so the per-term scores share one pass
    val bound = docs.select(col(idCol).as("id"),
      termCounts(col(textCol), terms).as("tc"))
    val dl = col("tc.n_tokens").cast("double")
    val norm = lit(k1) * (lit(1 - b) + lit(b) * dl / lit(s.avgdl))
    val score = terms.indices.map { i =>
      val f = element_at(col("tc.counts"), i + 1).cast("double")
      lit(w(i)) * (f * lit(k1 + 1.0)) / (f + norm)
    }.reduce(_ + _)
    bound.select(col("id"), score.as("bm25"))
      .filter(col("bm25") > 0.0)
      .withColumn("bm25", round(col("bm25"), 6))
      .orderBy(col("bm25").desc_nulls_last, col("id").asc)
      .limit(k)
  }
}
