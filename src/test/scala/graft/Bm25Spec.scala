package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bm25

/** BM25: golden values on a hand-computable corpus + the measured
  * entry's shape. */
class Bm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join spark shuffle"),        // dl 4, spark×2 join×1
    (2L, "join join join filter"),           // dl 4, join×3 filter×1
    (3L, "window sort order by window"),     // dl 5, window×2
    (4L, "completely unrelated words here")) // dl 4, no hits
    .toDF("doc_id", "text")
  private val terms = Seq("spark", "join", "filter", "window")

  /** Plain-Scala BM25 with the same conventions. */
  private def golden(k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val docs = Seq(
      1L -> "spark join spark shuffle",
      2L -> "join join join filter",
      3L -> "window sort order by window",
      4L -> "completely unrelated words here")
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    val idf = terms.map { t =>
      val df = toks.count(_._2.contains(t))
      t -> math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    }.toMap
    toks.map { case (id, tk) =>
      val dl = tk.size.toDouble
      val s = terms.map { t =>
        val f = tk.count(_ == t).toDouble
        idf(t) * (f * (k1 + 1)) / (f + k1 * (1 - b + b * dl / avgdl))
      }.sum
      id -> math.rint(s * 1e6) / 1e6
    }.toMap
  }

  test("stats: df, N, avgdl from one aggregate pass") {
    val s = Bm25.stats(corpus, "text", terms)
    assert(s.nDocs == 4L)
    assert(s.avgdl == (4 + 4 + 5 + 4) / 4.0)
    assert(s.df.toSeq == Seq(1L, 2L, 1L, 1L)) // spark, join, filter, window
  }

  test("topK matches hand-computed scores, zero-hit docs excluded") {
    val s = Bm25.stats(corpus, "text", terms)
    val got = Bm25.topK(corpus, "doc_id", "text", terms, s, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = golden().filter(_._2 > 0)
    assert(got.keySet == exp.keySet) // doc 4 filtered out
    exp.foreach { case (id, v) =>
      assert(math.abs(got(id) - v) < 1e-9, s"doc $id: ${got(id)} != $v")
    }
    // TF saturation: doc 2's join×3 saturates at k1=1.2, and doc 1's
    // spark (df=1) out-idfs join (df=2) — doc 1 must outrank doc 2
    assert(got(1L) > got(2L))
  }

  test("term matching is lowercased and order-stable under duplicates") {
    val df = Seq((1L, "SPARK Spark sPark other")).toDF("doc_id", "text")
    val s = Bm25.stats(df, "text", Seq("spark", "spark")) // dup term
    assert(s.df.toSeq == Seq(1L, 0L)) // dup index never matches (first wins)
    assert(s.nDocs == 1L)
  }

  test("eng_bm25_topk: deterministic non-empty top-k on the corpus") {
    val rows = EngineOps.queries("eng_bm25_topk")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty && rows.length <= 15)
    val scores = rows.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "not score-descending")
  }
}
