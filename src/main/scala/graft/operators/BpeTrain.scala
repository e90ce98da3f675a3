package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding vocabulary TRAINING (Sennrich et al. 2016 — the
  * public algorithm; the apply side is expressions/BpeEncodeExpr).
  * WordPiece APPLY already ships (`eng_wordpiece`); this is the
  * missing train half of the tokenizer pipeline.
  *
  * Scale shape (the Sennrich insight, which is also the 100 TB
  * design): BPE training never iterates the corpus — it iterates the
  * WORD-FREQUENCY table. One distributed `explode → groupBy(word)`
  * aggregate (map-side partials, one shuffle) collapses the corpus to
  * that table; a deterministic frequency cap (`maxWords`, ties broken
  * by word) bounds it to a driver-sized artifact — the same
  * collect-bounded-model discipline as LmScore/KMeans — and the merge
  * loop runs on it with an incremental pair index (each merge touches
  * only the words containing the merged pair, never a full recount).
  * Application back over the corpus is the distinct-word join in
  * `subwordStats`: the learned kernel encodes each DISTINCT word once
  * (|vocab| invocations, not |corpus|), and docs join that tiny frame
  * broadcast.
  *
  * Reference analog: codebook/dictionary construction for the
  * compression path (compression.c:145-204, §2.3); merges here play
  * the role of the learned dictionary.
  */
object BpeTrain {

  /** End-of-word marker symbol (separate trailing symbol, so merges
    * can learn word-final units like `ing</w>`). */
  val Eow = "</w>"

  /** Learned model: merge pairs in rank order (rank = iteration the
    * pair was merged; lower rank = more frequent = applied first). */
  final case class Model(merges: Seq[(String, String)]) {
    def ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** ONE distributed aggregate: corpus → (word, cnt). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Driver-side merge loop over the bounded word-frequency artifact.
    * Deterministic: argmax by (count desc, pair lexicographic asc) —
    * independent of map iteration order and input order. */
  def train(wordFreq: Seq[(String, Long)], nMerges: Int): Model = {
    val words: Array[mutable.ArrayBuffer[String]] = wordFreq.map { case (w, _) =>
      val b = new mutable.ArrayBuffer[String](w.length + 1)
      w.foreach(c => b += c.toString)
      b += Eow
      b
    }.toArray
    val freqs: Array[Long] = wordFreq.map(_._2).toArray

    val pairCounts = mutable.Map.empty[(String, String), Long]
    // word indices that contained the pair when last indexed; entries
    // can go stale (pair merged away inside the word by a LATER merge
    // of a different pair is impossible, but a word listed under two
    // pairs loses one when the other merges first) — stale indices
    // are filtered at use by re-checking adjacency
    val pairWords = mutable.Map.empty[(String, String), mutable.Set[Int]]

    def contribute(i: Int, sign: Long): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCounts.getOrElse(p, 0L) + sign * freqs(i)
        if (c <= 0L) pairCounts.remove(p) else pairCounts(p) = c
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    words.indices.foreach(contribute(_, +1L))

    /** Merge all left-to-right occurrences of `p` inside word `i`. */
    def mergeInWord(i: Int, p: (String, String)): Unit = {
      val s = words(i)
      var j = 0
      while (j < s.length - 1) {
        if (s(j) == p._1 && s(j + 1) == p._2) { s(j) = p._1 + p._2; s.remove(j + 1) }
        j += 1
      }
    }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    while (step < nMerges && pairCounts.nonEmpty) {
      // deterministic argmax: highest count, then smallest pair
      var best: (String, String) = null
      var bestCnt = Long.MinValue
      pairCounts.foreach { case (p, c) =>
        if (c > bestCnt || (c == bestCnt &&
            (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestCnt = c
        }
      }
      merges += best
      val affected = pairWords.remove(best).getOrElse(mutable.Set.empty)
      affected.toArray.sorted.foreach { i =>
        val s = words(i)
        var has = false
        var j = 0
        while (!has && j < s.length - 1) {
          has = s(j) == best._1 && s(j + 1) == best._2; j += 1
        }
        if (has) { // re-check: index entries can be stale
          contribute(i, -1L)
          mergeInWord(i, best)
          contribute(i, +1L)
        }
      }
      pairCounts.remove(best) // fully merged; merging can never recreate it
      step += 1
    }
    Model(merges.toSeq)
  }

  /** Aggregate + deterministic cap + collect (bounded driver artifact:
    * ≤ maxWords (word, cnt) rows — the LmScore/KMeans discipline) +
    * driver merge loop. */
  def fit(docs: DataFrame, textCol: String = "text", nMerges: Int = 200,
          minFreq: Long = 1L, maxWords: Int = 50000): Model = {
    val wf = wordCounts(docs, textCol)
      .filter(col("cnt") >= minFreq)
      .orderBy(col("cnt").desc, col("word"))
      .limit(maxWords) // deterministic cap: cnt desc, word asc
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    train(wf, nMerges)
  }

  /** Greedy rank-ordered merge application to one word (chars + `</w>`
    * start state; repeatedly merge the lowest-rank adjacent pair). */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    val jm = new java.util.HashMap[(String, String), Integer](ranks.size * 2)
    ranks.foreach { case (p, r) => jm.put(p, r) }
    encodeWordRanked(word, jm)
  }

  /** Hot-path variant used by BpeEncodeExpr (shared java.util map,
    * no per-call index rebuild). */
  def encodeWordRanked(word: String,
      ranks: java.util.HashMap[(String, String), Integer]): Array[String] = {
    val syms = new mutable.ArrayBuffer[String](word.length + 1)
    word.foreach(c => syms += c.toString)
    syms += Eow
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var i = 0
      var bestIdx = -1
      while (i < syms.length - 1) {
        val r = ranks.get((syms(i), syms(i + 1)))
        if (r != null && r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val a = syms(bestIdx)
        val b = syms(bestIdx + 1)
        var j = 0
        while (j < syms.length - 1) {
          if (syms(j) == a && syms(j + 1) == b) { syms(j) = a + b; syms.remove(j + 1) }
          j += 1
        }
      }
    }
    syms.toArray
  }

  /** Column form of the learned encoder (compiled kernel, merge table
    * shipped as a plan literal). */
  def bpeEncode(text: Column, model: Model): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.BpeEncodeExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text), model.merges))

  /** Per-source subword statistics after applying the learned merges —
    * the distinct-word join design: the kernel runs once per DISTINCT
    * word (|vocab| invocations), docs join that tiny frame broadcast;
    * the corpus itself is touched by exactly one explode + one join +
    * one grouped aggregate. */
  def subwordStats(docs: DataFrame, model: Model,
                   textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
      explode(split(col(textCol), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val wordSub = toks.select("word").distinct()
      .withColumn("n_sub", size(bpeEncode(col("word"), model)))
    toks.join(broadcast(wordSub), Seq("word"))
      .groupBy("source")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        round(sum(col("n_sub")).cast("double") / count(lit(1)), 4)
          .as("subwords_per_word"))
  }
}
