package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis function library for the LLM-data-pipeline surface
  * (north-star mandate): tokenization, language ID, quality scoring,
  * fingerprinting. All pure Column expression compositions —
  * codegen-friendly, no UDFs, shuffle-free per-row work that scales
  * linearly with partitions at 100 TB. */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-ish runs + digits + punctuation
    * singles, the usual pre-tokenizer regex shape. Counted without
    * materializing the token array. The vocab-driven production
    * tokenizer is `wordpieceTokenize` below. */
  def subwordCount(text: Column): Column =
    size(split(text, "(?=\\s)|(?<=\\p{Punct})|(?=\\p{Punct})")) // split at space/punct boundaries

  /** Greedy longest-match WordPiece over a literal vocab (default:
    * full-coverage char vocab + seeded English subwords) — the real
    * token-budget op (graft.expressions.WordPieceExpr). */
  def wordpieceTokenize(text: Column,
      vocab: Seq[String] = graft.expressions.WordPieceExpr.defaultVocab): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.WordPieceExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text), vocab))

  def wordpieceCount(text: Column): Column = size(wordpieceTokenize(text))

  /** Word k-gram shingles (distinct), the near-dup unit. */
  def shingles(text: Column, k: Int): Column = {
    val w = tokens(text)
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - (k - 1), lit(1))),
      i => concat_ws(" ", slice(w, i, lit(k)))))
  }

  /** Language ID via stopword-hit scoring: tiny per-language marker
    * lexicons (public, generic function words); the language with the
    * most marker hits wins, 'und' on zero hits. An n-gram-profile
    * heuristic in the same spirit as public langid tools. */
  /** Exposed for the eng_lang_id DuckDB oracle generator — the oracle
    * is GENERATED from the same lexicon literals the Spark plan
    * ships, so they can never drift (the cascadeOracleSql pattern). */
  private[graft] def markerLexicons: Map[String, Seq[String]] = markers

  private val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "une"),
    "es" -> Seq("el", "los", "las", "es", "en", "por", "para", "una"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不", "人"))

  /** Best-scoring language code, or 'und' when no marker hits.
    * Compiled kernel (LangIdExpr: one map probe per token, inside
    * whole-stage codegen); `langIdHof` below is the interpreted HOF
    * parity reference. */
  def langId(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.LangIdExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text), markers))

  /** Reference HOF spelling of langId (parity spec): per-language
    * `size(filter(toks, isin(markers)))`, argmax via struct
    * array_max. Interpreted lambda per token per language — kept only
    * to pin the kernel's semantics. */
  def langIdHof(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = markers.keys.toSeq.sorted.map { lang =>
      struct(
        size(filter(toks, t =>
          t.isin(markers(lang).map(_.asInstanceOf[Any]): _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    // null text propagates to null (standard expression nullability,
    // matching the kernel); without the guard the null-score structs
    // would fall through to the 'und' branch
    when(text.isNotNull,
      when(best.getField("score") > 0, best.getField("lang")).otherwise("und"))
  }

  /** Quality score in [0,1]: blend of length band, alpha ratio,
    * mean-word-length band, and repetition penalty — the usual
    * heuristic pre-filters of LLM data pipelines. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val lenScore = least(n / lit(200.0), lit(1.0)) // favor >=200 chars
    val alphaRatio = (n - length(regexp_replace(text, "[A-Za-z ]", ""))) / greatest(n, lit(1.0))
    val meanWord = n / greatest(nTok, lit(1.0))
    val wordScore = lit(1.0) - least(abs(meanWord - lit(5.5)) / lit(10.0), lit(1.0))
    val distinctRatio = size(array_distinct(toks)).cast("double") / greatest(nTok, lit(1.0))
    round(least(greatest(
      lit(0.3) * lenScore + lit(0.3) * alphaRatio + lit(0.2) * wordScore + lit(0.2) * distinctRatio,
      lit(0.0)), lit(1.0)), 4)
  }

  /** 64-bit rolling fingerprint over tokens: order-sensitive chained
    * hash fp_i = h(fp_{i-1}, token_i) — a stable document identity
    * robust to whitespace normalization. (Chained xxhash64 instead of
    * a polynomial mod 2^64: Spark 4 runs ANSI mode, where wrapping
    * multiply would raise ARITHMETIC_OVERFLOW.) Compiled kernel
    * (DocFingerprintExpr); the HOF fold below is the parity
    * reference. */
  def docFingerprint(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.DocFingerprintExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text)))

  /** Reference HOF spelling of the fingerprint fold (parity spec). */
  def docFingerprintHof(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** 64-bit SimHash over token xxhash64 values: sign of per-bit
    * weight sums (Charikar '02). Codegen'd one-pass kernel
    * (graft.expressions.SimHashExpr); the HOF fold below is kept as
    * the reference spelling for the parity spec. */
  def simHash(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.SimHashExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(tokenHashes(text))))

  /** MinHash signature over shingle hashes — codegen'd shingling +
    * seeded-minima kernels (graft.expressions.{ShingleHashesExpr,
    * MinHashSigExpr}), value-identical to the HOF shingles →
    * `min(xxhash64(h, i))` aggregation per doc. */
  def minHashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.MinHashSigExpr(
        graft.expressions.ShingleHashesExpr(
          org.apache.spark.sql.graftshim.ColumnBridge.expr(text), shingleK),
        numHashes))

  /** Compiled token-hash kernel (TokenHashesExpr) — token-for-token
    * identical to the HOF spelling below. */
  def tokenHashes(text: Column): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.TokenHashesExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text)))

  /** Reference HOF spelling of the token hashes (parity spec). */
  def tokenHashesHof(text: Column): Column =
    transform(tokens(text), t => xxhash64(t))

  /** One-pass within-doc k-gram repetition stats
    * (graft.expressions.RepetitionStatsExpr):
    * `struct(rep_cnt, uniq, n)` over the lowercased single-space token
    * split; NULL for docs shorter than k tokens. Value-identical to
    * ql11's explode→groupBy relational spelling (parity spec) with
    * zero shuffles. */
  def repetitionStats(text: Column, k: Int = 2): Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      graft.expressions.RepetitionStatsExpr(
        org.apache.spark.sql.graftshim.ColumnBridge.expr(text), k))

  def simHashFromHashes(hs: Column): Column = {
    val powers = array((0 until 64).map(b => lit(1L << b)): _*)
    val zero = array((0 until 64).map(_ => lit(0L)): _*)
    val counts = aggregate(hs, zero, (acc, h) =>
      zip_with(acc, powers, (c, p) =>
        c + when(h.bitwiseAND(p) =!= 0L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counts, powers, (c, p) => when(c > 0L, p).otherwise(0L)),
      lit(0L), (a, b) => a.bitwiseOR(b))
  }
}
