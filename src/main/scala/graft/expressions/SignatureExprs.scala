package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd dedup-signature kernels over a token/shingle hash array —
  * the NARROW spelling of SimHash and MinHash signature computation.
  *
  * The relational spelling (explode hashes → hash-aggregate per doc,
  * MinHashDedup round-3 shape) pays an explode amplification plus one
  * shuffle per signature table; these kernels compute the same
  * signature in a single compiled pass per document, so the signature
  * stage becomes a projection — zero shuffles, no row amplification —
  * and at 100 TB the only shuffles left in dedup are the band-key
  * groupBy and the pair dedup (MinHashDedup pipeline notes).
  *
  * Bit parity: seeded re-hashing uses Spark's own XXH64 with the
  * exact composition of the SQL spelling `xxhash64(h, i)` =
  * `hashInt(i, hashLong(h, 42))` (asserted in DedupSpec), so
  * signatures are interchangeable with the aggregate spelling.
  */
private[expressions] trait LongArrayInput { self: UnaryExpression =>
  protected lazy val elemsNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> input, got ${other.simpleString}")
  }
}

/** 64-bit SimHash (Charikar '02) over token hashes: per-bit ±1
  * counters in one pass, sign bits packed into a long. Bit b set iff
  * the counter is strictly positive (ties → unset) — identical to
  * TextFunctions.simHashFromHashes and to the packed-lane aggregate
  * spelling. Null elements are skipped; a null array yields NULL. */
case class SimHashExpr(child: Expression)
    extends UnaryExpression with LongArrayInput {

  override def dataType: DataType = LongType

  def applyHashes(a: ArrayData): Long = {
    val n = a.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!(elemsNullable && a.isNullAt(i))) {
        val h = a.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) acc |= (1L << b)
      b += 1
    }
    acc
  }

  override def nullSafeEval(v: Any): Any = applyHashes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHashExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyHashes($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "sim_hash_sig"
}

/** MinHash signature (Broder '97): `numHashes` seeded minima over the
  * shingle-hash array, sig[i] = min_h xxhash64(h, i) with Spark's
  * exact seed composition. Null elements are skipped; an empty or
  * all-null array yields NULL (the aggregate spelling's `min` over
  * zero rows). */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with LongArrayInput {

  require(numHashes > 0, "numHashes must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Nullable even for non-null input: empty hash sets have no
    * minimum. */
  override def nullable: Boolean = true

  def applyHashes(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!(elemsNullable && a.isNullAt(i))) {
        seen = true
        val base = XXH64.hashLong(a.getLong(i), 42L)
        var k = 0
        while (k < numHashes) {
          val v = XXH64.hashInt(k, base)
          if (v < out(k)) out(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any = applyHashes(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSigExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = $ref.applyHashes($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "min_hash_sig"
}

private[expressions] object TextTokens {
  /** Spark's `split(text, "\\s+")` semantics exactly: Java regex, no
    * flags, limit -1 (leading/trailing empty tokens preserved). */
  private val ws = java.util.regex.Pattern.compile("\\s+")
  def split(s: String): Array[String] = ws.split(s, -1)
}

/** xxhash64 of every whitespace token — the compiled spelling of
  * `transform(split(text, "\\s+"), t -> xxhash64(t))`, token-for-token
  * identical including empty tokens from leading/trailing whitespace
  * (asserted in DedupSpec via the signature parity tests). */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes expects a string input, got ${other.simpleString}")
  }

  def applyText(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val toks = TextTokens.split(text.toString)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)), 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any =
    applyText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenHashes", this, classOf[TokenHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "token_hashes"
}

/** xxhash64 of every DISTINCT word k-gram shingle — the compiled
  * spelling of `transform(shingles(text, k), s -> xxhash64(s))`
  * (TextFunctions.shingles: k-gram join with " ", ragged tail when
  * the doc is shorter than k, first-occurrence distinct). */
case class ShingleHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects a string input, got ${other.simpleString}")
  }

  def applyText(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val toks = TextTokens.split(text.toString)
    val n = toks.length
    val count = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[String](count * 2)
    var i = 0
    while (i < count) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) {
      out(w) = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(it.next()), 42L)
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(v: Any): Any =
    applyText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashesExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

/** Order-sensitive rolling document fingerprint — the compiled
  * spelling of `aggregate(split(text), 0L, (acc, t) -> xxhash64(acc, t))`
  * with Spark's exact multi-child composition
  * xxhash64(acc, t) = hashUTF8String(t, hashLong(acc, 42)). */
case class DocFingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"doc_fingerprint expects a string input, got ${other.simpleString}")
  }

  def applyText(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val toks = TextTokens.split(text.toString)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)),
        XXH64.hashLong(acc, 42L))
      i += 1
    }
    acc
  }

  override def nullSafeEval(v: Any): Any =
    applyText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("docFp", this, classOf[DocFingerprintExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.applyText($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): DocFingerprintExpr =
    copy(child = newChild)

  override def prettyName: String = "doc_fingerprint_fast"
}

/** One-pass within-document k-gram repetition stats (the Gopher-style
  * quality rule behind ql11): over the lowercased single-space token
  * split, counts every k-gram occurrence and returns
  * `struct(rep_cnt, uniq, n)` where `rep_cnt` = occurrences of grams
  * appearing more than once, `uniq` = distinct grams, `n` = total
  * gram occurrences. NULL when the doc has fewer than k tokens (the
  * relational spelling's `WHERE size(w) >= k` row drop).
  *
  * Token parity with the SQL spelling `split(lower(text), ' ')`:
  * literal-space Java regex with limit -1 (consecutive/leading spaces
  * yield empty tokens) over UTF8String.toLowerCase — exactly Spark's
  * `lower`. The relational spelling (explode k-gram positions →
  * groupBy(doc, gram) → re-group by doc) shuffles the exploded gram
  * rows twice; this kernel makes the whole computation a projection,
  * so at 100 TB repetition scoring is shuffle-free. */
case class RepetitionStatsExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "gram size must be >= 1")

  private val fields = StructType(Seq(
    StructField("rep_cnt", LongType, nullable = false),
    StructField("uniq", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def dataType: DataType = fields

  /** Nullable even for non-null input: docs shorter than k grams. */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects a string input, got ${other.simpleString}")
  }

  def applyText(text: org.apache.spark.unsafe.types.UTF8String): Any = {
    val toks = RepetitionStatsExpr.space.split(text.toLowerCase.toString, -1)
    val n = toks.length - k + 1
    if (n <= 0) return null
    val counts = new java.util.HashMap[String, Int](n * 2)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < i + k) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var rep = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > 1) rep += c
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](rep, counts.size, n.toLong))
  }

  override def nullSafeEval(v: Any): Any =
    applyText(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepetitionStatsExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = (InternalRow) $ref.applyText($a);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)

  override def prettyName: String = "repetition_stats"
}

object RepetitionStatsExpr {
  /** Literal single-space split — `split(lower(text), ' ')` parity. */
  private val space = java.util.regex.Pattern.compile(" ")
}
