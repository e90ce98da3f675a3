package graft

import org.apache.spark.sql.SparkSession

/** Shared measurement discipline for Bench / ScaleBench — one home
  * for the contention sentinel, the sample-disagreement predicate,
  * and the resample-combine rule, so the two benches cannot drift
  * apart in how they defend against host load. */
object BenchUtil {

  /** Contention sentinel: a fixed trivial probe (footer-only count
    * of the 5-row region file) timed throughout a bench run. Its
    * cost is constant by construction, so its min is the machine's
    * quiet floor and its max/min spread is a direct record of
    * external host load — without it a reader cannot tell an 80s-slow
    * snapshot from an 80s-busy one (the r7 headline shipped ~30%
    * inflated). tools/bench_diff.py refuses to call regressions when
    * a snapshot's spread is ≥ 2×. */
  final class SentinelProbe(spark: SparkSession, sfDir: String) {
    private val buf = scala.collection.mutable.ArrayBuffer[Double]()
    def probe(): Unit = {
      val t0 = System.nanoTime()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      buf += (System.nanoTime() - t0) / 1e9
      ()
    }
    /** First probe pays one-off FileIndex setup — run once, discard. */
    def prime(): Unit = { probe(); buf.clear() }
    def samples: Seq[Double] = buf.toSeq
  }

  /** Two samples that disagree >1.5× (with a 50 ms absolute guard so
    * sub-jitter wobble on trivial entries doesn't escalate) warrant a
    * third — two agreeing samples are evidence, two disagreeing ones
    * a coin-flip over which was contended. */
  def disagree(a: Double, b: Double): Boolean =
    a >= 0 && b >= 0 && math.max(a, b) > 1.5 * math.min(a, b) &&
      math.max(a, b) - math.min(a, b) > 0.05

  /** Combine an established measurement with one optional resample.
    * A FAILED resample (<0) is discarded, never min-combined: a query
    * that already holds valid samples must not flip to "failed" (and
    * fall out of a total, reading as a speedup) because one extra
    * chance hit a transient error. */
  def refine(base: Double, resample: Option[Double]): Double =
    resample match {
      case Some(x) if x >= 0 && base >= 0 => math.min(base, x)
      case _ => base
    }

  /** Exactly one of the two primary samples failed — a transient
    * flake OR a real intermittent error; the pair must be escalated
    * to a third sample, never silently resolved either way. */
  def oneFailed(a: Double, b: Double): Boolean = (a < 0) != (b < 0)

  /** min of the two primary samples: both valid → min; exactly one
    * valid → the valid one (max picks it, since the other is -1) —
    * PROVISIONAL, callers must escalate via [[oneFailed]]; both
    * failed → -1. Replaces the old any-failure→failed rule, which
    * let a single pass-1/2 flake permanently mark a query failed
    * with no path to pass 3 (stragglers need after2 > 2.5 and
    * disagree needs both samples valid). */
  def minOk(a: Double, b: Double): Double =
    if (a >= 0 && b >= 0) math.min(a, b) else math.max(a, b)

  /** Full three-pass combine. A salvaged pair (one primary failed)
    * REQUIRES the resample to replicate success: if it also failed,
    * 2 of 3 samples failed and the entry is failed; otherwise the
    * resample only refines (never flips an established measurement
    * to failed — the [[refine]] rule). */
  def combine(a: Double, b: Double, resample: Option[Double]): Double =
    resample match {
      case Some(x) if oneFailed(a, b) && x < 0 => -1.0
      case r => refine(minOk(a, b), r)
    }

  /** A run whose sentinel spread is ≥ 2× (or whose floor collapsed
    * to 0 — a malformed probe) was taken under external host load:
    * callers surface this as a top-level `dirty` flag so the JSON is
    * self-describing without opening the sentinel block. Matches the
    * tools/bench_diff.py refusal gate. */
  def isDirty(samples: Seq[Double]): Boolean =
    samples.nonEmpty && {
      val mn = samples.min
      mn <= 0 || samples.max / mn >= 2.0
    }

  /** `"sentinel":{...}` JSON fragment (no surrounding comma): min is
    * the quiet floor, max/min the contention spread over the run. */
  def sentinelJson(samples: Seq[Double]): String =
    if (samples.isEmpty) "\"sentinel\":null"
    else {
      def r3(v: Double): String =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      val mn = samples.min
      val mx = samples.max
      val spread = if (mn > 0) mx / mn else -1.0
      s""""sentinel":{"min":${r3(mn)},"max":${r3(mx)},"spread":${r3(spread)},"n":${samples.size}}"""
    }
}
