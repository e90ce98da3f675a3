package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed φ-heavy-hitters via Misra-Gries + exact verification —
  * the frequent-items member of the sketch family (HLL distinct, CMS
  * frequency, Bloom membership, GK quantiles; Sketches.scala). At
  * 100 TB an exact top-k over an unbounded key domain needs a
  * full-domain aggregate; the two-pass sketch shape needs O(1/φ)
  * state:
  *
  *  - pass 1: a Misra-Gries summary with cap = ⌈1/φ⌉ counters per
  *    partition, merged associatively (Agarwal et al., "Mergeable
  *    Summaries", PODS '12) — ONE distributed aggregate, KB-sized
  *    driver artifact. Guarantee: every item with true frequency
  *    > N/(cap+1) ≤ φ·N survives to the candidate set, under ANY
  *    processing/merge order.
  *  - pass 2: exact counts of the ≤cap candidates only (an IN filter
  *    the scan prunes with), then the φ·N threshold keeps exactly the
  *    TRUE heavy hitters.
  *
  * The sketch's order-dependent counters never reach the output —
  * candidacy is order-robust (superset guarantee) and the exact
  * pass-2 counts decide membership, so the result is DETERMINISTIC on
  * any partitioning: the same discipline that keeps every other
  * engine op oracle-comparable. */
object HeavyHitters {

  /** Pass-1 buffer: the MG counters PLUS the running non-null item
    * count — carrying N inside the same aggregate keeps the operator
    * genuinely two-pass (sketch scan + exact-candidate scan), with no
    * separate count job. */
  final case class MgBuffer(counters: Map[String, Long], n: Long)

  /** Misra-Gries frequent-candidates aggregator: keeps at most `cap`
    * counters; a miss on a full buffer decrements all (classic MG);
    * merge sums counters then subtracts the (cap+1)-th largest to
    * restore the bound (mergeable-summaries rule). */
  class MisraGriesAgg(cap: Int)
      extends Aggregator[String, MgBuffer, (Seq[String], Long)] {
    require(cap >= 1, s"cap must be >= 1, got $cap")

    override def zero: MgBuffer = MgBuffer(Map.empty, 0L)

    override def reduce(buf: MgBuffer, tok: String): MgBuffer =
      if (tok == null) buf
      else {
        val b = buf.counters
        val next = b.get(tok) match {
          case Some(c) => b.updated(tok, c + 1)
          case None if b.size < cap => b.updated(tok, 1L)
          case None =>
            // decrement-all: drop keys that hit zero (cancels one
            // occurrence of cap+1 distinct items — the MG error unit)
            b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
        }
        MgBuffer(next, buf.n + 1)
      }

    override def merge(x: MgBuffer, y: MgBuffer): MgBuffer = {
      val combined = y.counters.foldLeft(x.counters) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      val merged =
        if (combined.size <= cap) combined
        else {
          // subtract the (cap+1)-th largest counter value from all
          val kth = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(cap)
          combined.flatMap { case (k, c) =>
            if (c > kth) Some(k -> (c - kth)) else None
          }
        }
      MgBuffer(merged, x.n + y.n)
    }

    override def finish(r: MgBuffer): (Seq[String], Long) =
      (r.counters.keys.toSeq.sorted, r.n)

    override def bufferEncoder: Encoder[MgBuffer] =
      ExpressionEncoder[MgBuffer]()
    override def outputEncoder: Encoder[(Seq[String], Long)] =
      ExpressionEncoder[(Seq[String], Long)]()
  }

  /** Pass 1: the ≤cap candidate strings and the exact non-null item
    * count N, from ONE scan (bounded driver fetch — the sketch
    * artifact, same class as the CMS/Bloom driver sketches). */
  def candidatesAndCount(items: DataFrame, itemCol: String, cap: Int): (Seq[String], Long) = {
    val agg = udaf(new MisraGriesAgg(cap), ExpressionEncoder[String]())
    val row = items.select(agg(col(itemCol)).as("cand")).head().getStruct(0)
    (row.getSeq[String](0), row.getLong(1))
  }

  /** Pass 1, candidates only (kept for callers that track N themselves). */
  def candidates(items: DataFrame, itemCol: String, cap: Int): Seq[String] =
    candidatesAndCount(items, itemCol, cap)._1

  /** Both passes: every item with frequency > φ·N, with its EXACT
    * count and frequency — deterministic output. */
  def heavyHitters(items: DataFrame, itemCol: String, phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    val cap = math.ceil(1.0 / phi).toInt
    val (cand, n) = candidatesAndCount(items, itemCol, cap)
    val thresh = phi * n
    items
      .filter(col(itemCol).isin(cand: _*))
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > thresh)
      .select(col("item"), col("cnt"),
        round(col("cnt") / lit(n.toDouble), 4).as("freq"))
      .orderBy(col("cnt").desc_nulls_last, col("item"))
  }
}
