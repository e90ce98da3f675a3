package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // 10,000 items: "hot" ×3000, "warm" ×500, 100-key tail ×65 each
  private def corpus: Seq[String] =
    Seq.fill(3000)("hot") ++ Seq.fill(500)("warm") ++
      (0 until 100).flatMap(i => Seq.fill(65)(s"tail_$i"))

  test("finds exactly the true phi-heavy hitters with exact counts") {
    import spark.implicits._
    val df = corpus.toDF("tok")
    // phi = 4%: threshold 400 — hot (30%) and warm (5%) qualify, the
    // 0.65% tail keys must all be filtered by the exact pass
    val r = HeavyHitters.heavyHitters(df, "tok", phi = 0.04)
      .collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r == Seq("hot" -> 3000L, "warm" -> 500L))
  }

  test("result is invariant to partitioning (sketch never leaks order)") {
    import spark.implicits._
    def run(parts: Int) =
      HeavyHitters.heavyHitters(corpus.toDF("tok").repartition(parts), "tok", 0.04)
        .collect().map(_.toString).toSeq
    assert(run(2) == run(13))
  }

  test("MG guarantee: a > N/(cap+1) item survives any merge order") {
    // adversarial order: the hot item first, then the diluting tail —
    // decrement-all pressure cannot evict an item with freq > N/(cap+1)
    import spark.implicits._
    val adversarial = Seq.fill(3000)("hot") ++
      (0 until 100).flatMap(i => Seq.fill(70)(s"t_$i"))
    val cand = HeavyHitters.candidates(
      adversarial.toDF("tok").repartition(7), "tok", cap = 25)
    assert(cand.contains("hot"))
    assert(cand.size <= 25)
  }

  test("nulls are ignored; phi bounds are validated") {
    import spark.implicits._
    val withNulls = (corpus.map(Option(_)) ++ Seq.fill(50)(None)).toDF("tok")
    val r = HeavyHitters.heavyHitters(withNulls, "tok", 0.04)
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("hot", "warm"))
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(withNulls, "tok", 0.0)
    }
  }
}
