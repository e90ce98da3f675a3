package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("count-min overestimates-only and Bloom has no false negatives") {
    val events = (Seq.fill(100)(1L) ++ Seq.fill(10)(2L) ++ Seq(3L))
      .map(Tuple1(_)).toDF("user_id")
    val out = Sketches.frequencySketch(events, "user_id", Seq(1L, 2L, 3L, 42L))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap

    // CMS never undercounts; at this eps it is exact on tiny input
    assert(out(1L)._2 >= 100 && out(1L)._1 == 100)
    assert(out(2L)._2 >= 10 && out(2L)._1 == 10)
    assert(out(3L)._2 >= 1)
    // Bloom: no false negatives on present keys
    assert(out(1L)._3 && out(2L)._3 && out(3L)._3)
    // absent key: exact count 0 (bloom MAY false-positive; CMS may
    // collide — only the exact column is asserted)
    assert(out(42L)._1 == 0)
  }

  test("sketch results are deterministic across builds") {
    val events = (1L to 500L).map(i => Tuple1(i % 37)).toDF("user_id")
    val a = Sketches.frequencySketch(events, "user_id", Seq(0L, 5L, 36L)).collect().toSeq
    val b = Sketches.frequencySketch(events, "user_id", Seq(0L, 5L, 36L)).collect().toSeq
    assert(a == b)
  }
}
