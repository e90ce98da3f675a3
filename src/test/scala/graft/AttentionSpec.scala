package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Attention
import graft.functions.VectorFunctions

/** Golden-value tests for the attention composition and RoPE — the
  * hand-computed-literal style of the reference's simulator tests
  * (/root/reference/simulator/test_sim_reflex.py:13-58). */
class AttentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("causal scaled-dot-product attention matches hand computation") {
    // seq 0, d=2: pos0 q=k=v=[1,0]; pos1 q=k=[0,1], v=[2,0]
    val tokens = Seq(
      (0L, 0, Array(1.0, 0.0), Array(1.0, 0.0), Array(1.0, 0.0)),
      (0L, 1, Array(0.0, 1.0), Array(0.0, 1.0), Array(2.0, 0.0))
    ).toDF("seq", "pos", "q", "k", "v")

    val out = Attention.scaledDotProduct(tokens, "seq", "pos", "q", "k", "v",
        causal = true)
      .orderBy("pos").collect()
      .map(r => r.getInt(1) -> r.getSeq[Double](2))

    // pos 0 attends only to itself
    assert(out(0)._1 == 0)
    assert(out(0)._2.zip(Seq(1.0, 0.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    // pos 1: raw_10 = 0, raw_11 = 1/sqrt(2); stable softmax weights
    val r11 = 1.0 / math.sqrt(2.0)
    val e0 = math.exp(0.0 - r11)
    val w0 = e0 / (e0 + 1.0)
    val w1 = 1.0 / (e0 + 1.0)
    val expected = Seq(w0 * 1.0 + w1 * 2.0, 0.0)
    assert(out(1)._1 == 1)
    assert(out(1)._2.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("full (non-causal) attention is permutation-symmetric in weights") {
    val tokens = Seq(
      (0L, 0, Array(1.0, 0.0), Array(1.0, 0.0), Array(1.0, 0.0)),
      (0L, 1, Array(1.0, 0.0), Array(1.0, 0.0), Array(3.0, 0.0))
    ).toDF("seq", "pos", "q", "k", "v")
    // identical q/k ⇒ uniform weights ⇒ both outputs = mean(v) = [2,0]
    val out = Attention.scaledDotProduct(tokens, "seq", "pos", "q", "k", "v")
      .orderBy("pos").collect().map(_.getSeq[Double](2))
    out.foreach { a =>
      assert(math.abs(a.head - 2.0) < 1e-12 && math.abs(a(1)) < 1e-12)
    }
  }

  test("RoPE matches the rotate-half formula; position 0 is identity") {
    val df = Seq((Array(1.0, 2.0, 3.0, 4.0), 1), (Array(1.0, 2.0, 3.0, 4.0), 0))
      .toDF("v", "pos")
    val out = df.select(col("pos"), VectorFunctions.vecRope(col("v"), col("pos")).as("r"))
      .orderBy("pos").collect().map(r => r.getInt(0) -> r.getSeq[Double](1))

    // pos 0: identity
    assert(out(0)._2.zip(Seq(1.0, 2.0, 3.0, 4.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })

    // pos 1, d=4: f0=1, f1=10000^(-1/2)=0.01
    val (c0, s0, c1, s1) = (math.cos(1.0), math.sin(1.0), math.cos(0.01), math.sin(0.01))
    val expected = Seq(
      1.0 * c0 - 3.0 * s0,
      2.0 * c1 - 4.0 * s1,
      3.0 * c0 + 1.0 * s0,
      4.0 * c1 + 2.0 * s1)
    assert(out(1)._2.zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }
}
