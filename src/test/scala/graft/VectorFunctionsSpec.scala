package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._

/** Hand-computed goldens per FIXTURES.md §B, mirroring the reference's
  * unit style (/root/reference/simulator/test_sim_reflex.py:13-58). */
class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("GEMV + bias + ReLU golden: W·[1,2]+b = [5,12]") {
    // rows of W with bias, FC computed relationally per output unit
    val df = Seq(
      (Seq(1.0, 2.0), 0.0),
      (Seq(3.0, 4.0), 1.0)).toDF("w", "b")
    val x = array(lit(1.0), lit(2.0))
    val y = df.select((vecDot(col("w"), x) + col("b")).as("y"))
      .collect().map(_.getDouble(0)).toSeq
    assert(y == Seq(5.0, 12.0))
    // negated weights + ReLU -> [0, 0]
    val yNeg = df.select(
      greatest(vecDot(transform(col("w"), v => -v), x) + col("b"), lit(0.0)).as("y"))
      .collect().map(_.getDouble(0)).toSeq
    assert(yNeg == Seq(0.0, 0.0))
  }

  test("quantize int8 symmetric golden: [-1,0,0.5,1] -> [-127,0,64,127]") {
    val df = Seq(Tuple1(Seq(-1.0f, 0.0f, 0.5f, 1.0f))).toDF("v")
    val q = df.select(quantizeInt8(col("v")).as("q"))
      .collect().head.getSeq[Int](0)
    assert(q == Seq(-127, 0, 64, 127))
    val maxErr = df.select(
      aggregate(zip_with(dequantizeInt8(quantizeInt8(col("v")), quantScale(col("v"))),
        vecToDouble(col("v")), (a, b) => abs(a - b)),
        lit(0.0), (s, e) => greatest(s, e)).as("e"))
      .collect().head.getDouble(0)
    assert(maxErr <= (1.0 / 127) / 2 + 1e-12) // ≤ scale/2
  }

  test("stable softmax golden: [1,2,3] -> [0.0900,0.2447,0.6652]") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("v")
    val sm = df.select(transform(vecSoftmax(col("v")), x => round(x, 4)).as("s"))
      .collect().head.getSeq[Double](0)
    assert(sm == Seq(0.09, 0.2447, 0.6652))
    assert(math.abs(sm.sum - 1.0) < 1e-3)
  }

  test("sparsity buckets per reference thresholds (0.3/0.7)") {
    def mode(zeros: Int): String = {
      val v = Seq.fill(zeros)(0.0f) ++ Seq.fill(10 - zeros)(1.0f)
      Seq(Tuple1(v)).toDF("v")
        .select(sparsityMode(vecSparsity(col("v"), 0.01)).as("m"))
        .collect().head.getString(0)
    }
    assert(mode(8) == "csr")    // 80% zeros
    assert(mode(5) == "sparse") // 50%
    assert(mode(1) == "dense")  // 10%
  }

  test("cosine of a vector with itself is 1; L2 norm golden") {
    val df = Seq(Tuple1(Seq(3.0f, 4.0f))).toDF("v")
    val r = df.select(
      round(vecCosine(col("v"), col("v")), 6).as("c"),
      round(vecL2(col("v")), 6).as("n")).collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 5.0)
  }
}
