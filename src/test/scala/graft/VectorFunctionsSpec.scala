package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._

/** Hand-computed goldens per FIXTURES.md §B, mirroring the reference's
  * unit style (/root/reference/simulator/test_sim_reflex.py:13-58). */
class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_sum_agg UDAF equals the posexplode spelling (per-label centroids)") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val viaUdaf = spark.sql(
      """SELECT label, vec_sum_agg(embedding) AS s
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = spark.sql(
      """SELECT label, pos, sum(CAST(v AS DOUBLE)) AS s
        |FROM embeddings LATERAL VIEW posexplode(embedding) AS pos, v
        |GROUP BY label, pos ORDER BY label, pos""".stripMargin)
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq }
    assert(viaUdaf.keySet == viaExplode.keySet)
    viaUdaf.foreach { case (l, s) =>
      val e = viaExplode(l)
      assert(s.length == e.length)
      s.zip(e).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-6, s"label $l: $a vs $b")
      }
    }
  }

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

  test("activation family matches scala math elementwise") {
    val xs = Seq(-2.0, -0.5, 0.0, 0.7, 3.0)
    val df = Seq(Tuple1(xs)).toDF("v")
    val r = df.select(
      vecSigmoid(col("v")).as("sig"), vecTanh(col("v")).as("th"),
      vecSilu(col("v")).as("si"), vecGelu(col("v")).as("ge")).collect().head
    def sigmoid(x: Double) = 1.0 / (1.0 + math.exp(-x))
    def gelu(x: Double) =
      0.5 * x * (1.0 + math.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(r.getSeq[Double](0)(i) - sigmoid(x)) < 1e-12)
      assert(math.abs(r.getSeq[Double](1)(i) - math.tanh(x)) < 1e-12)
      assert(math.abs(r.getSeq[Double](2)(i) - x * sigmoid(x)) < 1e-12)
      assert(math.abs(r.getSeq[Double](3)(i) - gelu(x)) < 1e-12)
    }
  }

  test("layer/rms norm invariants: zero mean / unit-ish scale") {
    val df = Seq(Tuple1(Seq(1.0, 2.0, 3.0, 4.0))).toDF("v")
    val r = df.select(
      vecLayerNorm(col("v")).as("ln"), vecRmsNorm(col("v")).as("rms")).collect().head
    val ln = r.getSeq[Double](0)
    assert(math.abs(ln.sum) < 1e-9)                       // zero mean
    assert(math.abs(ln.map(x => x * x).sum / 4 - 1.0) < 1e-4) // unit var (ε-damped)
    // rms: x / sqrt(mean(x²)+ε); mean(x²) = 7.5
    val rms = r.getSeq[Double](1)
    Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.foreach { case (x, i) =>
      assert(math.abs(rms(i) - x / math.sqrt(7.5 + 1e-6)) < 1e-12)
    }
  }

  test("asymmetric quantization golden: [-1, 1] range, zp=127") {
    // min=-1, max=1: scale=2/255, zp=trunc(127.5)=127
    val df = Seq(Tuple1(Seq(-1.0f, 0.0f, 1.0f))).toDF("v")
    val r = df.select(
      quantZeroPointAsym(col("v")).as("zp"),
      quantizeUint8Asym(col("v")).as("q")).collect().head
    assert(r.getInt(0) == 127)
    assert(r.getSeq[Int](1) == Seq(0, 127, 255))
  }

  test("int4 pack/unpack golden: high nibble first") {
    val df = Seq(Tuple1(Seq(15, 0, 1, 2))).toDF("q")
    val r = df.select(packInt4(col("q")).as("p"),
      unpackInt4(packInt4(col("q"))).as("u")).collect().head
    assert(r.getSeq[Int](0) == Seq(240, 18)) // 15<<4|0, 1<<4|2
    assert(r.getSeq[Int](1) == Seq(15, 0, 1, 2))
  }
}
