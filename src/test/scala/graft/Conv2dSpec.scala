package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Conv2d

class Conv2dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("valid-mode conv2d golden: 3x3 input, 2x2 kernel") {
    // input map: [[1,2,3],[4,5,6],[7,8,9]], one channel, one image
    val input = (for (y <- 0 until 3; x <- 0 until 3)
      yield (1L, 0, y, x, (y * 3 + x + 1).toDouble))
      .toDF("img_id", "c", "y", "x", "v")
    // kernel [[1,0],[0,-1]]: out(oy,ox) = in(oy,ox) - in(oy+1,ox+1)
    val kernel = Conv2d.kernelTable(spark,
      Array(Array(Array(Array(1.0, 0.0), Array(0.0, -1.0)))))
    val out = Conv2d.conv2dValid(input, kernel, height = 3, width = 3, kh = 2, kw = 2)
      .collect().map(r => ((r.getInt(2), r.getInt(3)), r.getDouble(4))).toMap
    // expected: 1-5, 2-6, 4-8, 5-9 = -4 everywhere
    assert(out == Map((0, 0) -> -4.0, (0, 1) -> -4.0, (1, 0) -> -4.0, (1, 1) -> -4.0))
  }

  test("multi-channel sums over input channels") {
    // two channels of ones, 2x2 input, 1x1 kernel weights 2 and 3 -> out = 5
    val input = (for (c <- 0 until 2; y <- 0 until 2; x <- 0 until 2)
      yield (1L, c, y, x, 1.0)).toDF("img_id", "c", "y", "x", "v")
    val kernel = Conv2d.kernelTable(spark,
      Array(Array(Array(Array(2.0)), Array(Array(3.0)))))
    val out = Conv2d.conv2dValid(input, kernel, 2, 2, 1, 1)
      .collect().map(_.getDouble(4))
    assert(out.length == 4 && out.forall(_ == 5.0))
  }

  test("distillation loss: identical logits give zero soft loss; golden hard loss") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val df = Seq((Seq(1.0, 2.0, 3.0), 2)).toDF("s", "label")
    val r = df.select(
      VectorFunctions.distillSoftLoss(col("s"), col("s")).as("soft"),
      VectorFunctions.distillLoss(col("s"), col("s"), col("label")).as("total"))
      .collect().head
    assert(math.abs(r.getDouble(0)) < 1e-12)
    // hard = -log softmax([1,2,3])[2]; total = 0.5*0 + 0.5*hard
    val z = Seq(1.0, 2.0, 3.0).map(x => math.exp(x - 3.0)).sum
    val hard = -math.log(math.exp(0.0) / z)
    assert(math.abs(r.getDouble(1) - 0.5 * hard) < 1e-12)
  }
}
