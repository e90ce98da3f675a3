package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Cascade, MatMul}
import graft.functions.GraftFunctions

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("coordinate GEMM golden: [[1,2],[3,4]] x [[5,6],[7,8]]") {
    val a = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0)).toDF("i", "k", "v")
    val b = Seq((0, 0, 5.0), (0, 1, 6.0), (1, 0, 7.0), (1, 1, 8.0)).toDF("k", "j", "v")
    val expected = Map((0, 0) -> 19.0, (0, 1) -> 22.0, (1, 0) -> 43.0, (1, 1) -> 50.0)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(toMap(MatMul.coo(a, b)) == expected)
    assert(toMap(MatMul.cooBroadcast(a, b)) == expected)
  }

  test("sparse GEMM skips sub-threshold entries (sparsity as filter pushdown)") {
    val a = Seq((0, 0, 1.0), (0, 1, 0.001)).toDF("i", "k", "v")
    val b = Seq((0, 0, 1.0), (1, 0, 1.0)).toDF("k", "j", "v")
    val r = MatMul.cooSparse(a, b, 0.01).collect()
    assert(r.length == 1 && r.head.getDouble(2) == 1.0)
  }

  test("fcLayer reproduces the GEMV golden end-to-end") {
    val in = Seq(Tuple1(Seq(1.0, 2.0))).toDF("x")
    val out = MatMul.fcLayer(in, "x",
      Array(Array(1.0, 2.0), Array(3.0, 4.0)), Array(0.0, 1.0), relu = true)
      .select(col("fc_out")).collect().head.getSeq[Double](0)
    assert(out == Seq(5.0, 12.0))
  }

  test("cascade early-exit: confident rows exit at layer 1, rest at 0") {
    // layer: 2-way scorer; vector aligned with class-0 weights is confident
    val docs = Seq(
      (1L, Seq(10.0f, 0.0f)),  // strongly class 0 -> high confidence
      (2L, Seq(0.1f, 0.1f)))   // ambiguous -> conf ~0.5
      .toDF("id", "v")
    val layers = Seq((Array(Array(1.0, 0.0), Array(0.0, 1.0)), Array(0.0, 0.0)))
    val scored = Cascade.earlyExit(docs, "v", layers, threshold = 0.9)
    val byId = scored.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Int]("exit_layer")).toMap
    assert(byId(1L) == 1)
    assert(byId(2L) == 0)
    val stats = Cascade.exitStats(scored, nLayers = 1).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 2)
  }

  test("SQL function registry: vec/text functions usable from spark.sql") {
    GraftFunctions.register(spark)
    Seq((1L, Seq(3.0f, 4.0f), "the cat and the dog is here"))
      .toDF("id", "v", "t").createOrReplaceTempView("ft")
    val r = spark.sql(
      """SELECT round(vec_l2(v), 4) AS l2, round(vec_cosine(v, v), 4) AS cos,
        |       quantize_int8(v) AS q, token_count(t) AS tc, lang_id(t) AS lang
        |FROM ft""".stripMargin).collect().head
    assert(r.getAs[Double]("l2") == 5.0)
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getSeq[Int](r.fieldIndex("q")).toSeq == Seq(95, 127))
    assert(r.getAs[Int]("tc") == 7)
    assert(r.getAs[String]("lang") == "en")
  }
}
