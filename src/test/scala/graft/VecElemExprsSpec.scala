package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, VectorFunctions}

/** Parity of the codegen'd vector kernel family (VecElemExprs)
  * against the interpreted HOF spellings they replaced — bit-identical
  * values and identical null propagation, so every oracle-checked
  * query keeps its hash when the library swaps spellings. */
class VecElemExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val D0: Column = lit(0.0).cast("double")

  // the pre-promotion HOF spellings, verbatim
  private def hofRelu(v: Column) = transform(v, x => greatest(x.cast("double"), lit(0.0)))
  private def hofSigmoid(v: Column) = transform(v, x => lit(1.0) / (lit(1.0) + exp(-x.cast("double"))))
  private def hofTanh(v: Column) = transform(v, x => tanh(x.cast("double")))
  private def hofSilu(v: Column) = transform(v, x => {
    val d = x.cast("double"); d / (lit(1.0) + exp(-d))
  })
  private def hofGelu(v: Column) = transform(v, x => {
    val d = x.cast("double")
    lit(0.5) * d * (lit(1.0) + tanh(lit(0.7978845608028654) * (d + lit(0.044715) * d * d * d)))
  })
  private def let(bound: Column, body: Column => Column): Column =
    element_at(transform(array(bound), b => body(b)), 1)
  private def hofSoftmax(v: Column): Column = {
    val d = transform(v, x => x.cast("double"))
    let(array_max(d), mx => {
      val ex = transform(d, x => exp(x - mx))
      let(aggregate(ex, D0, (s, x) => s + x), sm => transform(ex, x => x / sm))
    })
  }
  private def hofLayerNorm(v: Column, eps: Double = 1e-5): Column = {
    val d = transform(v, x => x.cast("double"))
    val n = size(v).cast("double")
    let(struct(
        (aggregate(d, D0, (s, x) => s + x) / n).as("mu"),
        (aggregate(d, D0, (s, x) => s + x * x) / n).as("ms")), st => {
      val mu = st.getField("mu")
      val varPop = st.getField("ms") - mu * mu
      transform(d, x => (x - mu) / sqrt(varPop + lit(eps)))
    })
  }
  private def hofRmsNorm(v: Column, eps: Double = 1e-6): Column = {
    val d = transform(v, x => x.cast("double"))
    let(aggregate(d, D0, (s, x) => s + x * x) / size(v).cast("double"),
      meanSq => transform(d, x => x / sqrt(meanSq + lit(eps))))
  }
  private def hofSum(v: Column) =
    aggregate(transform(v, x => x.cast("double")), D0, (s, x) => s + x)
  private def hofSumSq(v: Column) =
    aggregate(transform(v, x => x.cast("double")), D0, (s, x) => s + x * x)

  private def assertSameArrays(fast: Column, hof: Column): Unit = {
    val rows = spark.table("embeddings")
      .select(col("vec_id"), fast.as("f"), hof.as("h")).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      val h = r.getSeq[Double](2)
      assert(f == h, s"vec ${r.getLong(0)}: first diff at " +
        f.zip(h).indexWhere { case (a, b) => a != b })
    }
  }

  test("activation kernels are bit-identical to HOF spellings on real embeddings") {
    Tables.register(spark, "/root/testdata/sf0.001")
    val e = col("embedding")
    assertSameArrays(VectorFunctions.vecRelu(e), hofRelu(e))
    assertSameArrays(VectorFunctions.vecSigmoid(e), hofSigmoid(e))
    assertSameArrays(VectorFunctions.vecTanh(e), hofTanh(e))
    assertSameArrays(VectorFunctions.vecSilu(e), hofSilu(e))
    assertSameArrays(VectorFunctions.vecGelu(e), hofGelu(e))
    assertSameArrays(VectorFunctions.vecSoftmax(e), hofSoftmax(e))
    assertSameArrays(VectorFunctions.vecLayerNorm(e), hofLayerNorm(e))
    assertSameArrays(VectorFunctions.vecRmsNorm(e), hofRmsNorm(e))
  }

  test("scalar folds (sum / sumsq) are bit-identical on real embeddings") {
    Tables.register(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.graftshim.ColumnBridge
    val sumSq = ColumnBridge.column(
      graft.expressions.VecAggExpr(ColumnBridge.expr(col("embedding")), "sumsq"))
    val rows = spark.table("embeddings").select(
        VectorFunctions.vecSum(col("embedding")).as("f"),
        hofSum(col("embedding")).as("h"),
        sumSq.as("fsq"),
        hofSumSq(col("embedding")).as("hsq"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1))
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("null propagation matches the HOF graphs") {
    val df = Seq(
      (1L, Some(Seq(Some(1.0), Some(-2.0), Some(0.5)))), // clean
      (2L, Some(Seq(Some(1.0), None, Some(3.0)))),       // null element
      (3L, Some(Seq.empty[Option[Double]])),             // empty
      (4L, None)                                         // null array
    ).toDF("id", "v")

    def check(fast: Column, hof: Column, skipEmpty: Boolean = false): Unit = {
      val in = if (skipEmpty) df.filter(col("id") =!= 3) else df
      val rows = in.select(col("id"), fast.as("f"), hof.as("h"))
        .orderBy(col("id")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2), s"id ${r.getLong(0)} nullity")
        if (!r.isNullAt(1))
          assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"id ${r.getLong(0)}")
      }
    }
    check(VectorFunctions.vecGelu(col("v")), hofGelu(col("v")))
    check(VectorFunctions.vecSoftmax(col("v")), hofSoftmax(col("v")))
    // norm HOFs compute mean = sum/size eagerly, so under ANSI they
    // THROW on an empty array; the kernels return empty — skip the
    // empty row in the comparison and assert the improvement directly
    check(VectorFunctions.vecLayerNorm(col("v")), hofLayerNorm(col("v")), skipEmpty = true)
    check(VectorFunctions.vecRmsNorm(col("v")), hofRmsNorm(col("v")), skipEmpty = true)
    val emptyNorms = df.filter(col("id") === 3).select(
        VectorFunctions.vecLayerNorm(col("v")).as("ln"),
        VectorFunctions.vecRmsNorm(col("v")).as("rms")).collect().head
    assert(emptyNorms.getSeq[Any](0) == Seq.empty)
    assert(emptyNorms.getSeq[Any](1) == Seq.empty)
    // relu DEVIATES from its old greatest() spelling by design: the
    // kernel family propagates element nulls uniformly (greatest
    // coerced a null element to 0.0)
    val relu = df.select(col("id"), VectorFunctions.vecRelu(col("v")).as("f"))
      .orderBy(col("id")).collect()
    assert(relu(0).getSeq[Any](1) == Seq(1.0, 0.0, 0.5))
    assert(relu(1).getSeq[Any](1) == Seq(1.0, null, 3.0))
    assert(relu(2).getSeq[Any](1) == Seq.empty)
    assert(relu(3).isNullAt(1))
    // scalar fold: null element → NULL, empty → 0.0, null array → NULL
    val sums = df.select(col("id"), VectorFunctions.vecSum(col("v")).as("f"),
        hofSum(col("v")).as("h")).orderBy(col("id")).collect()
    sums.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id ${r.getLong(0)} sum nullity")
      if (!r.isNullAt(1)) assert(r.getDouble(1) == r.getDouble(2))
    }
  }

  test("SQL surface uses the codegen kernels and sum folds rewrite in SQL plans") {
    Tables.register(spark, "/root/testdata/sf0.001")
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT vec_id,
        |       aggregate(vec_gelu(embedding), CAST(0 AS DOUBLE), (s, x) -> s + x) AS gsum,
        |       aggregate(vec_layer_norm(embedding), CAST(0 AS DOUBLE), (s, x) -> s + x*x) AS lnsq
        |FROM embeddings""".stripMargin)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("vec_gelu"), plan.take(500))
    assert(plan.contains("vec_sum"), plan.take(500))
    assert(plan.contains("vec_sumsq"), plan.take(500))
    assert(!plan.contains("aggregate(lambda"), plan.take(500))
    assert(df.count() == 500)
  }
}
