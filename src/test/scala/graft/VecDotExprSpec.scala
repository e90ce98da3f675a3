package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, VectorFunctions}

class VecDotExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen dot product is bit-identical to the HOF fold on real embeddings") {
    Tables.register(spark, "/root/testdata/sf0.001")
    GraftFunctions.register(spark)
    val probe = spark.table("embeddings").filter(col("vec_id") === 0)
      .select(col("embedding").as("p"))
    val both = spark.table("embeddings").crossJoin(probe)
      .select(col("vec_id"),
        GraftFunctions.vecDotFast(col("embedding"), col("p")).as("fast"),
        VectorFunctions.vecDotHof(col("embedding"), col("p")).as("hof"))
      .collect()
    assert(both.length == 500)
    both.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: ${r.getDouble(1)} != ${r.getDouble(2)}")
    }
  }

  test("vec_dot_fast works from SQL and handles nulls") {
    GraftFunctions.register(spark)
    Seq((Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
        (None, Some(Seq(1.0f))))
      .toDF("a", "b").createOrReplaceTempView("vd")
    val rows = spark.sql("SELECT vec_dot_fast(a, b) AS d FROM vd ORDER BY d NULLS FIRST")
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("mixed float/double arrays are supported") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot_fast(array(1.0D, 2.0D), cast(array(3, 4) as array<double>)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
  }
}
