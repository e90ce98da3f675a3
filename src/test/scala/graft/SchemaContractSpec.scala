package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The generalized testdata drift guard: a regeneration that changes
  * any table's dtypes must produce ONE actionable diagnosis at
  * registration, not an AnalysisException cascade mid-query (the
  * round-5 `ts` outage, which normalizeTs fixed for one column —
  * SchemaContract covers all of them). */
class SchemaContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pristine driver tables register cleanly under the contract") {
    Tables.register(spark, "/root/testdata/sf0.001")
    assert(spark.table("events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("a deliberately mutated parquet is diagnosed in one line") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift")
    try {
      // copy sf0.001 but write events.value as STRING (kind change)
      // and drop documents.lang (missing column)
      for (n <- Tables.names) {
        val src = spark.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
        val mutated = n match {
          case "events" => src.withColumn("value", col("value").cast("string"))
          case "documents" => src.drop("lang")
          case _ => src
        }
        mutated.write.parquet(s"$tmp/$n.parquet")
      }
      val e = intercept[IllegalStateException] {
        // a FRESH session: Tables.register memoizes the last dir per
        // session, and the shared test session may already hold views
        val s2 = spark.newSession()
        Tables.register(s2, tmp.toString)
      }
      assert(e.getMessage.contains("schema drift"))
      assert(e.getMessage.contains("events.value read as string"))
      assert(e.getMessage.contains("extend Tables.normalizeTs"))
    } finally
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
  }

  test("violations catch missing columns and pass width-only drift") {
    import org.apache.spark.sql.types._
    // width drift (int64 keys -> int32) is allowed: both engines read
    // the same file, semantics unchanged
    val widthDrift = StructType(Seq(
      StructField("doc_id", IntegerType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", IntegerType)))
    assert(SchemaContract.violations("documents", widthDrift).isEmpty)
    val missing = StructType(widthDrift.fields.filterNot(_.name == "lang"))
    val v = SchemaContract.violations("documents", missing)
    assert(v.exists(_.startsWith("documents.lang missing")))
    // unknown tables (scratch frames) are unconstrained
    assert(SchemaContract.violations("scratch", widthDrift).isEmpty)
  }
}
