package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The sf-derivation behind the scale-evidence bench must preserve
  * the generator's distributions, not manufacture pathologies:
  * consistent key shifts (join integrity), decorrelated replica text
  * (no planted near-dup explosion), norm-preserving embedding
  * rotation. */
class ScaleDataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dst = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale_spec").toString
    ScaleData.scale(spark, "/root/testdata/sf0.001", tmp, factor = 3)
    tmp
  }
  private def src(t: String) = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
  private def out(t: String) = spark.read.parquet(s"$dst/$t.parquet")

  test("row counts and distinct keys scale by the factor; dims copy unchanged") {
    for ((t, k) <- Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
      "customer" -> "c_custkey", "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id")) {
      assert(out(t).count() == 3 * src(t).count(), s"$t rows")
      val sd = src(t).select(countDistinct(col(k))).head().getLong(0)
      assert(out(t).select(countDistinct(col(k))).head().getLong(0) == 3 * sd, s"$t keys")
    }
    assert(out("nation").count() == src("nation").count())
    assert(out("region").count() == src("region").count())
  }

  test("foreign keys shift consistently: no orphan facts") {
    val orphans = out("lineitem")
      .join(out("orders"), col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count()
    assert(orphans == 0L, s"$orphans lineitems lost their order")
    val custOrphans = out("orders")
      .join(out("customer"), col("o_custkey") === col("c_custkey"), "left_anti")
      .count()
    assert(custOrphans == 0L)
  }

  test("replica documents are perturbed, not near-duplicates") {
    // no two docs share text verbatim across replicas
    val dupTexts = out("documents").groupBy(col("text"))
      .count().filter(col("count") > 1).count()
    assert(dupTexts == 0L)
    // perturbation knocks out shingle overlap: an original and its
    // replica share < 40% of 5-gram shingles (1-in-5 words replaced
    // breaks ~every 5-gram window)
    val stride = src("documents").agg(max(col("doc_id"))).head().getLong(0) + 1
    val sh = out("documents").select(col("doc_id"),
      explode(graft.functions.TextFunctions.shingles(col("text"), 5)).as("s"))
    val orig = sh.filter(col("doc_id") < stride)
      .withColumnRenamed("doc_id", "o_id")
    val repl = sh.filter(col("doc_id") >= stride && col("doc_id") < stride * 2)
      .withColumn("o_id", col("doc_id") - stride).drop("doc_id")
    // every 5-word window contains one replaced index (i ≡ 4 mod 5),
    // so the expected overlap is ~0; avg over an empty join is NULL
    val overlap = orig.join(repl, Seq("o_id", "s"))
      .groupBy(col("o_id")).agg(count(lit(1)).as("common"))
      .join(orig.groupBy(col("o_id")).agg(count(lit(1)).as("total")), Seq("o_id"))
      .select(coalesce(avg(col("common") / col("total")), lit(0.0)))
      .head().getDouble(0)
    assert(overlap < 0.4, f"replica shingle overlap $overlap%.3f too high")
  }

  test("embedding rotation preserves norms and decorrelates replicas") {
    val norms = out("embeddings")
      .select(sqrt(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))).as("n"))
      .agg(min(col("n")), max(col("n"))).head()
    assert(math.abs(norms.getDouble(0) - 1.0) < 1e-3 &&
      math.abs(norms.getDouble(1) - 1.0) < 1e-3)
  }
}
