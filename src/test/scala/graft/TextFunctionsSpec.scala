package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens and shingles") {
    val df = Seq(Tuple1("a b c d")).toDF("t")
    assert(df.select(tokenCount(col("t"))).collect().head.getInt(0) == 4)
    val sh = df.select(shingles(col("t"), 3).as("s")).collect().head.getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
  }

  test("shingles of a doc shorter than k fall back to the whole doc") {
    val df = Seq(Tuple1("a b")).toDF("t")
    val sh = df.select(shingles(col("t"), 5).as("s")).collect().head.getSeq[String](0)
    assert(sh == Seq("a b"))
  }

  test("fingerprint: deterministic, order-sensitive, content-sensitive") {
    val df = Seq(("a b c", "a b c"), ("a b c", "c b a"), ("a b c", "a b d"))
      .toDF("t1", "t2")
    val rows = df.select(docFingerprint(col("t1")).as("f1"),
      docFingerprint(col("t2")).as("f2")).collect()
    assert(rows(0).getLong(0) == rows(0).getLong(1))  // identical text
    assert(rows(1).getLong(0) != rows(1).getLong(1))  // order matters
    assert(rows(2).getLong(0) != rows(2).getLong(1))  // content matters
  }

  test("simhash: equal on identical text, close on near-dup, far on unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy cat again and again today"
    val far = "completely different words about spark queries and parquet columnar scans"
    val df = Seq((base, base), (base, near), (base, far)).toDF("t1", "t2")
    val h = df.select(
      bit_count(simHash(col("t1")).bitwiseXOR(simHash(col("t2")))).as("d"))
      .collect().map(_.getInt(0))
    assert(h(0) == 0)
    assert(h(1) < h(2)) // near-dup closer than unrelated
  }

  test("language id heuristic") {
    val df = Seq(
      Tuple1("the cat and the dog is in the house with food"),
      Tuple1("der hund und die katze ist nicht mit dem haus"),
      Tuple1("xyzzy qwerty asdfgh")).toDF("t")
    val langs = df.select(langId(col("t")).as("l")).collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en", "de", "und"))
  }

  test("quality score bounded in [0,1] and favors normal text") {
    val df = Seq(
      Tuple1("The project processes large datasets with distributed query engines " * 4),
      Tuple1("zz zz zz zz zz zz zz zz")).toDF("t")
    val q = df.select(qualityScore(col("t")).as("q")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }
}
