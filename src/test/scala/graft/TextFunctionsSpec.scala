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

  test("repetition stats kernel: hand-computed goldens + short-doc null") {
    // "a b a b c": bigrams = [a b, b a, a b, b c] → n=4, uniq=3,
    // rep_cnt=2 ("a b" twice).
    val df = Seq(("a b a b c"), ("x y"), ("solo"), ("a  b")).toDF("t")
    val rows = df.select(repetitionStats(col("t")).as("st")).collect()
    val r0 = rows(0).getStruct(0)
    assert((r0.getLong(0), r0.getInt(1), r0.getLong(2)) == ((2L, 3, 4L)))
    val r1 = rows(1).getStruct(0)
    assert((r1.getLong(0), r1.getInt(1), r1.getLong(2)) == ((0L, 1, 1L)))
    assert(rows(2).isNullAt(0))              // 1 token → NULL
    // consecutive spaces produce an empty token (split(' ') parity):
    // tokens [a, "", b] → bigrams ["a ", " b"] → n=2, uniq=2, rep=0
    val r3 = rows(3).getStruct(0)
    assert((r3.getLong(0), r3.getInt(1), r3.getLong(2)) == ((0L, 2, 2L)))
  }

  test("ql11 kernel impl == relational spelling (parity)") {
    val dir = "/root/testdata/sf0.001"
    Tables.register(spark, dir)
    val impl = QueryInventory.ql11.impl.get(spark, dir).collect().toSeq
    val sql = spark.sql(QueryInventory.ql11.sparkSql).collect().toSeq
    assert(impl == sql)
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

  test("compiled lang_id kernel matches the HOF spelling on the corpus") {
    // full-corpus parity, including the struct-array_max tie-break
    // (later language code wins a score tie) and null propagation
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .union(Seq(Tuple1(null: String), Tuple1(""), Tuple1("   "),
        // 'le la' (fr) vs 'el es' (es): equal-score tie → fr
        // (lexicographically later code wins the struct array_max)
        Tuple1("le la el es")).toDF("text"))
    val mismatches = docs
      .select(langId(col("text")).as("k"), langIdHof(col("text")).as("h"))
      .where(not(col("k") <=> col("h")))
      .count()
    assert(mismatches == 0L)
  }

  test("quality score bounded in [0,1] and favors normal text") {
    val df = Seq(
      Tuple1("The project processes large datasets with distributed query engines " * 4),
      Tuple1("zz zz zz zz zz zz zz zz")).toDF("t")
    val q = df.select(qualityScore(col("t")).as("q")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(0) > q(1))
  }

  test("wordpiece: greedy longest match against hand-tokenized goldens") {
    // the classic BERT example vocab
    val vocab = Seq("un", "##aff", "##able", "aff", "##ord",
      "hug", "##ging", "##s", "face", "b", "##ook")
    val df = Seq(
      Tuple1("unaffable"),          // un ##aff ##able
      Tuple1("huggings face"),      // hug ##ging ##s | face
      Tuple1("book"),               // b ##ook
      Tuple1("unknownword"),        // no piece at some position -> [UNK]
      Tuple1("  unaffable   book ") // whitespace runs collapse
    ).toDF("t")
    val got = df.select(wordpieceTokenize(col("t"), vocab).as("p"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(got == List(
      List("un", "##aff", "##able"),
      List("hug", "##ging", "##s", "face"),
      List("b", "##ook"),
      List("[UNK]"),
      List("un", "##aff", "##able", "b", "##ook")))
  }

  test("wordpiece: default vocab has total coverage and counts are consistent") {
    val df = Seq(
      Tuple1("Training data pipelines tokenize the words deterministically."),
      Tuple1("")).toDF("t")
    val rows = df.select(wordpieceTokenize(col("t")).as("p"),
      wordpieceCount(col("t")).as("n")).collect()
    assert(!rows(0).getSeq[String](0).contains("[UNK]"))
    assert(rows(0).getSeq[String](0).size == rows(0).getInt(1))
    // common subwords compress below char level
    assert(rows(0).getInt(1) < "Training data pipelines tokenize the words deterministically.".count(_ != ' '))
    assert(rows(1).getSeq[String](0).isEmpty && rows(1).getInt(1) == 0)
    // null text -> null pieces
    val nulls = Seq((1L, None: Option[String])).toDF("id", "t")
      .select(wordpieceTokenize(col("t")).as("p")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("wordpiece runs from SQL via the registered function") {
    graft.functions.GraftFunctions.register(spark)
    Seq(Tuple1("the model trains")).toDF("t").createOrReplaceTempView("wp_t")
    val r = spark.sql("SELECT wordpiece_count(t) AS n, wordpiece_tokenize(t) AS p FROM wp_t")
      .collect().head
    assert(r.getInt(0) == r.getSeq[String](1).size)
    assert(r.getInt(0) >= 3)
  }
}
