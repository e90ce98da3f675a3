package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LmScore

/** Trigram-LM scoring: in-language text must outscore out-of-language
  * text under the same language's model, and the measured engine
  * entry must be a non-empty per-lang report. */
class LmScoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // two synthetic "languages" with disjoint character inventories
  private val enDocs = Seq(
    "the cat sat on the mat and the dog ran",
    "a cat and a dog sat near the red mat",
    "the dog and the cat ran to the mat")
  private val zzDocs = Seq(
    "zyx wvu zyx qpo zyx wvu qpo zyx",
    "qpo zyx wvu qpo wvu zyx qpo wvu",
    "wvu qpo zyx wvu qpo zyx wvu qpo")

  test("in-language docs score strictly higher than out-of-language docs") {
    val train = (enDocs.map(("en", _)) ++ zzDocs.map(("zz", _)))
      .toDF("lang", "text")
    val model = LmScore.trigramModel(train)
    // score one held-out-ish doc of each language under BOTH models
    val probes = Seq(
      (1L, "en", "the cat ran and the dog sat"),   // in-language
      (2L, "en", "zyx qpo wvu zyx qpo wvu"),       // wrong model
      (3L, "zz", "zyx wvu qpo zyx"),               // in-language
      (4L, "zz", "the cat sat on the mat"))        // wrong model
      .toDF("doc_id", "lang", "text")
    val scores = LmScore.scoreDocs(probes, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L),
      s"en model: in-lang ${scores(1L)} !> out-of-lang ${scores(2L)}")
    assert(scores(3L) > scores(4L),
      s"zz model: in-lang ${scores(3L)} !> out-of-lang ${scores(4L)}")
  }

  test("OOV trigrams score the smoothing floor, not null") {
    val train = enDocs.map(("en", _)).toDF("lang", "text")
    val model = LmScore.trigramModel(train)
    val allOov = Seq((9L, "en", "00 11 22 33 44 55")).toDF("doc_id", "lang", "text")
    val out = LmScore.scoreDocs(allOov, model).collect()
    assert(out.length == 1 && !out(0).isNullAt(2))
    val floor = model.agg(min(col("floor"))).head().getDouble(0)
    assert(math.abs(out(0).getDouble(2) - floor) < 1e-9)
  }

  test("compiled scorer matches the relational spelling on the corpus") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val model = LmScore.trigramModel(docs)
    val rel = LmScore.scoreDocs(docs, model)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ker = LmScore.scoreDocsCompiled(docs, LmScore.collectModel(model))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(ker.keySet == rel.keySet)
    // summation order differs (hash aggregate vs sequential pass)
    val worst = rel.map { case (k, v) => math.abs(ker(k) - v) }.max
    assert(worst < 1e-9, s"worst kernel/relational divergence $worst")
  }

  test("eng_lm_score report is deterministic and covers every language") {
    val df = EngineOps.queries("eng_lm_score")(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val langs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("lang").distinct().count()
    assert(rows.length == langs)
    // repeated run bit-identical (aggregates are rounded in the report)
    assert(df.collect().toSeq == rows.toSeq)
  }
}
