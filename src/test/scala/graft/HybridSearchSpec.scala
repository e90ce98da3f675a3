package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.HybridSearch

/** RRF fusion: differential against a plain-Scala computation, plus
  * the defining property (a doc surfaced by both retrievers outranks
  * a doc surfaced by one at comparable rank). */
class HybridSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fuse matches a plain-Scala RRF computation (differential)") {
    val lex = Seq((10L, 9.0), (11L, 7.0), (12L, 5.0), (13L, 1.0))
    val den = Seq((12L, 0.9), (10L, 0.8), (14L, 0.7))
    val fused = HybridSearch.fuse(
      Seq(lex.toDF("id", "bm25"), den.toDF("id", "cos")), k = 10, k0 = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // independent plain-Scala oracle
    def ranks(run: Seq[(Long, Double)]): Map[Long, Int] =
      run.sortBy { case (id, s) => (-s, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1) }.toMap
    val (rl, rd) = (ranks(lex), ranks(den))
    val expected = (rl.keySet ++ rd.keySet).toSeq.map { id =>
      val s = rl.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0)
      (id, math.rint(s * 1e6) / 1e6, rl.contains(id).compare(false) + rd.contains(id).compare(false))
    }.sortBy { case (id, s, _) => (-s, id) }
    assert(fused.toSeq == expected.map { case (i, s, n) => (i, s, n.toLong) })
    // both-list docs (10, 12) beat every single-list doc
    val pos = fused.map(_._1).zipWithIndex.toMap
    assert(pos(10L) < pos(11L) && pos(12L) < pos(11L) && pos(10L) < pos(14L))
  }

  test("ties broken by id; single run degenerates to its own ranking") {
    val run = Seq((5L, 1.0), (3L, 1.0), (4L, 2.0)).toDF("id", "s")
    val fused = HybridSearch.fuse(Seq(run), k = 3).collect().map(_.getLong(0))
    assert(fused.toSeq == Seq(4L, 3L, 5L)) // score desc, then id asc on tie
  }

  test("eng_hybrid_search surfaces both modalities deterministically") {
    val a = EngineOps.queries("eng_hybrid_search")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val b = EngineOps.queries("eng_hybrid_search")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(a.toSeq == b.toSeq)
    assert(a.length == 15)
    assert(a.exists(_._3 == 2L), "no doc surfaced by both retrievers")
    // fused order is non-increasing in rrf_score
    assert(a.map(_._2).sliding(2).forall(w => w(0) >= w(1)))
  }
}
