package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BpeTrain

/** BPE training/apply (BpeTrain + BpeEncodeExpr): differential vs an
  * independent naive reference implementation, structural invariants,
  * and the end-to-end entry. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  // ---- independent naive reference (full pair recount per merge; no
  // shared code with BpeTrain.train's incremental index) -------------
  private def naiveTrain(wordFreq: Seq[(String, Long)],
                         nMerges: Int): Seq[(String, String)] = {
    var words: Seq[(Vector[String], Long)] = wordFreq.map { case (w, f) =>
      (w.map(_.toString).toVector :+ BpeTrain.Eow, f)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var exhausted = false
    while (step < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += best._1 + best._2; j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.toVector, f)
        }
        step += 1
      }
    }
    merges.toSeq
  }

  val tinyCorpus: Seq[(String, Long)] = Seq(
    "low" -> 5L, "lower" -> 2L, "lowest" -> 1L,
    "newer" -> 6L, "newest" -> 3L, "wider" -> 3L, "wide" -> 2L)

  test("incremental trainer matches the naive full-recount reference") {
    for (n <- Seq(1, 5, 10, 25)) {
      val fast = BpeTrain.train(tinyCorpus, n).merges
      val slow = naiveTrain(tinyCorpus, n)
      assert(fast == slow, s"divergence at nMerges=$n")
    }
  }

  test("trainer is invariant to word-frequency input order") {
    val a = BpeTrain.train(tinyCorpus, 20).merges
    val b = BpeTrain.train(tinyCorpus.reverse, 20).merges
    assert(a == b)
  }

  test("the classic Sennrich example learns word-final units first") {
    // 'e'+'r' and er+'</w>' dominate (newer/wider/lower share -er)
    val m = BpeTrain.train(tinyCorpus, 4).merges
    assert(m.contains(("e", "r")) || m.contains(("r", BpeTrain.Eow)),
      s"expected an -er family merge in first 4, got $m")
  }

  test("encodeWord reconstructs the word and never expands past chars+1") {
    val model = BpeTrain.train(tinyCorpus, 30)
    val ranks = model.ranks
    for (w <- Seq("low", "lowest", "newer", "wide", "unseen", "a", "xyzzy")) {
      val pieces = BpeTrain.encodeWord(w, ranks)
      assert(pieces.mkString.stripSuffix(BpeTrain.Eow) == w,
        s"lossless reconstruction failed for '$w': ${pieces.toSeq}")
      assert(pieces.length <= w.length + 1)
    }
  }

  test("training words compress to few symbols; merges grow vocab monotonically") {
    val model = BpeTrain.train(tinyCorpus, 50)
    val ranks = model.ranks
    // frequent training words should collapse to 1-2 symbols
    assert(BpeTrain.encodeWord("newer", ranks).length <= 2)
    assert(BpeTrain.encodeWord("low", ranks).length <= 2)
    // each merge concatenates two existing symbols: replaying the list
    // must only reference symbols already derivable (chars/Eow or
    // earlier merge outputs)
    val derivable = scala.collection.mutable.Set[String](BpeTrain.Eow)
    tinyCorpus.foreach(_._1.foreach(c => derivable += c.toString))
    model.merges.foreach { case (a, b) =>
      assert(derivable(a) && derivable(b), s"merge ($a,$b) references unknown symbol")
      derivable += a + b
    }
  }

  test("token count is non-increasing in the number of merges") {
    val counts = Seq(0, 5, 15, 40).map { n =>
      val ranks = BpeTrain.train(tinyCorpus, n).ranks
      tinyCorpus.map { case (w, f) => BpeTrain.encodeWord(w, ranks).length * f }.sum
    }
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
  }

  test("bpeEncode column kernel agrees with the driver-side encoder") {
    import spark.implicits._
    val model = BpeTrain.fit(Tables.table(spark, dir, "documents"), "text",
      nMerges = 80)
    val words = Seq("the", "training", "pipeline", "zzzq")
    val viaExpr = words.toDF("w")
      .select(BpeTrain.bpeEncode($"w", model).as("p"))
      .collect().map(_.getSeq[String](0).toSeq)
    val viaDriver = words.map(w => BpeTrain.encodeWord(w, model.ranks).toSeq)
    assert(viaExpr.toSeq == viaDriver)
  }

  test("eng_bpe_train entry: per-source stats, compression < 1 subword/char") {
    val rows = EngineOps.queries("eng_bpe_train")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val nSub = r.getAs[Long]("n_subwords")
      assert(nSub >= nWords, "each word yields at least one subword")
      val spw = r.getAs[Double]("subwords_per_word")
      assert(spw >= 1.0 && spw < 8.0, s"implausible subwords_per_word $spw")
      assert(r.getAs[Int]("n_merges") > 0)
    }
  }
}
