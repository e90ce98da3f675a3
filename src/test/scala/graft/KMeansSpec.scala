package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{KMeans, SimilaritySearch}

/** Spherical k-means convergence: the textbook Lloyd guarantees on
  * the real embeddings fixture. */
class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"
  def emb = Tables.table(spark, dir, "embeddings")

  test("objective (mean best-cosine) is non-decreasing across iterations") {
    val init = SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 4)
    val (_, hist) = KMeans.fit(emb, "embedding", maxIter = 4, tol = 0.0, init)
    assert(hist.nonEmpty)
    hist.sliding(2).foreach {
      case Seq(a, b) =>
        // 6-dp rounding of the report can shave <=1e-6 off a genuine
        // (tiny) improvement — allow exactly that much slack
        assert(b.objective >= a.objective - 1e-6,
          s"objective regressed: $a -> $b")
      case _ => ()
    }
  }

  test("fit is deterministic across runs and centroids are unit-norm") {
    val init = SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 4)
    val (c1, h1) = KMeans.fit(emb, "embedding", maxIter = 3, tol = 0.0, init)
    val (c2, h2) = KMeans.fit(emb, "embedding", maxIter = 3, tol = 0.0, init)
    assert(h1 == h2)
    assert(c1.zip(c2).forall { case (a, b) => a.sameElements(b) })
    c1.foreach { c =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-6, s"centroid norm $norm != 1")
    }
  }

  test("tol stops the loop once centroids stop moving") {
    val init = SimilaritySearch.sampledCodebook(emb, "vec_id", "embedding", 4)
    // a huge tolerance must stop after the first iteration
    val (_, hist) = KMeans.fit(emb, "embedding", maxIter = 5, tol = 1e9, init)
    assert(hist.length == 1)
  }

  test("the measured entry returns the convergence report") {
    val rows = EngineOps.queries("eng_kmeans_fit")(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("objective") > 0.0)
      assert(r.getAs[Int]("used_cells") > 0 && r.getAs[Int]("used_cells") <= 8)
    }
    // 1-based contiguous iteration index
    assert(rows.map(_.getAs[Int]("iter")).toSeq == (1 to rows.length))
  }
}
