package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthetic PNG round-trips through the real ImageIO decode") {
    val png = Multimodal.syntheticPng(42L)
    val f = Multimodal.decodeFeatures(png)
    assert(f(0) == 8.0f && f(1) == 8.0f)      // decoded width/height
    assert(f(7) == 1.0f)                      // aspect ratio
    assert(f(2) >= 0f && f(2) <= 255f)        // mean R in pixel range
    assert(f(6) > 0f)                         // gradient ⇒ nonzero luma variance
    // determinism: same seed, same features
    assert(Multimodal.decodeFeatures(Multimodal.syntheticPng(42L)).sameElements(f))
    // different seed, different pixels
    assert(!Multimodal.decodeFeatures(Multimodal.syntheticPng(43L)).sameElements(f))
  }

  test("non-image payloads take the deterministic byte-fold fallback") {
    val payload = "not an image".getBytes("UTF-8")
    val f = Multimodal.decodeFeatures(payload)
    assert(f.sameElements(Multimodal.byteFoldFeatures(payload)))
  }

  test("featurize pipeline: real decode for images, fallback for audio/video") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon"))
      .toDF("doc_id", "text")
    val feats = Multimodal.featurize(Multimodal.mediaFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).kind == "image")
    assert(feats(0L).features(0) == 8.0f)     // decoded, not byte-folded
    assert(feats(1L).kind == "audio")
    assert(feats(1L).features.sameElements(
      Multimodal.byteFoldFeatures("gamma delta".getBytes("UTF-8"))))
    assert(feats(2L).kind == "video")
  }
}
