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

  test("undecodable payloads take the deterministic byte-fold fallback") {
    val payload = "not an image or wav".getBytes("UTF-8")
    val f = Multimodal.decodeFeatures(payload)
    assert(f.sameElements(Multimodal.byteFoldFeatures(payload)))
  }

  test("synthetic WAV round-trips through the real javax.sound decode (differential)") {
    val seed = 42L
    val wav = Multimodal.syntheticWav(seed, nSamples = 800, sampleRate = 8000f)
    // RIFF/WAVE container magic — these really are WAV bytes
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val f = Multimodal.decodeFeatures(wav)
    // differential oracle: regenerate the same samples in plain Scala
    // and compute the stats directly, no audio API involved
    val f1 = 200.0 + java.lang.Math.floorMod(seed, 200)
    val f2 = 600.0 + java.lang.Math.floorMod(seed * 7, 400)
    val amp = 0.4 + java.lang.Math.floorMod(seed * 13, 100) / 250.0
    val samples = (0 until 800).map { i =>
      val t = i / 8000f
      val v = amp * (0.7 * math.sin(2 * math.Pi * f1 * t) +
        0.3 * math.sin(2 * math.Pi * f2 * t))
      math.max(-32768.0, math.min(32767.0, math.rint(v * 32767))).toInt / 32768.0
    }
    val rms = math.sqrt(samples.map(v => v * v).sum / samples.length)
    val peak = samples.map(math.abs).max
    assert(f(0) == 8000f && f(1) == 800f)          // sample rate, count
    assert(math.abs(f(2) - samples.sum / 800) < 1e-6) // mean amplitude
    assert(math.abs(f(3) - rms) < 1e-6)            // RMS from decoded PCM
    assert(math.abs(f(4) - peak) < 1e-6)           // peak
    assert(f(5) > 0f && f(5) < 1f)                 // zero-cross rate sane
    assert(math.abs(f(6) - 0.1f) < 1e-6)           // 800 / 8000 Hz = 0.1 s
    assert(f(7) == 1f)                             // mono
    // determinism + seed sensitivity, same discipline as the PNG path
    assert(Multimodal.decodeFeatures(Multimodal.syntheticWav(seed)).sameElements(f))
    assert(!Multimodal.decodeFeatures(Multimodal.syntheticWav(seed + 1)).sameElements(f))
  }

  test("synthetic video round-trips through per-frame ImageIO decode (differential)") {
    val vid = Multimodal.syntheticVideo(9L, frames = 6)
    assert(new String(vid.take(4), "US-ASCII") == "GVID")
    val f = Multimodal.decodeFeatures(vid)
    assert(f(0) == 6f && f(1) == 8f && f(2) == 8f) // frames, w, h
    // differential oracle: decode the sampled frames (0, 3, 5)
    // independently via the image path and recompute luma means
    def luma(seed: Long): Double = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.syntheticPng(seed)))
      val vals = for (y <- 0 until 8; x <- 0 until 8) yield {
        val rgb = img.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
      }
      vals.sum / vals.size
    }
    assert(math.abs(f(3) - luma(9L * 31)) < 1e-3)      // first frame
    assert(math.abs(f(4) - luma(9L * 31 + 5 * 7)) < 1e-3) // last frame
    assert(f(5) > 0f)                                  // frames differ ⇒ motion
    assert(f(7) == 1f)                                 // aspect
    // determinism + seed sensitivity
    assert(Multimodal.decodeFeatures(Multimodal.syntheticVideo(9L)).sameElements(f))
    assert(!Multimodal.decodeFeatures(Multimodal.syntheticVideo(10L)).sameElements(f))
  }

  test("truncated GVID payload byte-folds instead of failing the task") {
    // magic + frame count but no frame bytes: readFully would EOF —
    // the contract is null → byteFold fallback, never an exception
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(Array[Byte]('G', 'V', 'I', 'D')); out.writeInt(5); out.flush()
    val truncated = bos.toByteArray
    assert(Multimodal.videoFeatures(truncated) == null)
    val f = Multimodal.decodeFeatures(truncated)
    assert(f != null && f.length == 8) // the byte-fold fallback ran
  }

  test("featurize pipeline: real decode for all three kinds") {
    val docs = Seq((0L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon"))
      .toDF("doc_id", "text")
    val feats = Multimodal.featurize(Multimodal.mediaFromDocuments(docs))
      .collect().map(f => f.media_id -> f).toMap
    assert(feats(0L).kind == "image")
    assert(feats(0L).features(0) == 8.0f)     // decoded, not byte-folded
    assert(feats(1L).kind == "audio")
    assert(feats(1L).features(0) == 8000f)    // decoded sample rate
    assert(feats(1L).features(1) == 800f)     // decoded sample count
    assert(feats(2L).kind == "video")
    assert(feats(2L).features(0) == 6f)       // decoded frame count
    assert(feats(2L).features(5) > 0f)        // real inter-frame motion
  }

  test("binary-file ingest equals the column path's image summary") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val viaFiles = EngineOps.queries("eng_binary_ingest")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // the column path, restricted to the image kind, summarized the
    // same way — the two ingest shapes must agree exactly
    val media = Multimodal.mediaFromDocuments(
      Tables.table(spark, dir, "documents")).filter(_.kind == "image")
    val viaColumn = Multimodal.featurize(media).toDF()
      .select(col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_media"), sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("f0")), 4).as("avg_f0"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(viaFiles == viaColumn)
    assert(viaFiles.head._2 > 0)
  }
}
