package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The IMAGE path is real: payloads are actual PNG bytes and the
  * decode is JDK-only `javax.imageio` — pixel statistics come from
  * decoded pixels. Audio/video decode needs codecs this container
  * doesn't ship, so those kinds fall back to a clearly-marked
  * deterministic byte-fold signature (the documented stub); the
  * Spark-side shape — binary payloads, partition-parallel batch map,
  * fixed-length float feature contract — is the production shape
  * either way (equivalent to a Pandas-UDF `mapInPandas` stage in the
  * PySpark spelling). */
object Multimodal {

  // ImageIO's default stream cache is a synchronized temp-FILE cache —
  // 32 executor threads encoding/decoding tiny PNGs serialize on it
  // (and churn disk). Memory-cached streams remove the bottleneck.
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  /** Deterministic tiny PNG: a seeded RGB gradient, really encoded
    * through ImageIO — gives the image pipeline genuine bytes to
    * decode without shipping media assets. */
  def syntheticPng(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = java.lang.Math.floorMod(seed + x * 31 + y * 7, 256).toInt
        val g = java.lang.Math.floorMod(seed * 3 + x * 13 + y * 17, 256).toInt
        val b = java.lang.Math.floorMod(seed * 5 + x * 3 + y * 29, 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic byte-fold signature — the FALLBACK for media kinds
    * whose codecs aren't available (audio/video stub; a cluster
    * deployment swaps in a JNI/native decoder here). */
  def byteFoldFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + featurize. Image payloads decode through javax.imageio
    * and yield pixel statistics
    * [width, height, meanR, meanG, meanB, meanLuma, varLuma, aspect];
    * undecodable payloads (audio/video) take the byte-fold fallback. */
  def decodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null) byteFoldFeatures(payload, dim)
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb, sl, sl2) = (0.0, 0.0, 0.0, 0.0, 0.0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          val luma = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += luma; sl2 += luma * luma
          x += 1
        }
        y += 1
      }
      val n = (w * h).toDouble
      val out = new Array[Float](dim)
      val stats = Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n,
        sl / n, sl2 / n - (sl / n) * (sl / n), w.toDouble / h)
      var i = 0
      while (i < math.min(dim, stats.length)) { out(i) = stats(i).toFloat; i += 1 }
      out
    }
  }

  /** Partition-parallel featurize: binary in, fixed-dim float out.
    * No shuffle; scales with input partitions. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          decodeFeatures(r.payload, dim))
      }
    }
  }

  /** Builds a deterministic media table from documents: image rows
    * carry REAL PNG payloads (seeded synthetic bitmaps), audio/video
    * carry the text bytes as opaque payloads — exercising both the
    * real-decode and fallback paths end to end. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload =
            if (kind == "image") syntheticPng(id)
            else text.getBytes("UTF-8")
          val (w, h) =
            if (kind == "image") (8, 8)
            else ((id % 640 + 64).toInt, (id % 480 + 48).toInt)
          MediaRecord(id, kind, payload, w, h)
        }
      }
  }
}
