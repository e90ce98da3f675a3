package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.sources.FixtureCache

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * All three paths decode for REAL with JDK-only decoders: IMAGE
  * payloads are actual PNG bytes through `javax.imageio` (pixel
  * statistics); AUDIO payloads are actual RIFF/WAV bytes through
  * `javax.sound.sampled` (amplitude statistics from decoded PCM);
  * VIDEO payloads are multi-frame containers of PNG frames decoded by
  * FRAME SAMPLING (first/middle/last through ImageIO — the bounded-
  * decode pattern production video featurization uses; a cluster
  * deployment swaps the GVID container parser for a real demuxer and
  * keeps the sampling shape). The byte-fold signature remains only as
  * the fallback for unrecognized payloads. The Spark-side shape —
  * binary payloads, partition-parallel batch map, fixed-length float
  * feature contract — is the production shape throughout (equivalent
  * to a Pandas-UDF `mapInPandas` stage in the PySpark spelling). */
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

  /** Deterministic tiny WAV: a seeded two-tone sinusoid as 16-bit
    * signed PCM mono, really encoded through javax.sound.sampled —
    * gives the audio pipeline genuine RIFF/WAV bytes to decode
    * without shipping media assets (the audio analog of
    * syntheticPng; ref analog: the sensor sample stream,
    * /root/reference/hive_arch.md §2). */
  def syntheticWav(seed: Long, nSamples: Int = 800,
                   sampleRate: Float = 8000f): Array[Byte] = {
    val f1 = 200.0 + java.lang.Math.floorMod(seed, 200)       // 200–399 Hz
    val f2 = 600.0 + java.lang.Math.floorMod(seed * 7, 400)   // 600–999 Hz
    val amp = 0.4 + java.lang.Math.floorMod(seed * 13, 100) / 250.0 // 0.4–0.8
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val t = i / sampleRate
      val v = amp * (0.7 * math.sin(2 * math.Pi * f1 * t) +
        0.3 * math.sin(2 * math.Pi * f2 * t))
      val s = math.max(-32768.0, math.min(32767.0, math.rint(v * 32767))).toInt
      pcm(2 * i) = (s & 0xff).toByte // little-endian per the format below
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV/PCM decode via JDK-only javax.sound.sampled: amplitude
    * statistics from decoded samples —
    * [sampleRate, nSamples, meanAmp, rms, peak, zeroCrossRate,
    *  durationSec, channels]. Returns null when the payload is not a
    * parseable 16-bit signed PCM WAV (caller falls back). */
  def wavFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (ais == null) return null
    val fmt = ais.getFormat
    if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16) return null
    val bytes = ais.readAllBytes()
    val big = fmt.isBigEndian
    val n = bytes.length / 2
    if (n == 0) return null
    var sum = 0.0; var sum2 = 0.0; var peak = 0.0; var zc = 0L; var prev = 0.0
    var i = 0
    while (i < n) {
      val s =
        if (big) (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
        else (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
      val v = s / 32768.0
      sum += v; sum2 += v * v; peak = math.max(peak, math.abs(v))
      if (i > 0 && ((prev < 0 && v >= 0) || (prev >= 0 && v < 0))) zc += 1
      prev = v
      i += 1
    }
    val stats = Array(
      fmt.getSampleRate.toDouble, n.toDouble, sum / n, math.sqrt(sum2 / n),
      peak, zc.toDouble / n, n / (fmt.getSampleRate * fmt.getChannels),
      fmt.getChannels.toDouble)
    val out = new Array[Float](dim)
    i = 0
    while (i < math.min(dim, stats.length)) { out(i) = stats(i).toFloat; i += 1 }
    out
  }

  /** Deterministic tiny "video": `frames` seeded PNG frames in a
    * length-prefixed container (magic "GVID", frame count, then
    * [len, png-bytes] per frame) — a real multi-frame payload whose
    * every frame decodes through ImageIO, without needing any codec
    * beyond the JDK. Consecutive frames share the seed lineage so
    * frame-to-frame motion is non-zero but bounded. */
  private val VideoMagic = Array[Byte]('G', 'V', 'I', 'D')
  def syntheticVideo(seed: Long, frames: Int = 6, w: Int = 8, h: Int = 8): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(frames)
    var i = 0
    while (i < frames) {
      val png = syntheticPng(seed * 31 + i * 7, w, h)
      out.writeInt(png.length)
      out.write(png)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Real video decode via FRAME SAMPLING — the production pattern
    * for video features at scale (decode a bounded sample of frames,
    * never the full stream): parses the GVID container, ImageIO-
    * decodes first/middle/last frames, and emits
    * [n_frames, w, h, lumaFirst, lumaLast, motion, lumaVar, aspect]
    * where motion is the mean absolute per-pixel luma delta between
    * consecutive SAMPLED frames. Returns null when the payload is not
    * a GVID container (caller falls back). */
  def videoFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = try {
    if (payload.length < 8 || !payload.take(4).sameElements(VideoMagic)) return null
    val in = new java.io.DataInputStream(new ByteArrayInputStream(payload))
    in.skipBytes(4)
    val n = in.readInt()
    if (n <= 0 || n > 100000) return null
    // frame offsets via the length prefixes; decode a bounded sample
    val sampleIdx = Seq(0, n / 2, n - 1).distinct
    val wanted = sampleIdx.toSet
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, BufferedImage)]
    var i = 0
    while (i < n && frames.size < wanted.size) {
      val len = in.readInt()
      if (len < 0 || len > payload.length) return null
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      if (wanted(i)) {
        val img = try ImageIO.read(new ByteArrayInputStream(bytes))
        catch { case _: Throwable => null }
        if (img == null) return null
        frames += ((i, img)) // real per-frame decode
      }
      i += 1
    }
    if (frames.isEmpty) return null
    def lumaGrid(img: BufferedImage): Array[Double] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val g = new Array[Double](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          g(y * w + x) = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      g
    }
    val grids = frames.map { case (idx, img) => (idx, lumaGrid(img), img) }
    val first = grids.head
    val last = grids.last
    def mean(a: Array[Double]) = a.sum / a.length
    val motion =
      if (grids.size < 2) 0.0
      else {
        val gs = grids.map(_._2)
        gs.sliding(2).map { pair =>
          val (a, b) = (pair(0), pair(1))
          var s = 0.0
          var j = 0
          while (j < a.length) { s += math.abs(a(j) - b(j)); j += 1 }
          s / a.length
        }.sum / (grids.size - 1)
      }
    val allLuma = grids.flatMap(_._2)
    val m = mean(allLuma.toArray)
    val lumaVar = allLuma.map(x => (x - m) * (x - m)).sum / allLuma.size
    val (w, h) = (first._3.getWidth, first._3.getHeight)
    val stats = Array(n.toDouble, w.toDouble, h.toDouble,
      mean(first._2), mean(last._2), motion, lumaVar, w.toDouble / h)
    val out = new Array[Float](dim)
    i = 0
    while (i < math.min(dim, stats.length)) { out(i) = stats(i).toFloat; i += 1 }
    out
  } catch {
    // a truncated container (magic + count but missing frame bytes)
    // hits readInt/readFully EOF — that's "not a parseable GVID",
    // which the contract says is a null (caller byte-folds), never a
    // task-killing exception
    case _: java.io.IOException => null
  }

  /** Deterministic byte-fold signature — the FALLBACK for payloads no
    * decoder recognizes (a cluster deployment swaps in a JNI/native
    * decoder for real container formats here). */
  def byteFoldFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Decode + featurize — every kind decodes for real. Image payloads
    * decode through javax.imageio and yield pixel statistics
    * [width, height, meanR, meanG, meanB, meanLuma, varLuma, aspect];
    * WAV payloads decode through javax.sound.sampled (amplitude
    * statistics, wavFeatures); GVID multi-frame payloads decode via
    * frame sampling (videoFeatures); only payloads no decoder
    * recognizes take the byte-fold fallback. */
  def decodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case _: Throwable => null }
    if (img == null) {
      val vid = videoFeatures(payload, dim)
      if (vid != null) return vid
      val wav = wavFeatures(payload, dim)
      if (wav != null) wav else byteFoldFeatures(payload, dim)
    }
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

  /** Materializes the image-kind synthetic payloads as individual
    * `media_<id>.png` FILES under scratch, once per sf dir — the
    * binary-file ingest fixture (at 100 TB, media lives as objects in
    * storage, not parquet columns; this stands in for that object
    * store). Executor-parallel writes (local[*] shares one FS; a
    * cluster fixture would land in the object store instead); the
    * `_DONE` marker carries a fingerprint of the source documents
    * table (FixtureCache), so re-runs are free but a regenerated
    * dataset or a bumped generator version rebuilds the fixture
    * instead of silently serving stale files. Returns the fixture
    * path. */
  def ensurePngFixture(documents: DataFrame, sfDir: String): String = {
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_png_fixture_$sfName")
    val fp = FixtureCache.fingerprint(
      s"$sfDir/documents.parquet", "png_fixture_v1")
    FixtureCache.ensure(out, fp) {
      val spark = documents.sparkSession
      import spark.implicits._
      val outPath = out.getAbsolutePath
      documents.select(col("doc_id")).as[Long]
        .filter((id: Long) => id % 3 == 0) // the image-kind ids
        .foreachPartition { (it: Iterator[Long]) =>
          it.foreach { id =>
            val f = new java.io.File(outPath, s"media_$id.png")
            if (!f.exists()) {
              val tmp = new java.io.File(outPath, s".media_$id.tmp")
              java.nio.file.Files.write(tmp.toPath, syntheticPng(id))
              tmp.renameTo(f)
            }
          }
        }
    }
    out.getAbsolutePath
  }

  /** Builds a deterministic media table from documents: image rows
    * carry REAL PNG payloads (seeded synthetic bitmaps), audio rows
    * REAL WAV payloads (seeded synthetic PCM), video rows REAL GVID
    * multi-frame payloads (seeded PNG frames) — every kind exercises
    * a genuine decoder end to end; the byte-fold fallback remains for
    * unrecognized payloads only. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    // ids only: all three payload kinds are seeded synthetics now, so
    // the text column never needs to leave the scan
    documents.select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val kind = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload = kind match {
            case "image" => syntheticPng(id)
            case "audio" => syntheticWav(id)
            case _ => syntheticVideo(id)
          }
          val (w, h) =
            if (kind == "image") (8, 8)
            else ((id % 640 + 64).toInt, (id % 480 + 48).toInt)
          MediaRecord(id, kind, payload, w, h)
        }
      }
  }
}
