package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked deterministic STUB (media
  * codecs aren't in this container); everything Spark-side — schema,
  * partition-parallel batch shape, feature-vector contract — is real
  * and tested. On a cluster the stub body is replaced by a JNI/
  * native decoder; the operator shape (mapPartitions over binary
  * payloads, fixed-length float feature output) is the production
  * shape, equivalent to a Pandas-UDF `mapInPandas` stage in the
  * PySpark spelling. */
object Multimodal {

  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
                         width: Int, height: Int)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           features: Array[Float])

  /** STUB decode+featurize: a real implementation would decode the
    * payload and run a feature extractor; this deterministic fake
    * derives a fixed-length signature from payload bytes so tests
    * can assert exact values. Marked per the builder contract. */
  def stubDecodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    // ??? <- real decoder goes here; deterministic fake below
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-parallel featurize: binary in, fixed-dim float out.
    * No shuffle; scales with input partitions. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.payload.length,
          stubDecodeFeatures(r.payload, dim))
      }
    }
  }

  /** Builds a deterministic media table from documents (text bytes as
    * the opaque payload) — exercises the real binary-column path end
    * to end without codecs. */
  def mediaFromDocuments(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"))
      .as[MediaRecord]
  }
}
