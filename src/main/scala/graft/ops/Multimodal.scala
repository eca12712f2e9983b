package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed partition-wise in batches (the Scala
  * analog of `mapInPandas` batch processing).
  *
  * The actual image/audio DECODE is a clearly-marked STUB — no codec
  * libraries ship in this container — but everything Spark-side is real and
  * tested: schema, typed Dataset boundaries, partition-wise batch iteration,
  * and deterministic outputs so downstream joins/tests are stable. Swapping
  * `StubCodecs` for a real decoder changes no plumbing.
  */
object Multimodal {

  final case class MediaRow(doc_id: String, media_ref: String, bytes: Array[Byte])
  final case class DecodedImage(doc_id: String, media_ref: String,
                                width: Int, height: Int, format: String,
                                feature: Array[Float])
  final case class FrameSample(doc_id: String, media_ref: String,
                               frame_idx: Int, frame_hash: Long)

  /** STUB codec boundary: deterministic fakes derived from the payload
    * bytes. Replace with real imageio/ffmpeg calls in production. */
  object StubCodecs {
    def decodeImage(bytes: Array[Byte]): (Int, Int, String) = {
      val h = java.util.Arrays.hashCode(bytes)
      (64 + math.abs(h % 512), 64 + math.abs((h / 512) % 512),
        if (h % 2 == 0) "png" else "jpeg")
    }
    def extractFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
      val rng = new scala.util.Random(java.util.Arrays.hashCode(bytes).toLong)
      Array.fill(dim)(rng.nextFloat())
    }
    def sampleFrames(bytes: Array[Byte], every: Int): Seq[Long] = {
      val n = math.max(1, bytes.length / every)
      (0 until n).map(i => java.util.Arrays.hashCode(bytes).toLong * 31 + i)
    }
  }

  /** Materializes a media table from the docs view: one row per interleaved
    * media span, with a deterministic synthetic payload derived from the
    * media_ref (the fixture stand-in for fetching the blob). */
  def mediaTable(view: DataFrame): DataFrame =
    view.select(col("doc_id"), explode(col("media_refs")).as("media_ref"))
      .withColumn("bytes",
        // deterministic pseudo-payload: sha2 of the ref, repeated
        to_binary(concat(Seq.fill(4)(sha2(col("media_ref"), 256)): _*), lit("hex")))

  /** Batch image decode + feature extraction: partition-wise typed
    * mapPartitions (no per-row task overhead, no driver collect). The
    * partitioning of the input is preserved — callers repartition by doc_id
    * upstream if they need co-location with the docs table. */
  def decodeImages(media: DataFrame, featureDim: Int = 16): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "bytes").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, fmt) = StubCodecs.decodeImage(r.bytes)
          DecodedImage(r.doc_id, r.media_ref, w, h, fmt,
            StubCodecs.extractFeature(r.bytes, featureDim))
        }
      }
  }

  /** Frame sampling for video-like payloads, one output row per frame. */
  def sampleFrames(media: DataFrame, everyBytes: Int = 64): Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "bytes").as[MediaRow]
      .flatMap { r =>
        StubCodecs.sampleFrames(r.bytes, everyBytes).zipWithIndex.map {
          case (hash, i) => FrameSample(r.doc_id, r.media_ref, i, hash)
        }
      }
  }
}
