package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media payload: opaque bytes + typed metadata. In production the
  * payload column holds image/audio/video bytes; the corpus has no
  * binary tables, so `fromDocuments` materializes payloads from the
  * documents table (utf-8 bytes) — the PLUMBING (schema, partitioning,
  * batch shape) is the deliverable, the codec is a seam. */
final case class MediaRecord(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    source: String)

final case class MediaFeature(
    media_id: Long,
    media_type: String,
    n_bytes: Long,
    feature: Array[Float])

/** A transformed payload (resize output): new bytes + both dimensions. */
final case class MediaResized(
    media_id: Long,
    media_type: String,
    orig_bytes: Long,
    resized_bytes: Long,
    payload: Array[Byte])

/** One sampled frame of a payload (frame-sample output): every input
  * row explodes into `frame_idx` rows of frame bytes. */
final case class MediaFrame(
    media_id: Long,
    frame_idx: Int,
    n_frames: Int,
    frame: Array[Byte])

/** Multimodal-column operators.
  *
  * Decode/feature-extraction runs per PARTITION (one codec instance per
  * task, amortized over its rows — the mapInPandas batch pattern in
  * Dataset form), never per row, and never on the driver. The actual
  * codec is injected; the default is `stubDecoder`, a deterministic
  * fake (image/audio libs are not in this container) clearly marked as
  * the production seam. Everything around it — encoders, schema,
  * partition mapping, metadata derivation — is real and tested.
  */
object Multimodal {

  /** Production seam: replace with a real codec (JPEG decode, resize,
    * mel-spectrogram, frame sampling…). The stub derives a deterministic
    * 8-dim feature from payload bytes so tests pin the plumbing. */
  val stubDecoder: Array[Byte] => Array[Float] = { bytes =>
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      f(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    f
  }

  /** Opaque-binary view of the documents table (payload = utf-8 bytes). */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        encode(col("text"), "utf-8").as("payload"),
        col("source"))
      .as[MediaRecord]
  }

  /** Partition-parallel feature extraction through the injected codec. */
  def extractFeatures(media: Dataset[MediaRecord],
                      decoder: Array[Byte] => Array[Float] = stubDecoder)
      : Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-task codec setup happens HERE (once per partition, not per row)
      it.map { r =>
        MediaFeature(r.media_id, r.media_type, r.payload.length.toLong,
          decoder(r.payload))
      }
    }
  }

  /** Production seam for resize: maps payload bytes to a
    * target-"resolution" payload. The stub downsamples the byte stream
    * deterministically to `target` bytes (stride sampling) — a real
    * codec decodes, resamples pixels, re-encodes. */
  def stubResizer(target: Int): Array[Byte] => Array[Byte] = { bytes =>
    if (bytes.length <= target) bytes
    else {
      val out = new Array[Byte](target)
      var i = 0
      while (i < target) {
        out(i) = bytes((i.toLong * bytes.length / target).toInt)
        i += 1
      }
      out
    }
  }

  /** Partition-parallel payload resize through the injected codec —
    * same batch shape as extractFeatures (codec instantiated once per
    * task). Output carries both sizes so downstream can audit the
    * compression ratio without re-reading payloads. */
  def resize(media: Dataset[MediaRecord], target: Int,
             resizer: Int => Array[Byte] => Array[Byte] = stubResizer)
      : Dataset[MediaResized] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = resizer(target) // per-task codec setup
      it.map { r =>
        val out = codec(r.payload)
        MediaResized(r.media_id, r.media_type,
          r.payload.length.toLong, out.length.toLong, out)
      }
    }
  }

  /** Production seam for frame sampling: splits a payload into up to
    * `maxFrames` equal-stride chunks (a real video codec seeks
    * keyframes). Output is one row per frame — the exploded shape a
    * frame-level training pipeline consumes — with frame_idx/n_frames
    * metadata so frames re-associate without a join. */
  def sampleFrames(media: Dataset[MediaRecord], maxFrames: Int,
                   frameBytes: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = math.max(1, math.min(maxFrames, r.payload.length / frameBytes))
        (0 until n).iterator.map { k =>
          val start = (k.toLong * r.payload.length / n).toInt
          val end = math.min(start + frameBytes, r.payload.length)
          MediaFrame(r.media_id, k, n,
            java.util.Arrays.copyOfRange(r.payload, start, end))
        }
      }
    }
  }

  /** Byte-level metadata summary — pure column expressions, and the
    * correctness-observable face of the binary plumbing: payload length
    * and content digest computed on the BINARY column. */
  def payloadMetaBySource(docs: DataFrame): DataFrame =
    fromDocuments(docs).toDF()
      .select(col("source"), col("payload"),
        sha2(col("payload"), 256).as("digest"),
        length(col("payload")).as("n_bytes"))
      .groupBy("source")
      .agg(sum(col("n_bytes")).as("total_bytes"),
           countDistinct(col("digest")).as("distinct_payloads"))
      .orderBy("source")
}
