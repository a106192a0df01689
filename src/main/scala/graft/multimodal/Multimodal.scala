package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * content carried as opaque `binary` columns next to a typed metadata
  * struct, with decode / feature-extraction / frame-sampling as a
  * BATCHED `mapPartitions` stage over a typed Dataset.
  *
  * The actual media decode is a STUB (this container has no image/audio
  * codecs): [[StubDecoder.decodeBatch]] derives deterministic pseudo
  * features from the bytes (md5-seeded), so the Spark-side plumbing —
  * schema, partition-level batching, typed encoder boundaries, the
  * batch-shaped decoder signature a real vectorized/GPU decoder would
  * have — is real and oracle-testable end to end. Swapping in a real
  * decoder changes only the body of `decodeBatch`.
  *
  * Scale shape: the binary payload never moves through a shuffle — decode
  * is a narrow per-partition map directly over the scan, features are the
  * only thing that flows on. Batches of [[StubDecoder.BatchSize]] rows
  * amortize per-call overhead exactly like a batched inference endpoint
  * (the same contract as the reference's embedding batching,
  * `src/Server/AIProvider.cs:39-133`).
  */
object Multimodal {

  /** One media row entering decode: id + modality + raw bytes. */
  case class MediaRow(doc_id: Long, modality: String, content: Array[Byte])

  /** Extracted features — the decoded schema a downstream trainer sees.
    * Semantics per modality (deterministic stub):
    *  - image: width/height from the content hash, frames = 1
    *  - audio: duration_ms = byte count (1 byte/ms fake), frames = 0
    *  - video: frames = bytes/256 + 1; frame-SAMPLE takes min(3, frames)
    */
  case class MediaFeatures(
      doc_id: Long,
      modality: String,
      byte_len: Long,
      content_h32: Long,
      width: Long,
      height: Long,
      duration_ms: Long,
      n_frames: Long,
      n_sampled: Long)

  object StubDecoder {
    val BatchSize = 64

    /** First 8 hex chars of md5 as a long — identical to
      * [[graft.functions.TextFunctions.hash32]] over the same bytes, so a
      * SQL oracle can reproduce every derived feature.
      */
    def h32(bytes: Array[Byte]): Long = {
      val d = MessageDigest.getInstance("MD5").digest(bytes)
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }

    /** Batch-shaped decode: one call per BatchSize rows (the signature a
      * real vectorized decoder / GPU codec wrapper would have).
      */
    def decodeBatch(rows: Array[MediaRow]): Array[MediaFeatures] =
      rows.map { r =>
        val n = r.content.length.toLong
        val h = h32(r.content)
        val frames = if (r.modality == "video") n / 256 + 1 else if (r.modality == "image") 1L else 0L
        MediaFeatures(
          doc_id = r.doc_id,
          modality = r.modality,
          byte_len = n,
          content_h32 = h,
          width = if (r.modality == "image") h % 640 + 16 else 0L,
          height = if (r.modality == "image") (h / 640) % 480 + 16 else 0L,
          duration_ms = if (r.modality == "audio") n else if (r.modality == "video") frames * 40 else 0L,
          n_frames = frames,
          n_sampled = math.min(3L, frames))
      }
  }

  /** Attach a synthetic media payload to a document table: UTF-8 bytes of
    * the text as the opaque content, modality round-robin by id. (In a real
    * corpus the binary column arrives from the source; everything
    * downstream of this frame is modality-real.)
    */
  def attachMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("modality"),
      encode(col(textCol), "UTF-8").as("content"))

  /** Decode/feature-extract as a batched narrow stage. Input frame must
    * carry (doc_id, modality, content:binary).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    graft.ops.Par.ensure(media, "doc_id")
      .as[MediaRow]
      .mapPartitions { it =>
        it.grouped(StubDecoder.BatchSize).flatMap(b => StubDecoder.decodeBatch(b.toArray))
      }
  }
}
