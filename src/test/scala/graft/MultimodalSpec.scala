package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaRow, StubDecoder}

/** Multimodal plumbing pinned: schema of the media frame, the batched
  * decoder contract, per-modality feature semantics, and agreement between
  * the distributed mapPartitions path and the straight-line decoder.
  */
class MultimodalSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "an image doc with several words"),
      (1L, "audio transcript text"),
      (2L, "a longer video style document " + ("x " * 300)),
      (3L, "")).toDF("doc_id", "text")
  }

  test("attachMedia: binary content column + modality round-robin") {
    val m = Multimodal.attachMedia(docsDf, "doc_id", "text")
    assert(m.schema("content").dataType.typeName == "binary")
    val rows = m.orderBy("doc_id").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("image", "audio", "video", "image"))
    // content bytes are exactly the UTF-8 text
    assert(new String(rows(1).getAs[Array[Byte]](2), StandardCharsets.UTF_8)
      == "audio transcript text")
  }

  test("stub decoder: deterministic per-modality features, batch-shaped") {
    val text = "an image doc with several words"
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val Array(f) = StubDecoder.decodeBatch(Array(MediaRow(0L, "image", bytes)))
    assert(f.byte_len == bytes.length)
    assert(f.n_frames == 1 && f.n_sampled == 1 && f.duration_ms == 0)
    assert(f.width == f.content_h32 % 640 + 16)
    assert(f.height == (f.content_h32 / 640) % 480 + 16)

    val Array(a) = StubDecoder.decodeBatch(Array(MediaRow(1L, "audio", bytes)))
    assert(a.duration_ms == bytes.length && a.n_frames == 0 && a.width == 0)

    val big = ("x " * 300).getBytes(StandardCharsets.UTF_8)
    val Array(v) = StubDecoder.decodeBatch(Array(MediaRow(2L, "video", big)))
    assert(v.n_frames == big.length / 256 + 1)
    assert(v.n_sampled == math.min(3L, v.n_frames))
    assert(v.duration_ms == v.n_frames * 40)
  }

  test("distributed extractFeatures matches the straight-line decoder") {
    val media = Multimodal.attachMedia(docsDf, "doc_id", "text")
    val dist = Multimodal.extractFeatures(spark, media)
      .collect().sortBy(_.doc_id)
    val local = media.orderBy("doc_id").collect().map { r =>
      StubDecoder.decodeBatch(Array(MediaRow(
        r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2)))).head
    }
    assert(dist.toSeq == local.toSeq)
    // content hash matches the SQL-side md5 hash32 of the text
    val h = docsDf.select(graft.functions.TextFunctions.hash32(col("text")))
      .collect().map(_.getLong(0))
    assert(dist.map(_.content_h32).toSeq == h.toSeq)
  }
}
