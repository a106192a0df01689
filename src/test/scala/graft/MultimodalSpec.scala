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

  /** Independent JVM reference of the blockhash fingerprint — same
    * definition as [[Multimodal.pHash64]] but built from scratch on
    * byte arrays, so the SQL expression is pinned against code sharing
    * nothing with it.
    */
  private def phashRef(bytes: Array[Byte]): Long = {
    val hx = bytes.map(b => f"$b%02X").mkString
    val nb = hx.length / 2
    (0 until 64).foldLeft(0L) { (acc, i) =>
      val lo = i.toLong * nb / 64
      val hi = (i + 1).toLong * nb / 64
      val chunk = hx.substring(2 * lo.toInt, 2 * hi.toInt)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes(StandardCharsets.UTF_8))
      val pixel = java.lang.Long.parseLong(
        d.take(4).map(b => f"$b%02x").mkString, 16) % 256
      if (pixel >= 128) acc | (1L << i) else acc
    }
  }

  test("pHash64 matches an independent byte-level reference implementation") {
    val texts = Seq(
      "an image doc with several words and a bit more content to chunk",
      "z" * 300,
      "short",
      "héllo wörld — multibyte UTF-8 content repeated " * 8)
    val df = {
      import spark.implicits._
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    }
    val got = Multimodal.attachMedia(df, "doc_id", "text")
      .withColumn("hx", hex(col("content")))
      .select(col("doc_id"), Multimodal.pHash64("hx").as("phash"))
      .orderBy("doc_id").collect().map(_.getLong(1))
    val want = texts.map(t => phashRef(t.getBytes(StandardCharsets.UTF_8)))
    assert(got.toSeq == want)
  }

  test("reencodeVariant stays within Hamming 2 of its original") {
    import spark.implicits._
    val docs = (0L until 8L).map(i =>
      (i * 37L, s"doc $i " + (s"content block $i " * 40))).toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val variants = Multimodal.reencodeVariant(media, everyN = 37, idOffset = 1000L)
    assert(variants.count() == 8) // all ids are multiples of 37, all >= 256 bytes
    // same byte length, different bytes
    val both = media.select(col("doc_id"), octet_length(col("content")).as("n"))
      .join(variants.select((col("doc_id") - 1000L).as("doc_id"),
        octet_length(col("content")).as("vn")), "doc_id")
    assert(both.filter(col("n") =!= col("vn")).count() == 0)
    val sig = media.unionByName(variants)
      .withColumn("hx", hex(col("content")))
      .select(col("doc_id"), Multimodal.pHash64("hx").as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 8L).map(_ * 37L).foreach { id =>
      val h = java.lang.Long.bitCount(sig(id) ^ sig(id + 1000L))
      assert(h <= 2, s"variant of $id drifted to hamming $h")
    }
  }

  test("phashPairs banded join equals brute-force pairs (pigeonhole exactness)") {
    import spark.implicits._
    val docs = (0L until 40L).map(i =>
      (i, s"document number $i with " + (s"body text $i segment " * 30)))
      .toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val variants = Multimodal.reencodeVariant(media, everyN = 5, idOffset = 1000L)
    val all = media.unionByName(variants)
    val banded = Multimodal.phashPairs(all, maxHamming = 3, bands = 4)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = all.withColumn("hx", hex(col("content")))
      .select(col("doc_id"), Multimodal.pHash64("hx").as("phash"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (a, ha) <- sig; (b, hb) <- sig if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(banded == brute)
    // the planted variants must all be found
    val planted = sig.map(_._1).filter(id => id < 1000 && id % 5 == 0)
      .map(id => (id, id + 1000L)).toSet
    assert(planted.forall { case (a, b) => banded.exists(p => p._1 == a && p._2 == b) })
    spark.catalog.clearCache()
  }

  test("phashIncremental equals full pairs minus old×old") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"document number $i with " + (s"body text $i segment " * 30)))
      .toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val newMedia = Multimodal.reencodeVariant(media, everyN = 5, idOffset = 1000L)
    val inc = Multimodal.phashIncremental(media, newMedia, maxHamming = 3, bands = 4)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Multimodal.phashPairs(media.unionByName(newMedia),
        maxHamming = 3, bands = 4)
      .select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oldIds = (0L until 30L).toSet
    val fullMinusOldOld = full.filterNot(p => oldIds(p._1) && oldIds(p._2))
    assert(inc == fullMinusOldOld)
    // every planted variant pair is an (old, new) pair and must survive
    assert(inc.exists { case (a, b, _) => a == 0L && b == 1000L })
    spark.catalog.clearCache()
  }

  test("resizePlan: integer-exact aspect fit, no upscale, non-images pass through") {
    import spark.implicits._
    val feats = Seq(
      (0L, "image", 640L, 480L),  // width-limited (ratios equal): 320×240
      (1L, "image", 100L, 400L),  // height-limited portrait: 60×240
      (2L, "image", 50L, 50L),    // fits: untouched
      (3L, "audio", 0L, 0L))      // non-image: untouched
      .toDF("doc_id", "modality", "width", "height")
    val got = Multimodal.resizePlan(feats, maxW = 320, maxH = 240)
      .select("doc_id", "new_width", "new_height", "resized")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, 320L, 240L, 1L), (1L, 60L, 240L, 1L),
      (2L, 50L, 50L, 0L), (3L, 0L, 0L, 0L)))
  }

  test("fast (xxhash64) fingerprint keeps the local-edit Hamming bound") {
    import spark.implicits._
    val docs = (0L until 6L).map(i =>
      (i * 37L, s"doc $i " + (s"content block $i " * 40))).toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
    val variants = Multimodal.reencodeVariant(media, everyN = 37, idOffset = 1000L)
    val sig = media.unionByName(variants)
      .withColumn("hx", hex(col("content")))
      .select(col("doc_id"), Multimodal.pHash64("hx", fast = true).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 6L).map(_ * 37L).foreach { id =>
      val h = java.lang.Long.bitCount(sig(id) ^ sig(id + 1000L))
      assert(h <= 2, s"fast variant of $id drifted to hamming $h")
    }
    // and the fast fingerprints are NOT the md5 ones (different hash family)
    val slow = media.withColumn("hx", hex(col("content")))
      .select(col("doc_id"), Multimodal.pHash64("hx").as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 6L).map(_ * 37L).exists(id => slow(id) != sig(id)))
  }

  test("frameDedup finds clipped copies that whole-payload phash cannot") {
    import spark.implicits._
    val docs = (0L until 10L).map(i =>
      (i, s"video $i " + (s"scene $i frame content block " * 60))) // ~1.6 KB
      .toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
      .withColumn("modality", lit("video"))
    val clips = media.filter(col("doc_id") < 4L)
      .withColumn("doc_id", col("doc_id") + 100L)
      .withColumn("content", expr(
        "substring(content, 1, CAST(octet_length(content) div 2 AS INT))"))
    val all = media.unionByName(clips)
    val pairs = Multimodal.frameDedup(all, frameBytes = 256, maxFrames = 8,
        minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    (0L until 4L).foreach { i =>
      assert(pairSet((i, i + 100L)), s"clip of $i not found: $pairSet")
    }
    // shared count is the clip's full (capped) frame complement
    pairs.filter(p => p._2 >= 100L).foreach { case (a, b, n) =>
      assert(n >= 2, s"pair ($a,$b) shares only $n frames")
    }
    // the motivation: whole-payload phash misses every clip pair (length
    // change shifts all position-proportional chunks)
    val phash = Multimodal.phashPairs(all, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 4L).foreach { i =>
      assert(!phash((i, i + 100L)), s"phash unexpectedly caught the clip of $i")
    }
    spark.catalog.clearCache()
  }

  test("frameDedup df cap suppresses ubiquitous boilerplate frames") {
    import spark.implicits._
    // 20 payloads of the SAME bytes: every frame has df=20 > maxDf=10
    val docs = (0L until 20L).map(i => (i, "identical content " * 120))
      .toDF("doc_id", "text")
    val media = Multimodal.attachMedia(docs, "doc_id", "text")
      .withColumn("modality", lit("video"))
    val pairs = Multimodal.frameDedup(media, frameBytes = 256, maxFrames = 8,
      minShared = 2, maxDf = 10)
    assert(pairs.count() == 0,
      "ubiquitous frames must be dropped by the df cap, not pair O(n^2)")
    // with the cap lifted the same corpus pairs freely (sanity check
    // that the cap, not the fingerprints, did the suppression)
    val uncapped = Multimodal.frameDedup(media, frameBytes = 256, maxFrames = 8,
      minShared = 2, maxDf = 1000)
    assert(uncapped.count() == 20L * 19L / 2L)
    spark.catalog.clearCache()
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
