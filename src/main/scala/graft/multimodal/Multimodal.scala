package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Caches.TrackedPersist

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

  /** 64-bit blockhash-style perceptual fingerprint over an opaque media
    * payload, computed from its HEX encoding (`hxCol` must hold
    * `hex(content)` — hex because the SQL oracle's md5 only accepts
    * strings, and hex round-trips bytes identically in every dialect).
    *
    * Stub "decode": the payload is split into 64 position-proportional
    * byte chunks (the blockhash grid); pixel_i = hash32(chunk_i hex) mod
    * 256; bit_i = pixel_i >= 128 (a FIXED threshold, not the mean — a
    * local edit must only flip the bits of the chunks it touches, never
    * borderline bits elsewhere). Like a real blockhash, the fingerprint
    * is stable under small same-length edits: an edit inside one chunk
    * flips at most that chunk's bit. A real image decoder would replace
    * the chunk-hash "pixels" with downsampled luma; everything downstream
    * (banding, Hamming verify) is representation-independent.
    *
    * Single expression: the 64 md5s run inside one transform lambda and
    * the bit-pack is an aggregate over that transform's RESULT (the
    * collection argument is evaluated once — no computed alias is
    * referenced inside a lambda body, the round-9 interpreted-HOF
    * re-evaluation cliff). `hxCol` is referenced from the lambda as a
    * plain attribute (multi-use, so CollapseProject keeps it staged).
    */
  def pHash64(hxCol: String): Column = pHash64(hxCol, fast = false)

  /** `fast = true` swaps the md5 pixel hash for codegen'd xxhash64 — the
    * production path (same contract as
    * [[graft.functions.TextFunctions.hash32Fast]]): different fingerprint
    * VALUES, identical structure and locality, not oracle-reproducible
    * (DuckDB has no xxhash64), so oracled queries keep md5 and the b129
    * bench twin measures this form.
    */
  def pHash64(hxCol: String, fast: Boolean): Column = {
    val nb = s"(CAST(length($hxCol) AS BIGINT) div 2L)"
    val lo = s"(i * $nb div 64L)"
    val hi = s"((i + 1L) * $nb div 64L)"
    val chunk = s"substring($hxCol, CAST(2L * $lo AS INT) + 1, " +
      s"CAST(2L * ($hi - $lo) AS INT))"
    val pixel =
      if (fast) s"(xxhash64($chunk) & 255L)"
      else s"(CAST(conv(substring(md5($chunk), 1, 8), 16, 10) AS BIGINT) % 256L)"
    expr(s"""aggregate(
      transform(sequence(0L, 63L),
        i -> IF($pixel >= 128L, shiftleft(CAST(1 AS BIGINT), CAST(i AS INT)), 0L)),
      0L, (acc, x) -> acc | x)""")
  }

  /** Deterministic "re-encode" of a slice of the media set: every
    * `everyN`th payload of >= 256 bytes gets a 4-byte span at its midpoint
    * overwritten, same total length — the shape of a metadata rewrite or
    * lossy re-encode that leaves the content perceptually identical. Used
    * by the near-dup fixture: a same-length local edit touches at most 2
    * of the 64 blockhash chunks, so original and variant are guaranteed
    * within Hamming 2.
    */
  def reencodeVariant(media: DataFrame, everyN: Int, idOffset: Long): DataFrame =
    media
      .filter(pmod(col("doc_id"), lit(everyN.toLong)) === 0L &&
        octet_length(col("content")) >= 256)
      .withColumn("doc_id", col("doc_id") + lit(idOffset))
      .withColumn("content", expr(
        """concat(
             substring(content, 1, CAST(octet_length(content) div 2 AS INT)),
             encode('ZZZZ', 'UTF-8'),
             substring(content, CAST(octet_length(content) div 2 AS INT) + 5,
               octet_length(content)))"""))

  /** Aspect-preserving resize plan over the decoded image features:
    * fit each image inside a `maxW` × `maxH` box, never upscale. All
    * INTEGER arithmetic (the limiting side is chosen by cross-multiplying
    * `maxW·h` vs `maxH·w`; the other side is an integer-div scale), so
    * the plan is exactly reproducible in any engine — no float rounding
    * at box boundaries. A real pipeline feeds the (doc_id, new_w, new_h)
    * plan to the batched decoder as resize instructions; the planning
    * stage itself is a narrow projection. Non-image modalities pass
    * through unresized (their width/height are 0).
    */
  def resizePlan(features: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    require(maxW > 0 && maxH > 0, "target box must be positive")
    val fits = s"(modality != 'image' OR (width <= ${maxW}L AND height <= ${maxH}L))"
    val heightLimited = s"(${maxW}L * height > ${maxH}L * width)"
    features
      .withColumn("new_width", expr(
        s"""CASE WHEN $fits THEN width
            WHEN $heightLimited THEN (width * ${maxH}L) div height
            ELSE ${maxW}L END"""))
      .withColumn("new_height", expr(
        s"""CASE WHEN $fits THEN height
            WHEN $heightLimited THEN ${maxH}L
            ELSE (height * ${maxW}L) div width END"""))
      .withColumn("resized", expr(s"CAST(NOT $fits AS BIGINT)"))
  }

  /** Frame-level video duplicate detection: the payload is cut into
    * fixed-size frames (the stub's 256-byte "frames", matching the
    * [[StubDecoder]] frame model), up to `maxFrames` sampled per video,
    * each fingerprinted exactly; two videos pair when they share at
    * least `minShared` distinct frame fingerprints. This catches what
    * whole-payload fingerprints structurally cannot: a CLIPPED copy
    * (prefix/excerpt) changes the payload length, which shifts every
    * position-proportional blockhash chunk — but its frames are
    * byte-identical at the same offsets, so frame matching finds it.
    *
    * Scale levers, both from the text-dedup playbook: per-video frame
    * count capped (`maxFrames` — frame SAMPLING, the q61 contract) and a
    * document-frequency cap on fingerprints (`maxDf` — a ubiquitous
    * boilerplate frame would otherwise contribute O(df²) candidate
    * pairs, the ngramJaccard rare-gram rule). Candidate generation is a
    * bucketed equi-join on the fingerprint; payloads never shuffle.
    *
    * Returns (doc_a, doc_b, n_shared).
    */
  def frameDedup(
      media: DataFrame,
      frameBytes: Int = 256,
      maxFrames: Int = 8,
      minShared: Int = 2,
      maxDf: Int = 10): DataFrame = {
    require(frameBytes > 0 && maxFrames > 0 && minShared > 0 && maxDf > 0)
    val fhex = 2 * frameBytes
    // one expression: hx is referenced twice (bound + slice), so it stays
    // a staged attribute under CollapseProject; the guard also enforces
    // the >= minShared-frames minimum payload without a HOF in a Filter
    val fpsExpr =
      s"""CASE WHEN length(hx) >= ${fhex.toLong * minShared}L THEN
            array_distinct(transform(
              sequence(0L, least(CAST(length(hx) AS BIGINT) div ${fhex}L,
                ${maxFrames}L) - 1L),
              i -> CAST(conv(substring(md5(substring(hx,
                CAST(i * ${fhex}L AS INT) + 1, $fhex)), 1, 8), 16, 10)
                AS BIGINT)))
          ELSE array() END"""
    val frames = graft.ops.Par.ensure(media, "doc_id")
      .withColumn("hx", hex(col("content")))
      .select(col("doc_id"), explode(expr(fpsExpr)).as("fp"))
      .persistTracked()
    val rare = frames.groupBy("fp")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val indexed = frames.join(rare, "fp")
    indexed.as("a").join(indexed.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Incremental perceptual near-dup: pairs involving at least one NEW
    * media row, against an already-indexed old set whose fingerprints are
    * assumed stored (at scale: the band-keyed phash index is a table;
    * old×old never recomputes or rejoins — the same contract as
    * [[graft.ops.Dedup.minhashIncremental]]). Candidates are
    * (old band ⋈ new band) ∪ (new band ⋈ new band); with
    * `maxHamming < bands` recall over the emitted pair universe is exact
    * by pigeonhole, identical to [[phashPairs]] minus old×old.
    */
  def phashIncremental(
      oldMedia: DataFrame,
      newMedia: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64 (got $bands)")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    def sigOf(media: DataFrame): DataFrame =
      graft.ops.Par.ensure(media, "doc_id")
        .withColumn("hx", hex(col("content")))
        .select(col("doc_id"), pHash64("hx").as("phash"))
        .persistTracked()
    def bandsOf(sig: DataFrame): DataFrame =
      sig.select(col("doc_id"), col("phash"),
          posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
            s"b -> shiftright(phash, b * $bandBits) & ${mask}L)")))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_val")
    val oldBanded = bandsOf(sigOf(oldMedia))
    val newBanded = bandsOf(sigOf(newMedia))
    def pairsOf(a: DataFrame, b: DataFrame, halfOpen: Boolean): DataFrame = {
      val cond = col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        (if (halfOpen) col("a.doc_id") < col("b.doc_id")
         else col("a.doc_id") =!= col("b.doc_id"))
      a.as("a").join(b.as("b"), cond)
        .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
          graft.functions.TextFunctions.hammingDistance(
            col("a.phash"), col("b.phash")).as("hamming"))
    }
    pairsOf(oldBanded, newBanded, halfOpen = false)
      .unionByName(pairsOf(newBanded, newBanded, halfOpen = true))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Perceptual near-duplicate pairs over a media frame (doc_id, modality,
    * content:binary) via banded Hamming LSH on [[pHash64]]: fingerprints
    * are cut into `bands` disjoint bit-bands and candidates must share one
    * band — a bucketed equi-join, never all-pairs. With
    * `maxHamming < bands` the pigeonhole principle makes recall EXACT
    * (any pair within maxHamming differs in at most maxHamming bands, so
    * at least one band matches): banded output == brute-force output, not
    * an approximation — which is what lets a plain all-pairs SQL oracle
    * pin this end to end.
    *
    * Scale shape: one narrow signature pass over the scan (binary never
    * shuffles on), O(n × bands) band keys, shuffle O(candidates);
    * signature frame persisted because both sides of the self-join read
    * it. Returns (doc_a, doc_b, modality, hamming), modality of the
    * lower-id side.
    */
  def phashPairs(media: DataFrame, maxHamming: Int = 3, bands: Int = 4,
      fastHash: Boolean = false): DataFrame = {
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64 (got $bands)")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    val sig = graft.ops.Par.ensure(media, "doc_id")
      .withColumn("hx", hex(col("content")))
      .select(col("doc_id"), col("modality"), pHash64("hx", fastHash).as("phash"))
      .persistTracked()
    val banded = sig.select(col("doc_id"), col("modality"), col("phash"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> shiftright(phash, b * $bandBits) & ${mask}L)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.modality").as("modality"),
        graft.functions.TextFunctions.hammingDistance(
          col("a.phash"), col("b.phash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}
