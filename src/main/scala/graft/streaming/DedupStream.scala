package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{TextFunctions => TF}

/** Streaming near-duplicate detection — the continuous form of
  * [[graft.ops.Dedup.minhashIncremental]]: as documents arrive, flag each
  * against everything seen so far, without ever re-pairing the history
  * against itself.
  *
  * Dataflow: per-row minhash signature (the same fused kernel as the
  * batch path) → explode band keys → `flatMapGroupsWithState` keyed by
  * BAND. State per band is the bounded list of (doc_id, signature) seen
  * in that band; a new arrival is verified against exactly the signatures
  * sharing its band — candidate generation is the SAME bucketed shape as
  * batch LSH, re-expressed as state lookup. Verification is the
  * SIGNATURE-AGREEMENT estimate of Jaccard (matching components /
  * numHashes — the standard MinHash estimator): per-band state holding
  * full shingle-hash sets would grow with document length, while
  * signatures are fixed-size. This is the streaming trade: the batch
  * operators verify exactly; the stream verifies by estimate, and a
  * periodic batch `minhashIncremental` run reconciles (the
  * index-maintenance pattern).
  *
  * Bounds: state per band is capped at `maxPerBand` signatures
  * (oldest-first eviction, `dropped` counts evictions per band so
  * saturation is observable, never silent). A pathological band
  * (boilerplate) therefore degrades to missed pairs — visibly — rather
  * than unbounded state. Each pair is emitted once per SHARED band; the
  * downstream consumer dedups (doc_a, doc_b) — deduping across bands
  * inside the operator would need cross-group state streaming does not
  * have.
  */
object DedupStream {

  /** Input row after banding: one per (doc, band key). */
  case class Banded(band: String, docId: Long, sig: Seq[Long])

  /** Emitted when a new doc's signature agrees with a stored one on at
    * least the threshold fraction of components. `estJaccard` is the
    * MinHash agreement estimate, not an exact Jaccard.
    */
  case class DupHit(docA: Long, docB: Long, band: String, estJaccard: Double)

  /** Per-band state: bounded signature history + eviction count. */
  case class BandState(entries: Vector[(Long, Seq[Long])], dropped: Long)

  private[graft] def update(threshold: Double, maxPerBand: Int)(
      band: String,
      rows: Iterator[Banded],
      state: GroupState[BandState]): Iterator[DupHit] = {
    var st = state.getOption.getOrElse(BandState(Vector.empty, 0L))
    val out = Vector.newBuilder[DupHit]
    // deterministic intra-batch order: a batch's docs check against
    // earlier ids in the same batch plus all retained history
    rows.toSeq.sortBy(_.docId).foreach { b =>
      st.entries.foreach { case (oldId, oldSig) =>
        if (oldId != b.docId) {
          val n = oldSig.length
          val agree = (0 until n).count(i => oldSig(i) == b.sig(i))
          val est = agree.toDouble / n
          if (est >= threshold)
            out += DupHit(math.min(oldId, b.docId), math.max(oldId, b.docId), band,
              math.rint(est * 1e6) / 1e6)
        }
      }
      st = BandState(st.entries :+ (b.docId -> b.sig), st.dropped)
      if (st.entries.length > maxPerBand)
        st = BandState(st.entries.drop(st.entries.length - maxPerBand),
          st.dropped + (st.entries.length - maxPerBand))
    }
    state.update(st)
    out.result().iterator
  }

  /** Band a (doc_id, text) stream with the batch kernels — shared shape
    * with [[graft.ops.Dedup.minhashLsh]] so stream and batch bucket
    * identically (same shingles, same signature permutations, same band
    * keys).
    */
  def banded(docs: DataFrame, shingleK: Int, numHashes: Int, bands: Int): Dataset[Banded] = {
    import docs.sparkSession.implicits._
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")
    docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("hashes", array_distinct(TF.shingleHashes(TF.shingles(col("toks"), shingleK))))
      // NO size(hashes) pre-filter: a HOF chain in a Filter condition
      // drops the whole stage to interpreted eval, which re-evaluates the
      // tokenize/shingle subtree per reference (the q108 finding, 8× at
      // sf0.1). Shingle-less docs carry a null signature and lshBands
      // already gives them ZERO band keys, so the explode drops them —
      // same output, no interpreted filter.
      .withColumn("sig", TF.minhashSignature(col("hashes"), numHashes))
      .withColumn("band", explode(TF.lshBands(col("sig"), bands, rows)))
      .select(col("band"), col("doc_id").as("docId"), col("sig"))
      .as[Banded]
  }

  /** Continuous near-dup flags over a streaming (doc_id, text) frame —
    * the UNBOUNDED-STATE form: per-key payloads are capped at maxPerBand,
    * but the band-KEY set grows linearly with distinct content (measured:
    * ≈4·docs keys, 1.18 GB in-heap at 500k docs — SCALE.md §round 14/15).
    * **Production default is [[detectWindowed]]**, which bounds state to
    * keys-active-per-reconciliation-window (set `window` = the period of
    * the batch `minhashIncrementalFromIndex` maintenance run; state
    * plateaus at window × arrival rate and drains when the feed idles —
    * soaked, SCALE.md §round 15/16). Use THIS form only for bounded
    * replays (a backfill over a known corpus) or when every historical
    * pair must flag in-stream with no batch reconciliation behind it —
    * and then prefer the RocksDB state-store provider so the band table
    * lives on disk, not heap (274 MB / 92% disk-resident vs 1.18 GB
    * in-heap at the same K — SCALE.md).
    */
  def detect(docs: DataFrame,
             shingleK: Int = 3,
             numHashes: Int = 12,
             bands: Int = 4,
             threshold: Double = 0.5,
             maxPerBand: Int = 64): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    banded(docs, shingleK, numHashes, bands)
      .groupByKey(_.band)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update(threshold, maxPerBand))
  }

  private[graft] def updateWindowed(threshold: Double, maxPerBand: Int,
      window: String)(
      band: String,
      rows: Iterator[Banded],
      state: GroupState[BandState]): Iterator[DupHit] = {
    if (state.hasTimedOut) {
      // one reconciliation window with no arrivals on this band: the
      // periodic batch run owns this history now — drop it
      state.remove()
      Iterator.empty
    } else {
      val out = update(threshold, maxPerBand)(band, rows, state)
      state.setTimeoutDuration(window)
      out
    }
  }

  /** [[detect]] with the RECONCILIATION-WINDOW state bound — the second
    * mitigation SCALE.md names for the band table's corpus-linear total
    * (the first, the RocksDB provider, moves it to disk; this one bounds
    * it). Band state carries a processing-time timeout of `window`, the
    * period of the batch `minhashIncremental` maintenance run: a band
    * key idle for one full window is DROPPED, because the reconciliation
    * run that defines the window has already folded its history into the
    * persisted shingle index. The stream therefore flags pairs whose
    * members arrive within a window of each other; a pair straddling a
    * boundary is MISSED by the stream BY CONTRACT and caught by the next
    * [[graft.ops.Dedup.minhashIncrementalFromIndex]] run against the
    * pre-boundary index — StreamingSpec pins both halves (within-window
    * equality with [[detect]], and the straddling pair's recovery by the
    * batch run). State is bounded by (keys active within one window) ×
    * maxPerBand signatures — for a fixed window and arrival rate a
    * CONSTANT, not a corpus total.
    *
    * Deployment note: run under a PACED trigger
    * (`Trigger.ProcessingTime(...)`, interval ≪ window). Processing-time
    * timeouts make Spark schedule no-data batches to fire expirations;
    * under the default `Trigger(0)` those batches run back-to-back — a
    * busy loop that also starves test harnesses' `processAllAvailable`
    * (observed live; the spec drives the fold through TestGroupState
    * instead).
    */
  def detectWindowed(docs: DataFrame,
                     shingleK: Int = 3,
                     numHashes: Int = 12,
                     bands: Int = 4,
                     threshold: Double = 0.5,
                     maxPerBand: Int = 64,
                     window: String = "10 minutes"): Dataset[DupHit] = {
    import docs.sparkSession.implicits._
    banded(docs, shingleK, numHashes, bands)
      .groupByKey(_.band)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(
        updateWindowed(threshold, maxPerBand, window))
  }

  /** Continuous per-source MinHash sketch — the streaming form of
    * [[graft.ops.Dedup.sourceSketch]] (q108's governance view maintained
    * at ingest). Per-doc signatures ride the scan (narrow, same fused
    * kernel as batch); the per-source component-wise min is a PLAIN
    * streaming aggregation — min is associative AND monotone, so state is
    * exactly one row of numHashes longs per source (O(sources ×
    * numHashes), never grows with documents) and no custom state function
    * is needed. Sources whose every doc is shingle-less aggregate to null
    * components and are dropped AFTER the agg (min ignores nulls, so for
    * mixed sources this equals the batch path's per-doc filter — and the
    * post-agg predicate is cheap, per the round-9 Filter/HOF rule).
    * Run with outputMode complete (or update); StreamingSpec pins
    * stream == batch and the state bound.
    */
  def sourceSketchStream(docs: DataFrame, shingleK: Int = 3,
      numHashes: Int = 12): DataFrame =
    docs
      .withColumn("toks", TF.tokens(col("text")))
      .withColumn("hashes",
        array_distinct(TF.shingleHashes(TF.shingles(col("toks"), shingleK))))
      .withColumn("sig", TF.minhashSignature(col("hashes"), numHashes))
      .groupBy("source")
      .agg((1 to numHashes).map(i => min(element_at(col("sig"), i)).as(s"v$i")).head,
        (2 to numHashes).map(i => min(element_at(col("sig"), i)).as(s"v$i")): _*)
      .filter(col("v1").isNotNull)
      .select(col("source"),
        array((1 to numHashes).map(i => col(s"v$i")): _*).as("sig"))

  // ================= streaming perceptual (media) near-dup =================

  /** One row per (media doc, Hamming band key). */
  case class PBanded(band: String, docId: Long, phash: Long)

  /** Emitted when an arriving payload's fingerprint is within the Hamming
    * threshold of a stored one. EXACT (unlike [[DupHit]]'s estimate): the
    * 64-bit fingerprint IS the verification object, so streaming and
    * batch [[graft.multimodal.Multimodal.phashPairs]] agree pair-for-pair
    * within retained state.
    */
  case class PHit(docA: Long, docB: Long, band: String, hamming: Long)

  /** Per-band state: bounded fingerprint history + eviction count. */
  case class PBandState(entries: Vector[(Long, Long)], dropped: Long)

  private[graft] def phashUpdate(maxHamming: Int, maxPerBand: Int)(
      band: String,
      rows: Iterator[PBanded],
      state: GroupState[PBandState]): Iterator[PHit] = {
    var st = state.getOption.getOrElse(PBandState(Vector.empty, 0L))
    val out = Vector.newBuilder[PHit]
    rows.toSeq.sortBy(_.docId).foreach { b =>
      st.entries.foreach { case (oldId, oldHash) =>
        if (oldId != b.docId) {
          val h = java.lang.Long.bitCount(oldHash ^ b.phash)
          if (h <= maxHamming)
            out += PHit(math.min(oldId, b.docId), math.max(oldId, b.docId),
              band, h.toLong)
        }
      }
      st = PBandState(st.entries :+ (b.docId -> b.phash), st.dropped)
      if (st.entries.length > maxPerBand)
        st = PBandState(st.entries.drop(st.entries.length - maxPerBand),
          st.dropped + (st.entries.length - maxPerBand))
    }
    state.update(st)
    out.result().iterator
  }

  /** Band a (doc_id, content:binary) media stream with the batch
    * fingerprint kernel ([[graft.multimodal.Multimodal.pHash64]]) — same
    * fingerprints, same band cuts, so stream and batch bucket
    * identically.
    */
  def phashBanded(media: DataFrame, bands: Int = 4): Dataset[PBanded] = {
    import media.sparkSession.implicits._
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64 (got $bands)")
    val bandBits = 64 / bands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    media
      .withColumn("hx", hex(col("content")))
      .withColumn("phash", graft.multimodal.Multimodal.pHash64("hx"))
      .withColumn("bv", explode(expr(
        s"transform(sequence(0, ${bands - 1}), " +
          s"b -> struct(b AS bi, shiftright(phash, b * $bandBits) & ${mask}L AS v))")))
      .select(
        concat(col("bv.bi").cast("string"), lit("|"),
          col("bv.v").cast("string")).as("band"),
        col("doc_id").as("docId"), col("phash"))
      .as[PBanded]
  }

  /** Continuous perceptual near-dup flags over a streaming media frame —
    * the streaming form of [[graft.multimodal.Multimodal.phashPairs]],
    * with the same bounded-band-state trade as [[detect]]: each arrival
    * is verified against exactly the fingerprints sharing one of its
    * bands (state O(bands × maxPerBand) per populated band key, never
    * the corpus), pairs can be emitted once per shared band (consumer
    * dedups), and saturation evicts oldest-first with a visible
    * `dropped` count.
    */
  def phashDetect(
      media: DataFrame,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxPerBand: Int = 64): Dataset[PHit] = {
    import media.sparkSession.implicits._
    phashBanded(media, bands)
      .groupByKey(_.band)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        phashUpdate(maxHamming, maxPerBand))
  }

  // --- content-defined-chunk streaming dedup (q153's continuous form) ---

  /** One row per (chunk md5, doc) after per-document CDC chunking. */
  case class ChunkRow(chunkHash: String, docId: Long)

  /** Emitted when an arriving doc shares a chunk with a retained doc. */
  case class ChunkHit(docA: Long, docB: Long, chunkHash: String)

  /** Per-chunk-hash state: bounded doc-id history + eviction count. */
  case class ChunkState(entries: Vector[Long], dropped: Long)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** Scala twin of [[graft.functions.TextFunctions.hash32]] (first 8 md5
    * hex chars as a long) — the streaming chunker runs in a typed map,
    * outside Catalyst, so the hash must be recomputed portably here.
    * StreamingSpec pins chunker == batch [[graft.ops.Dedup.cdcChunks]].
    */
  private def hash32Local(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** Per-document CDC chunking as a typed map — identical semantics to
    * the batch operator's window form (a boundary token is the LAST
    * token of its chunk), but computed row-locally: chunking needs no
    * cross-row state, so the streaming version pays no shuffle at all
    * before the keyed-state stage.
    */
  def cdcChunked(docs: DataFrame, boundaryMod: Int = 8): Dataset[ChunkRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = new StringBuilder
        text.split("\\s+").iterator.filter(_.nonEmpty).foreach { t =>
          if (cur.nonEmpty) cur.append(' ')
          cur.append(t)
          if (hash32Local("cdc|" + t) % boundaryMod == 0) {
            out += cur.toString; cur = new StringBuilder
          }
        }
        if (cur.nonEmpty) out += cur.toString
        out.map(c => ChunkRow(md5hex(c), id))
      }
  }

  private[graft] def cdcUpdate(maxPerChunk: Int)(
      hash: String,
      rows: Iterator[ChunkRow],
      state: GroupState[ChunkState]): Iterator[ChunkHit] = {
    var st = state.getOption.getOrElse(ChunkState(Vector.empty, 0L))
    val out = Vector.newBuilder[ChunkHit]
    rows.toSeq.sortBy(_.docId).foreach { r =>
      st.entries.foreach { old =>
        if (old != r.docId)
          out += ChunkHit(math.min(old, r.docId), math.max(old, r.docId), hash)
      }
      if (!st.entries.contains(r.docId)) {
        val appended = st.entries :+ r.docId
        st =
          if (appended.size > maxPerChunk)
            ChunkState(appended.drop(appended.size - maxPerChunk),
              st.dropped + (appended.size - maxPerChunk))
          else ChunkState(appended, st.dropped)
      }
    }
    state.update(st)
    out.result().iterator
  }

  /** Continuous cross-document duplicated-chunk detection — the
    * streaming form of [[graft.ops.Dedup.cdcDupChunks]], with the same
    * bounded-state trade as [[detect]]/[[phashDetect]]: an arriving
    * document's chunks are checked against exactly the retained doc ids
    * sharing each chunk hash (state O(maxPerChunk) per populated hash,
    * never the corpus); a boilerplate chunk saturates VISIBLY
    * (oldest-first eviction with a dropped counter) instead of growing
    * without bound. Pairs may repeat across shared chunks; the consumer
    * dedups, exactly as with band-keyed emission.
    */
  def cdcDetect(
      docs: DataFrame,
      boundaryMod: Int = 8,
      maxPerChunk: Int = 64): Dataset[ChunkHit] = {
    import docs.sparkSession.implicits._
    cdcChunked(docs, boundaryMod)
      .groupByKey(_.chunkHash)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        cdcUpdate(maxPerChunk))
  }
}
