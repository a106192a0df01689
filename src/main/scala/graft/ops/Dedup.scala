package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.ops.Caches.TrackedPersist

/** Deduplication pipelines for large-scale training-data curation — the
  * scale-critical property of every pipeline here is that candidate
  * generation is a BUCKETED equi-join (band key / hash-prefix / sign-LSH
  * key), never an all-pairs cross join, so the shuffle volume is
  * O(candidates), not O(n^2).
  *
  * The expression primitives live in [[graft.functions.TextFunctions]]; this
  * module wires them into end-to-end DataFrame transforms.
  *
  * Caching contract: the pipelines persist their shared md5-heavy
  * intermediates (each is read 2-6 times downstream) via
  * [[Caches.TrackedPersist]] and deliberately do NOT unpersist inline —
  * the cached blocks must outlive the returned (lazy) DataFrame. Callers
  * release the scratch once the result is consumed: `Caches.release()`
  * (scoped — leaves domain/user caches alone) or
  * `spark.catalog.clearCache()` (as Bench/Verify do between queries).
  */
object Dedup {

  /** Exact dedup by full-content hash: one row per distinct content with the
    * minimum id as the canonical keeper and the duplicate count.
    * A single hash-partitioned groupBy — at 100 TB this is the cheapest
    * possible shape (map-side partial agg on a 44-char key, never the text).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("content_hash", contentHash(col(textCol)))
      .groupBy("content_hash")
      .agg(
        min(col(idCol)).as("keeper"),
        (count(lit(1)) - 1L).as("dup_count"))

  /** MinHash-LSH near-duplicate pairs.
    *
    * docs --tokens--> k-shingles --md5 once per shingle--> base hashes
    * --affine mixes--> signature --banding--> exploded band keys
    * --equi-join on band key--> candidate pairs --Jaccard verify--> pairs.
    *
    * Returns (doc_a, doc_b, jaccard) for verified pairs with
    * jaccard >= threshold. Docs shorter than `shingleK` tokens produce no
    * band keys and therefore no candidates (cannot be near-dup'd by this
    * method; handle them with [[exact]]).
    */
  def minhashLsh(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      fastHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")

    val hashed = shingleHashed(docs, idCol, textCol, shingleK, fastHash)
    // Candidate pairs: equi-join on band key (bucketed, never all-pairs).
    val cand = candidates(bandKeys(hashed, numHashes, bands, rows))

    verifyJaccard(cand, hashed, threshold)
  }

  /** LSH banding-parameter tuning report: for each (bands, rowsPerBand)
    * split of the SAME `numHashes`-hash signature, the measured candidate
    * volume, the verified true-pair count at `threshold`, the resulting
    * precision (integer per-mille), and the analytic S-curve detection
    * probability 1-(1-t^r)^b at the threshold — the number a dedup owner
    * reads to pick banding before paying for a full run. The signature is
    * computed once (shared persisted hash stage); each config re-bands
    * it, so the report costs |configs| band joins over one map stage —
    * exactly the candidate-generation cost the report is there to
    * predict, at the corpus's true shingle statistics rather than a
    * uniformity assumption. p_detect is computed driver-side and embedded
    * as a literal so both engines carry the identical rounded double.
    */
  def lshTuning(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, threshold: Double,
      configs: Seq[(Int, Int)], fastHash: Boolean = false): DataFrame = {
    val hashed = shingleHashed(docs, idCol, textCol, shingleK, fastHash)
    configs.map { case (b, r) =>
      require(b * r == numHashes,
        s"config ($b, $r) does not tile the $numHashes-hash signature")
      val cand = candidates(bandKeys(hashed, numHashes, b, r))
        .persistTracked()
      val pd = math.rint((1.0 - math.pow(1.0 - math.pow(threshold, r), b)) * 1e6) / 1e6
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(verifyJaccard(cand, hashed, threshold)
          .agg(count(lit(1)).as("n_true")))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("n_candidates"), col("n_true"),
          expr("cast(case when n_candidates = 0 then 0 else (n_true * 1000) div n_candidates end as bigint)")
            .as("precision_permille"),
          lit(pd).as("p_detect"))
    }.reduce(_ unionByName _).orderBy("bands")
  }

  /** Containment (asymmetric-overlap) duplicate pairs over the LSH
    * candidate set: |A∩B|/|A| and |A∩B|/|B| on the distinct shingle-hash
    * sets, kept when either direction reaches `threshold`. Containment is
    * the quote/subset detector Jaccard misses — a document fully embedded
    * in a much larger one has containment ≈ 1 while Jaccard ≈ |A|/|B|.
    * Candidates still come from minhash banding, so recall follows the
    * JACCARD S-curve (a tiny excerpt of a huge doc may not band-collide);
    * that is the documented tradeoff of reusing the one existing index —
    * a dedicated containment index would band the SMALL side's shingles
    * only. Same scale shape as [[minhashLsh]]: one hash pass, banded
    * equi-join, verify on candidate pairs only.
    */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.8,
      fastHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")
    val hashed = shingleHashed(docs, idCol, textCol, shingleK, fastHash)
    val cand = candidates(bandKeys(hashed, numHashes, bands, rows))
    cand
      .join(hashed.select(col("doc_id").as("doc_a"), col("hashes").as("ha")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("hashes").as("hb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("double"))
      .withColumn("cont_a", col("inter") / size(col("ha")).cast("double"))
      .withColumn("cont_b", col("inter") / size(col("hb")).cast("double"))
      .filter(col("cont_a") >= threshold || col("cont_b") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("cont_a"), 6).as("cont_a"), round(col("cont_b"), 6).as("cont_b"))
  }

  /** MinHash estimator accuracy per LSH candidate pair: the estimated
    * Jaccard (fraction of agreeing signature components — the number the
    * sketch would report if verification were skipped) next to the exact
    * Jaccard on the distinct shingle-hash sets, both in exact integer
    * permille so the audit is engine-order-independent. This is the
    * measurement behind the "verify candidates or trust the sketch?"
    * sizing decision: with 12 components the estimator's std dev is
    * ~sqrt(J(1-J)/12) ≈ 0.14, and the report shows that error at the
    * corpus's true pair distribution instead of the binomial formula.
    * Scale shape: identical to [[minhashLsh]] (one hash pass, banded
    * equi-join, per-candidate verify); the audit adds only the 12-term
    * component comparison to the verify join it would run anyway.
    */
  def minhashAccuracy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      fastHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")
    val hashed = shingleHashed(docs, idCol, textCol, shingleK, fastHash)
    val sigs = hashed
      .withColumn("sig", minhashSignature(col("hashes"), numHashes))
      .persistTracked()
    val cand = candidates(sigs
      .withColumn("band", explode(lshBands(col("sig"), bands, rows)))
      .select("doc_id", "band"))
    cand
      .join(sigs.select(col("doc_id").as("doc_a"),
        col("hashes").as("ha"), col("sig").as("sa")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"),
        col("hashes").as("hb"), col("sig").as("sb")), "doc_b")
      .withColumn("agree",
        expr(s"size(filter(sequence(0, ${numHashes - 1}), i -> sa[i] = sb[i]))")
          .cast("long"))
      .withColumn("est_pm",
        expr(s"CAST(agree * 1000 div $numHashes AS BIGINT)"))
      .withColumn("exact_pm", expr(
        "CAST(size(array_intersect(ha, hb)) * 1000 div " +
          "size(array_union(ha, hb)) AS BIGINT)"))
      .select("doc_a", "doc_b", "est_pm", "exact_pm")
  }

  /** The shingle-hash map stage shared by the minhash pipelines: spread it
    * over the cluster (Par.ensure — a small source arrives as one split)
    * and compute it ONCE (persist) — it is read repeatedly downstream
    * (banding twice via the self-join, verify twice). One base hash per
    * shingle (md5 for the oracle path, xxhash64 when `fastHash` — the
    * production configuration); the signature permutations downstream are
    * cheap affine mixes either way.
    */
  private def shingleHashed(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, fastHash: Boolean): DataFrame =
    Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
      .withColumn("toks", tokens(col("text")))
      .withColumn("sh", shingles(col("toks"), shingleK))
      .withColumn("hashes", array_distinct(shingleHashes(col("sh"), fastHash)))
      .select("doc_id", "hashes")
      .persistTracked()

  /** Public form of [[shingleHashed]] for artifact persistence: the
    * (doc_id, hashes) signature index a deployment stores alongside the
    * cluster assignment so shard maintenance never re-hashes the
    * standing corpus ([[minhashIncrementalFromIndex]] consumes it).
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, fastHash: Boolean = false): DataFrame =
    shingleHashed(docs, idCol, textCol, shingleK, fastHash)

  /** Exploded LSH band keys (doc_id, band) of a [[shingleHashed]] table. */
  private def bandKeys(hashed: DataFrame, numHashes: Int, bands: Int, rows: Int): DataFrame =
    hashed
      .withColumn("sig", minhashSignature(col("hashes"), numHashes))
      .withColumn("band", explode(lshBands(col("sig"), bands, rows)))
      .select("doc_id", "band")

  /** Distinct ordered candidate pairs from a banded frame — ONE
    * definition of candidate generation (band equi-join, doc_a < doc_b,
    * dedup across shared bands) so the production pair path and the
    * accuracy audit can never bucket differently.
    */
  private def candidates(banded: DataFrame): DataFrame =
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

  /** Exact-Jaccard verification of candidate (doc_a, doc_b) pairs against
    * the distinct shingle-hash sets; emits pairs >= threshold, rounded.
    */
  private def verifyJaccard(cand: DataFrame, hashed: DataFrame, threshold: Double): DataFrame =
    cand
      .join(hashed.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("hashes", "ha"), "doc_a")
      .join(hashed.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("hashes", "hb"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("ha"), col("hb"))).cast("double") /
          size(array_union(col("ha"), col("hb"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))

  /** Incremental MinHash-LSH: near-dup pairs INVOLVING a new shard, deduped
    * against an existing corpus WITHOUT re-pairing the old corpus against
    * itself — the production maintenance shape: as shards arrive, the
    * banded index of the old corpus is a persisted asset (at scale, a
    * bucketed table keyed by band), each new shard contributes its own
    * band keys, and candidate generation is (new ⋈ old-index) ∪
    * (new ⋈ new) — old×old, the quadratically dominant term of a full
    * re-run, is never generated. Returns exactly
    * `minhashLsh(old ∪ new)` restricted to pairs with at least one new
    * doc (DedupSpec pins the equality). Ids must be unique across both
    * inputs; pairs are ordered (doc_a, doc_b) = (min id, max id).
    */
  def minhashIncremental(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      fastHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")

    val oldHashed = shingleHashed(oldDocs, idCol, textCol, shingleK, fastHash)
    minhashIncrementalFromIndex(oldHashed, newDocs, idCol, textCol,
      shingleK, numHashes, bands, threshold, fastHash)
  }

  /** [[minhashIncremental]] against a PERSISTED signature index: the
    * standing corpus's (doc_id, hashes) table — the md5-heavy shingle
    * pass that dominates maintenance cost — is read back instead of
    * recomputed (the production shape: the index is part of the standing
    * dedup artifact, alongside the cluster assignment). Only the new
    * shard is hashed per run. `oldIndex` must be a (doc_id, hashes)
    * frame as produced by [[shingleIndex]].
    */
  def minhashIncrementalFromIndex(
      oldIndex: DataFrame,
      newDocs: DataFrame,
      idCol: String,
      textCol: String,
      shingleK: Int = 3,
      numHashes: Int = 12,
      bands: Int = 4,
      threshold: Double = 0.5,
      fastHash: Boolean = false): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "numHashes must be divisible by bands")

    // persist only a COLD external index (the parquet-artifact path);
    // the minhashIncremental delegation already hands over a cached
    // frame, and re-persisting the projection would materialize a
    // second in-memory copy of the whole signature table
    val oldHashed = {
      val proj = oldIndex.select("doc_id", "hashes")
      if (oldIndex.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        proj.persistTracked()
      else proj
    }
    val newHashed = shingleHashed(newDocs, idCol, textCol, shingleK, fastHash)
    val oldBanded = bandKeys(oldHashed, numHashes, bands, rows)
    val newBanded = bandKeys(newHashed, numHashes, bands, rows)

    val crossCand = oldBanded.as("a")
      .join(newBanded.as("b"), col("a.band") === col("b.band"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val newCand = newBanded.as("a")
      .join(newBanded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = crossCand.unionByName(newCand).distinct()

    verifyJaccard(cand, oldHashed.unionByName(newHashed), threshold)
  }

  /** SimHash near-duplicate pairs: 32-bit simhash per doc, bucketed by the
    * top `32 - bucketShift` bits (docs in different buckets are never
    * compared — at scale this is the difference between a shuffle join and
    * an impossible cross join), then Hamming-verified within buckets.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bucketShift: Int = 24,
      maxHamming: Int = 8): DataFrame = {
    // Simhash per doc is ONE narrow pass via the fused byte-scan kernel
    // (graft.functions.TokenStats) — no token explode, no 32-counter
    // shuffle aggregate (the round-2/3 shape; see TextStats Scaladoc).
    // Zero-token docs are excluded as before (they can't be near-dup'd
    // by content bits; handle with [[exact]]).
    // Both sides of the bucket self-join read `sims`; persist so the
    // tokenize+md5 scan runs once.
    val sims = Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
      .select(col("doc_id"), tokenStats(col("text")).as("st"))
      .filter(col("st.n_tokens") > 0)
      .select(col("doc_id"), col("st.simhash").as("simhash"))
      .withColumn("bucket", shiftright(col("simhash"), bucketShift))
      .persistTracked()

    sims.as("a")
      .join(sims.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", hammingDistance(col("a.simhash"), col("b.simhash")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"), col("hamming"))
  }

  /** Word-n-gram Jaccard near-duplicate pairs via a RARE-GRAM inverted
    * index: candidate pairs must share at least one n-gram whose document
    * frequency is <= `maxDf`. The df cap is the scale lever — ubiquitous
    * n-grams ("of the", "in a") would otherwise each contribute O(df^2)
    * candidate pairs and recreate the all-pairs join this module exists to
    * avoid. Docs whose every n-gram is common are unpairable here (they can
    * still be caught by [[minhashLsh]]); near-identical docs always share a
    * rare n-gram unless the corpus is pathological.
    *
    * Verification is exact Jaccard over the full distinct n-gram-hash sets.
    */
  def ngramJaccard(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxDf: Int = 10,
      threshold: Double = 0.5): DataFrame = {
    // `grams` feeds the posting list (explode → df count → rare join, with
    // the self-join reading it twice) AND both sides of the verify join —
    // six consumers of the md5-heavy shingle map. Parallelize + persist or
    // every consumer re-runs the scan single-threaded on a small input.
    // toks MUST be staged as its own projection: the shingle lambda
    // references it per element, and an inlined tokens(text) subtree would
    // re-run the regex split once per gram (~30× blowup, NOTES_r7)
    val grams = Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
      .withColumn("toks", tokens(col("text")))
      .withColumn("gram_hashes",
        array_distinct(shingleHashes(shingles(col("toks"), n))))
      .select("doc_id", "gram_hashes")
      .persistTracked()

    val posting = grams
      .select(col("doc_id"), explode(col("gram_hashes")).as("gram"))
    val rare = posting.groupBy("gram")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select("gram")
    // Both sides of the candidate self-join read this; persist so the
    // df-cap groupBy runs once.
    val rarePosting = posting.join(rare, "gram").persistTracked()

    val cand = rarePosting.as("a")
      .join(rarePosting.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    cand
      .join(grams.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("gram_hashes", "ga"), "doc_a")
      .join(grams.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("gram_hashes", "gb"), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("ga"), col("gb"))).cast("double") /
          size(array_union(col("ga"), col("gb"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding near-duplicate pairs via sign-LSH (random-hyperplane family,
    * axis-aligned planes): bucket key = sign bits of the first `signBits`
    * dimensions; candidates share a bucket; verify with exact cosine.
    * `embs` must carry (`id`, `vec` array<double>). Returns
    * (vec_a, vec_b, sim) with cosine01 >= minCos01.
    */
  def embeddingNearDup(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      signBits: Int = 12,
      minCos01: Double = 0.999): DataFrame = {
    import graft.functions.VectorFunctions
    val bucket: Column = (1 to signBits).map { i =>
      when(element_at(col("vec"), i) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // No persist here: the sign-bit bucket key is trivia next to the scan,
    // so recomputing both self-join sides beats serializing the vectors.
    val keyed = embs.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", bucket)
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("sim", round(VectorFunctions.cosine01(col("a.vec"), col("b.vec")), 6))
      .filter(col("sim") >= minCos01)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"), col("sim"))
  }

  /** Winnowing fingerprints per document (Schleimer et al. 2003, "Winnowing:
    * Local Algorithms for Document Fingerprinting" — the MOSS algorithm):
    * hash every k-token shingle, slide a `window`-wide window over the hash
    * sequence, keep the minimum of each window, dedup. Winnowing's guarantee
    * is positional robustness: any shared run of `window + k - 1` tokens
    * between two documents yields at least one shared fingerprint, while the
    * selected density is ~2/(window+1) of all grams — a fixed-rate sample
    * that, unlike "every j-th gram", cannot be defeated by an insertion
    * shifting gram positions. (The paper's robust rule picks the RIGHTMOST
    * minimal occurrence per window; the selected VALUE per window is the min
    * either way, so the distinct-value fingerprint SET — all this pipeline
    * keys on — is identical.) Fewer grams than `window` → one fingerprint,
    * the global min.
    *
    * Entirely per-row (narrow map over the scan): returns
    * (doc_id, fingerprints array<bigint>).
    */
  def winnowFingerprints(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      window: Int = 4,
      fastHash: Boolean = false): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      // toks/hashes staged as real columns: the window lambda references
      // them per element, and an inlined subtree would re-run the regex
      // split once per window (the HOF-capture trap, NOTES_r7)
      .withColumn("toks", tokens(col("text")))
      .withColumn("hashes", shingleHashes(shingles(col("toks"), k), fastHash))
      .select(col("doc_id"), winnowFps(col("hashes"), window).as("fingerprints"))

  /** Cross-document overlap detection over winnowing fingerprints: explode
    * the per-doc fingerprint sets into a posting list, drop fingerprints
    * shared by more than `maxDf` documents (boilerplate — the same
    * frequent-gram cap MOSS applies, and the join-fan-out bound: a
    * fingerprint in f docs contributes f² candidate pairs), self-join on
    * the fingerprint, and keep pairs sharing >= `minShared` fingerprints.
    * Returns (doc_a, doc_b, n_shared).
    *
    * Scale shape: candidate generation is the bucketed equi-join on the
    * fingerprint value — O(sum over fingerprints of df²), df-capped —
    * never all-pairs; counts are map-side combined.
    */
  def winnowing(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      window: Int = 4,
      maxDf: Int = 20,
      minShared: Int = 2,
      fastHash: Boolean = false): DataFrame = {
    // Par.ensure BEFORE the fingerprint map (a small parquet source
    // coalesces to one split; a repartition placed downstream would run
    // the whole md5+winnow stage single-core below the exchange), and —
    // load-bearing — persist the FINGERPRINT TABLE, not the exploded
    // posting list. Exploding an expensive computed array directly makes
    // InferFiltersFromGenerate emit `size(fps) > 0` under the Generate,
    // and predicate pushdown then inlines the ENTIRE fingerprint
    // expression into that filter — where the window lambda's
    // slice(hashes, j, w) re-evaluates the tokenize+shingle+md5 subtree
    // once PER WINDOW POSITION (~200× per doc; measured 55 s vs 2 s on
    // the 10k-doc probe corpus, NOTES_r7). The InMemoryRelation boundary
    // stops the pushdown; the three downstream consumers (df-cap
    // aggregate + both self-join sides) re-explode from the cache, which
    // is cheap.
    val spread = Par.ensure(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
    val fps = winnowFingerprints(spread, "doc_id", "text", k, window, fastHash)
      .persistTracked()
    val posting = fps.select(col("doc_id"), explode(col("fingerprints")).as("f"))
    val rare = posting.groupBy("f")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf && col("df") >= 2)
      .select("f")
    val rarePosting = posting.join(rare, "f")
    rarePosting.as("a")
      .join(rarePosting.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  // ------------------------------------------------- source-level overlap

  private def componentMins(grouped: DataFrame, numHashes: Int): DataFrame =
    grouped.groupBy("source")
      .agg((1 to numHashes).map(i => min(element_at(col("sig"), i)).as(s"v$i")).head,
        (2 to numHashes).map(i => min(element_at(col("sig"), i)).as(s"v$i")): _*)
      .select(col("source"),
        array((1 to numHashes).map(i => col(s"v$i")): _*).as("sig"))

  /** Per-source MinHash sketch (q108): the component-wise min of the
    * per-doc signatures — min is associative, so this EXACTLY equals the
    * signature of the source's unioned shingle set (SketchSpec pins the
    * equality) and sketches merge shard-by-shard
    * ([[mergeSourceSketches]]) with O(sources × numHashes) state at any
    * corpus size. Output: (source, sig array<bigint>). The doc-signature
    * frame is materialized before the rollup and the shingle-less filter
    * reads the CACHED null marker — a HOF chain in a Filter condition
    * drops the stage to interpreted evaluation (the q108 finding,
    * NOTES_r9; ~8× at sf0.1).
    */
  def sourceSketch(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, shingleK: Int = 3, numHashes: Int = 12,
      fastHash: Boolean = false): DataFrame = {
    val sig = Par.ensure(
      docs.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
        col(textCol).as("text")), "doc_id")
      .withColumn("toks", tokens(col("text")))
      .withColumn("sh", shingles(col("toks"), shingleK))
      .withColumn("hashes", array_distinct(shingleHashes(col("sh"), fastHash)))
      .withColumn("sig", minhashSignature(col("hashes"), numHashes))
      .select("source", "doc_id", "sig")
      .persistTracked()
      .filter(element_at(col("sig"), 1).isNotNull)
    componentMins(sig, numHashes)
  }

  /** Fold sketches together WITHOUT touching the data that produced them
    * (associativity of min): the incremental-maintenance path — sketch
    * each arriving shard, merge into the standing per-source sketch.
    * SketchSpec pins merge(half sketches) == full-corpus sketch. */
  def mergeSourceSketches(a: DataFrame, b: DataFrame,
      numHashes: Int = 12): DataFrame =
    componentMins(a.unionByName(b), numHashes)

  /** Pairwise source-overlap estimates from a sketch: the equal-component
    * fraction (the standard MinHash Jaccard estimator) for every source
    * pair. Persist the (|sources|-row) sketch before calling — both join
    * sides read it. */
  def sourceOverlap(sketch: DataFrame, numHashes: Int = 12): DataFrame =
    sketch.as("a").join(sketch.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        round(size(filter(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => x === y), p => p)).cast("double") / numHashes.toDouble, 6)
          .as("overlap"))

  /** Content-defined chunking: cut the token stream wherever
    * hash32(token) ≡ 0 (mod `boundaryMod`), so boundaries are anchored to
    * CONTENT, not position — an edit perturbs only the chunk it lands in
    * (at most splitting it in two), where fixed-stride segmentation
    * re-keys every later segment of the document (DedupSpec pins the
    * contrast). Expected chunk length is `boundaryMod` tokens. Returns
    * one row per (doc_id, chunk_idx) with the chunk's md5 and token
    * count. Scale shape: posexplode is narrow, the boundary prefix-sum
    * and the chunk re-assembly are windows/aggregates PARTITIONED by
    * doc — the token stream never shuffles across documents.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
      boundaryMod: Int = 8, fastHash: Boolean = false): DataFrame = {
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
    val bhash = (c: Column) =>
      if (fastHash) hash32Fast(c) else hash32(c)
    val chash = (c: Column) =>
      if (fastHash) xxhash64(c).cast("string") else md5(c)
    docs.select(col(idCol).as("doc_id"), posexplode(tokens(col(textCol))))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "tok")
      .withColumn("bnd",
        when(pmod(bhash(concat(lit("cdc|"), col("tok"))),
          lit(boundaryMod.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk_idx", sum(col("bnd")).over(wb) - col("bnd"))
      .groupBy("doc_id", "chunk_idx")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("p"), col("tok")))),
          x => x.getField("tok")), " ").as("chunk_text"),
        count(lit(1)).as("chunk_len"))
      .select(col("doc_id"), col("chunk_idx"),
        chash(col("chunk_text")).as("chunk_hash"), col("chunk_len"))
  }

  /** Cross-document duplicated-chunk rollup over [[cdcChunks]]: chunks
    * appearing in ≥ `minDocs` distinct documents, with occurrence
    * counts. A hash-keyed aggregate — counts, never candidate pairs. */
  def cdcDupChunks(docs: DataFrame, idCol: String, textCol: String,
      boundaryMod: Int = 8, minDocs: Int = 2,
      fastHash: Boolean = false): DataFrame =
    cdcChunks(docs, idCol, textCol, boundaryMod, fastHash)
      .groupBy("chunk_hash")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"),
        max(col("chunk_len")).as("chunk_len"))
      .filter(col("n_docs") >= minDocs)
}
