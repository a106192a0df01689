package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, portable content hashing, shingling, MinHash, SimHash,
  * language-ID heuristics, quality scoring, fingerprinting.
  *
  * All are pure Catalyst expressions (no UDFs) so they stay inside
  * whole-stage codegen and — critically for the correctness harness — are
  * reproducible in ANSI SQL on any engine (the DuckDB oracle evaluates the
  * same md5-based hashes).
  */
object TextFunctions {

  /** Whitespace tokenization; empty strings removed. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Portable 32-bit non-negative hash: first 8 hex chars of md5 as a long.
    * Chosen over murmur3 `hash()` because md5 is identically computable in
    * every SQL dialect (the oracle must reproduce it bit-for-bit).
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Production-path 32-bit non-negative hash: low 32 bits of Spark's
    * codegen'd `xxhash64`. Same contract as [[hash32]] (value in
    * [0, 2^32) so the minhash affine mixes stay inside signed-64 range)
    * but ~an order of magnitude cheaper than md5 — xxHash is a few
    * multiply/rotate rounds per word vs md5's 64-round digest, and
    * Spark evaluates it without the hex-string round-trip `hash32`
    * needs for SQL portability. NOT oracle-reproducible (DuckDB has no
    * xxhash64), so oracled queries keep md5 and benchmark twins measure
    * this path (VERDICT r6 #2).
    */
  def hash32Fast(s: Column): Column =
    xxhash64(s).bitwiseAND(lit(0xFFFFFFFFL))

  /** Content hash exactly as the reference stores it: base64(SHA-256(text)),
    * 44 chars (`src/Server/Helper/SearchdomainHelper.cs:455-458`). Spark's
    * sha2 returns hex, hence the unhex round-trip.
    */
  def contentHash(text: Column): Column =
    base64(unhex(sha2(text, 256)))

  /** k-word shingles joined by a single space. Documents shorter than k
    * tokens yield an empty array.
    *
    * Built as a zip of k shifted slices, NOT a positional lambda doing
    * element_at(toks, i+j): a lambda body that references the `toks`
    * SUBTREE re-evaluates it per element whenever the expression runs
    * interpreted (HOFs are CodegenFallback — in a Filter condition, or
    * under nesting that defeats codegen), turning one tokenize into
    * ~positions × k tokenizes per row (the round-9 q108/q81 cliff,
    * NOTES_r9). Here every lambda touches only its own lambda variables;
    * `toks` is referenced a bounded k+2 times per row in any mode.
    */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks) - (k - 1)
    val parts = (0 until k).map(j => slice(toks, lit(j + 1), n))
    when(size(toks) < k, array().cast("array<string>"))
      .otherwise(parts.reduce((acc, p) =>
        zip_with(acc, p, (x, y) => concat_ws(" ", x, y))))
  }

  /** Base hash per shingle — computed ONCE per shingle; the k minhash
    * functions are derived from it with cheap affine mixes (standard
    * one-hash-many-permutations trick). At 100 TB this turns
    * numHashes × shingles md5 calls per doc into shingles md5 calls.
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => hash32(s))

  /** [[shingleHashes]] with a hash choice: `fast = true` swaps the
    * portable md5-derived [[hash32]] for the codegen'd [[hash32Fast]]
    * (xxhash64). Both satisfy the < 2^32 contract the minhash affine
    * mixes rely on, so the whole LSH pipeline downstream is unchanged.
    */
  def shingleHashes(shingleCol: Column, fast: Boolean): Column =
    if (fast) transform(shingleCol, s => hash32Fast(s)) else shingleHashes(shingleCol)

  /** Per-seed affine-permutation constants from a splitmix64 sequence:
    * large decorrelated odd multipliers (< 2^30 so h·mult + add stays well
    * inside signed-64 range for h < 2^32 — portable to any SQL engine's
    * BIGINT) and 32-bit addends. Tiny sequential multipliers (3,5,7,…)
    * would be highly correlated affine maps and silently cut LSH recall.
    */
  def minhashConsts(seed: Int): (Long, Long) = {
    var z = (seed + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val mult = (z & 0x3FFFFFFFL) | 1L   // odd, < 2^30
    val add  = (z >>> 32) & 0xFFFFFFFFL // < 2^32
    (mult, add)
  }

  /** k-th minhash permutation over pre-computed base hashes:
    * h_k = (h·mult_k + add_k) mod 2^32 with splitmix-derived constants.
    * Empty shingle set -> null.
    */
  def minhashFromHashes(hashes: Column, seed: Int): Column = {
    val (mult, add) = minhashConsts(seed)
    array_min(transform(hashes,
      h => pmod(h * lit(mult) + lit(add), lit(4294967296L))))
  }

  /** Full MinHash signature of `numHashes` values from base hashes —
    * the fused one-pass codegen kernel ([[MinhashSig]]); value-identical
    * to `array(minhashFromHashes(_, k)*)` (PropertySpec pins the
    * equivalence, the q45 oracle pins the values).
    */
  def minhashSignature(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(MinhashSig(CB.expression(hashes), numHashes))
  }

  /** The HOF reference form of [[minhashSignature]] (one array walk per
    * permutation) — kept as the property-test oracle for the fused kernel.
    */
  def minhashSignatureHof(hashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map(seed => minhashFromHashes(hashes, seed)): _*)

  /** LSH band keys: the signature split into `bands` bands of
    * `rows = numHashes/bands` values each, each band reduced to a single
    * string key "bandIdx:v1,v2,...". Docs sharing any band key are
    * candidate near-duplicates (classic MinHash-LSH banding).
    * Docs with no shingles (shorter than k tokens) get NO band keys —
    * otherwise every short doc would collide into one "null" bucket.
    */
  def lshBands(signature: Column, bands: Int, rows: Int): Column =
    when(element_at(signature, 1).isNull, array().cast("array<string>"))
      .otherwise(array((0 until bands).map { b =>
        concat_ws(",",
          lit(s"$b") +: (0 until rows).map(r => element_at(signature, b * rows + r + 1).cast("string")): _*)
      }: _*))

  /** 32-bit SimHash over a token array (weight 1 per token occurrence):
    * bit i of the result is set iff sum over tokens of ±1 (per token-hash
    * bit i) is positive.
    */
  /** shiftright with a Column shift amount (the Scala functions API only
    * exposes an Int overload).
    */
  private def shr(x: Column, i: Column): Column = call_function("shiftright", x, i)
  private def shl(x: Column, i: Column): Column = call_function("shiftleft", x, i)

  def simhash(toks: Column): Column = {
    val hashes = transform(toks, t => hash32(t))
    val counters = aggregate(
      hashes,
      array_repeat(lit(0L), 32),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(31)),
        (c, i) => c + when(shr(h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(counters, sequence(lit(0), lit(31)),
        (c, i) => when(c > 0, shl(lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** Hamming distance between two simhash values: codegen popcount of the
    * XOR (`bit_count` compiles to Long.bitCount — the interpreted
    * 32-iteration HOF fold ran per candidate PAIR and dominated the
    * simhash verify join).
    */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Stopword-marker counts per language — a deterministic n-gram-style
    * language-ID heuristic. Returns the arg-max language with fixed
    * precedence order for ties.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** Heuristic language-ID: greatest marker count wins; ties and all-zero
    * fall through in declaration order, defaulting to "und".
    *
    * Prefer [[langIdFromTokens]] over a pre-materialized lowercase token
    * column in pipelines: this convenience form embeds the tokenize
    * expression once per marker count (~11 copies), which Catalyst cannot
    * de-duplicate inside a when-chain of non-codegen HOFs.
    */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  /** Language-ID over an already-tokenized lowercase token array column —
    * materialize it with `withColumn` so the split runs once per row.
    */
  def langIdFromTokens(toksLower: Column): Column = {
    val counts = langMarkers.map { case (lang, ms) => lang -> markerCount(toksLower, ms) }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.foldRight(lit("und"): Column) { case ((lang, c), acc) =>
      when(c === best && c > 0, lang).otherwise(acc)
    }
  }

  /** BPE-style sub-token counting without a vocabulary: a regex pre-tokenizer
    * in the GPT-2 family's shape — letter runs stay whole, every digit is its
    * own token, punctuation is one token per character. Counts the
    * pre-tokens a byte-pair encoder would start from; a cheap, pure-codegen
    * estimator for per-document token budgets at corpus scale.
    */
  val bpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0))).cast("long")

  /** Quality-scoring feature columns (length / punctuation / stopword
    * ratios), usable for filter thresholds on a 100 TB corpus.
    */
  /** Whitespace token count — the fused zero-allocation byte-scan kernel
    * ([[WsTokenCount]]); value-identical to `size(tokens(text))`
    * (PropertySpec pins the equivalence).
    */
  def tokenCount(text: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(WsTokenCount(CB.expression(text)))
  }

  /** Unicode normalization ([[UnicodeNormalize]]): mode `nfc`, `nfkc`,
    * or `strip` (NFD + drop combining marks — accent removal).
    */
  def unicodeNormalize(text: Column, mode: String): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(UnicodeNormalize(CB.expression(text), mode))
  }

  /** Fused per-document statistics `struct(n_tokens, sum_tlen,
    * fingerprint, simhash)` in one byte-scan pass ([[TokenStats]]);
    * field-by-field identical to size(tokens)/length-sum/[[fingerprint]]/
    * [[simhash]] (PropertySpec pins the equivalence).
    */
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.graft.{ColumnBridge => CB}
    CB.column(TokenStats(CB.expression(text)))
  }

  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0)
      .otherwise(aggregate(t, lit(0.0), (acc, x) => acc + length(x).cast("double")) /
        size(t).cast("double"))
  }

  def stopwordRatio(text: Column): Column = {
    val stop = Seq("the", "a", "and", "of", "to", "is", "in", "that", "it", "for")
    val t = tokens(lower(text))
    when(size(t) === 0, 0.0)
      .otherwise(markerCount(t, stop).cast("double") / size(t).cast("double"))
  }

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", ""))).cast("double") /
        length(text).cast("double"))

  /** Composite quality score in [0,1]: rewards mid-length docs with healthy
    * stopword presence and low punctuation density.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / lit(100.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    round((lenScore + stopScore + punctPenalty) / 3.0, 6)
  }

  /** Position-sensitive document fingerprint: sum over tokens of
    * hash32(token) * (1-based position), mod 2^31 (kept non-negative and
    * portable to the SQL oracle — unlike a sequential rolling hash this is
    * a single associative aggregate, so it parallelizes).
    */
  /** Winnowing fingerprint selection over a precomputed gram-hash array
    * (Schleimer et al. '03 — see [[graft.ops.Dedup.winnowFingerprints]]
    * for the positional-robustness guarantee): the min of each sliding
    * `window` over the hash sequence, distinct. Empty input → empty
    * array; fewer hashes than `window` → one fingerprint, the global min.
    * Pass a MATERIALIZED column (withColumn-staged), not a computed
    * expression: the window lambda references the array once per
    * position, and an inlined computed subtree would re-evaluate per
    * window (the HOF-capture trap, NOTES_r7).
    */
  def winnowFps(hashes: Column, window: Int): Column =
    when(size(hashes) === 0, array().cast("array<bigint>"))
      .when(size(hashes) < window, array(array_min(hashes)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(hashes) - (window - 1)),
        j => array_min(slice(hashes, j, lit(window))))))

  def fingerprint(toks: Column): Column =
    // empty guard: sequence(1, 0) yields a DESCENDING [1,0] (not an empty
    // array), which would zip against null tokens and null the whole sum.
    // Mod-per-term BEFORE the sum: a raw long sum of h×position wraps
    // around ~65k tokens (diverging from the oracle's 128-bit list_sum);
    // Σ(tᵢ mod M) mod M ≡ Σtᵢ mod M stays exact in long arithmetic.
    when(size(toks) === 0, 0L).otherwise(pmod(
      aggregate(
        zip_with(toks, sequence(lit(1), size(toks)),
          (t, i) => pmod(hash32(t) * i.cast("long"), lit(2147483647L))),
        lit(0L), (acc, x) => acc + x),
      lit(2147483647L)))
}
