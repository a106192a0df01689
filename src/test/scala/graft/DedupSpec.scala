package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog again and again extra"), // near dup
    (4L, "completely different content about database query optimization topics"),
    (5L, "xy")) // shorter than shingle k
    .toDF("doc_id", "text")

  test("exact dedup keeps min id per content and counts dups") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got(1L) == 1L) // keeper 1 has exactly one duplicate (doc 2)
    assert(got(3L) == 0L && got(4L) == 0L && got(5L) == 0L)
    assert(!got.contains(2L))
  }

  test("minhash LSH finds exact and near dups, skips short docs, no false pairs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", shingleK = 3, numHashes = 12,
      bands = 4, threshold = 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // identical -> jaccard 1
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // distinct content
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // no shingles -> no bands
  }

  test("containment pairs: token-truncated subset flags at cont 1.0, " +
      "symmetric near-dups flag both directions, distinct content stays out") {
    // doc 6 = first half of doc 4's tokens: its shingle set is a strict
    // subset, so containment on the small side is exactly 1.0 while
    // Jaccard is well below a symmetric threshold
    val subset = Seq((6L, "completely different content about database"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs.unionByName(subset), "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got((4L, 6L))._2 == 1.0) // truncated side fully contained
    assert(got((4L, 6L))._1 < 0.8)  // big side NOT contained in the excerpt
    assert(got((1L, 2L)) == ((1.0, 1.0))) // exact dup: both directions
    assert(!got.keySet.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhash pairs: identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", bucketShift = 24, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs(1L -> 2L) == 0L)
  }

  test("embedding near-dup: scale-invariant cosine pairs via sign-LSH buckets") {
    val e = Seq(
      (1L, Seq(0.5, -0.25, 0.75, -0.1)),
      (2L, Seq(0.5005, -0.2502, 0.7507, -0.1001)), // ~same direction
      (3L, Seq(-0.5, 0.25, -0.75, 0.1))) // opposite: different bucket
      .toDF("vec_id", "vec")
    val pairs = Dedup.embeddingNearDup(e, "vec_id", "vec", signBits = 4, minCos01 = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("incremental minhash equals the full run restricted to new-doc pairs") {
    // old corpus = docs 1-5; new shard = near-copies of 1 and 4 plus a
    // fresh doc. The incremental result must be EXACTLY the full
    // (old ∪ new) LSH output minus old×old pairs — the skipped old×old
    // work has to be invisible in the result.
    val newShard = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again zzz"),
      (14L, "completely different content about database query optimization topics zzz"),
      (20L, "entirely fresh material that matches nothing in the old corpus here"))
      .toDF("doc_id", "text")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incremental = asSet(
      Dedup.minhashIncremental(docs, newShard, "doc_id", "text",
        shingleK = 3, numHashes = 12, bands = 4, threshold = 0.5))
    val fullFiltered = asSet(
      Dedup.minhashLsh(docs.unionByName(newShard), "doc_id", "text",
          shingleK = 3, numHashes = 12, bands = 4, threshold = 0.5)
        .filter(col("doc_a") >= 11L || col("doc_b") >= 11L))
    assert(incremental == fullFiltered)
    assert(incremental.exists { case (a, b, _) => a == 1L && b == 11L })
    assert(!incremental.exists { case (a, b, _) => a <= 5L && b <= 5L })
    assert(!incremental.exists { case (a, b, _) => a == 20L || b == 20L })
  }

  test("CDC chunking: an insertion perturbs at most its own chunk; " +
      "fixed-stride re-keys every later segment") {
    // 80 distinct tokens; the edited twin inserts one token near the
    // front. Content-anchored boundaries mean every chunk after the
    // edit point re-synchronizes (same tokens -> same boundary
    // decisions), so the chunk-hash symmetric difference is bounded by
    // 3 (edited chunk out; one or two replacement chunks in).
    val toksOrig = (0 until 80).map(i => s"w$i")
    val toksIns = toksOrig.take(5) ++ Seq("INSERTED") ++ toksOrig.drop(5)
    val corpus = Seq((1L, toksOrig.mkString(" ")), (2L, toksIns.mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(corpus, "doc_id", "text")
      .select("doc_id", "chunk_hash").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getString(1)).toSet }
    val cdcDiff = (chunks(1L) diff chunks(2L)) ++ (chunks(2L) diff chunks(1L))
    assert(cdcDiff.size <= 3,
      s"CDC symmetric difference ${cdcDiff.size} exceeds the locality bound")
    assert((chunks(1L) intersect chunks(2L)).nonEmpty)

    // Fixed-stride contrast: every 8-token segment from the insertion
    // point on shifts by one token, so nothing after it can match.
    def strideSegs(toks: Seq[String]): Set[String] =
      toks.grouped(8).map(_.mkString(" ")).toSet
    val so = strideSegs(toksOrig); val si = strideSegs(toksIns)
    assert((so diff si).size >= so.size - 1,
      "fixed-stride segmentation unexpectedly survived the insertion")

    // The duplicated-chunk detector sees the shared chunks as cross-doc
    // duplicates of exactly these two docs.
    val dup = Dedup.cdcDupChunks(corpus, "doc_id", "text").collect()
    assert(dup.nonEmpty && dup.forall(_.getLong(1) == 2L))
  }

  test("cluster chaining: transitively merged member has no direct keeper pair " +
      "(the q197 audit fires)") {
    // Overlapping-window chain: A and C share too little to pair directly,
    // but both pair with B — CC still merges all three. The chaining audit
    // (member with NO direct LSH pair to the keeper) must flag C and only C.
    // token prefix + stride picked so BOTH adjacent links surface as LSH
    // candidates under the fixed hash family (banding at J≈0.69 hits with
    // p≈0.8 per link; this fixture's draw hits both) while the A-C
    // Jaccard (≈0.47) stays below the 0.5 verify threshold
    val base = (0 until 40).map(i => s"item$i")
    val a = base.slice(0, 24) // tokens 0..23
    val b = base.slice(4, 28) // tokens 4..27: J(A,B) on 3-shingles ~ 0.69
    val c = base.slice(8, 32) // tokens 8..31: J(B,C) ~ 0.69, J(A,C) ~ 0.47 < 0.5
    val corpus = Seq(
      (10L, a.mkString(" ")), (20L, b.mkString(" ")), (30L, c.mkString(" ")),
      (40L, "unrelated content about spark physical plans and shuffle metrics"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(corpus, "doc_id", "text", shingleK = 3,
      numHashes = 12, bands = 4, threshold = 0.5)
    val got = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 20L), (20L, 30L)),
      s"chain fixture did not produce the A-B, B-C pair set: $got")
    val cc = graft.ops.Graph.connectedComponents(pairs, "doc_a", "doc_b")
    val comp = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(10L -> 10L, 20L -> 10L, 30L -> 10L),
      s"CC did not merge the chain into one keeper-10 cluster: $comp")
    // the q197 measure: members without a direct (keeper, member) pair
    val members = Set(20L, 30L)
    val direct = got.collect { case (a0, b0) if a0 == 10L => b0 }
    assert((members -- direct) == Set(30L),
      "chained-member detection should flag exactly the far end of the chain")
  }

  test("minhash accuracy audit: exact pm is the true Jaccard, est is the " +
      "signature agreement, identical docs read 1000/1000") {
    val base = (0 until 30).map(i => s"tok$i")
    val corpus = Seq(
      (1L, base.mkString(" ")),                 // original
      (2L, base.mkString(" ")),                 // exact copy: est = exact = 1000
      (3L, (base.slice(0, 24) ++ Seq("x", "y", "z", "w", "v", "u")).mkString(" ")),
      (4L, "entirely unrelated words about catalyst optimizer rules here"))
      .toDF("doc_id", "text")
    val rows = Dedup.minhashAccuracy(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // the exact-copy pair: both estimator and truth saturate
    assert(rows((1L, 2L)) == (1000L, 1000L), s"copy pair off: $rows")
    // every candidate's exact_pm must equal the set Jaccard recomputed here
    val shingleSets = Seq(
      1L -> base, 2L -> base,
      3L -> (base.slice(0, 24) ++ Seq("x", "y", "z", "w", "v", "u")))
      .map { case (id, toks) =>
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }.toMap
    rows.keys.filter(p => shingleSets.contains(p._1) && shingleSets.contains(p._2))
      .foreach { case (a, b) =>
        val (sa, sb) = (shingleSets(a), shingleSets(b))
        val want = (sa & sb).size.toLong * 1000L / (sa | sb).size.toLong
        assert(rows((a, b))._2 == want, s"exact_pm($a,$b) != set Jaccard")
      }
    // estimator granularity: est_pm is floor(k*1000/12) for k in 0..12
    val lattice = (0 to 12).map(k => k * 1000L / 12L).toSet
    rows.values.foreach { case (est, _) =>
      assert(lattice.contains(est), s"est_pm $est off the 12-component lattice")
    }
  }
}
