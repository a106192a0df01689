package graft

import org.apache.spark.sql.DataFrame

import graft.ops.Dedup

/** Winnowing fingerprints (ops/Dedup.winnowing, behind q95) — pins the
  * paper's guarantee and the properties the oracle cannot express:
  * Schleimer et al.'s theorem is that any shared token run of length
  * >= window + k - 1 yields at least one shared fingerprint, REGARDLESS
  * of where the run sits in either document — the local-overlap
  * detection whole-document Jaccard dilutes away.
  */
class WinnowingSpec extends SparkSpec {

  private val K = 3
  private val W = 4
  // shared run of exactly W + K - 1 = 6 tokens — the guarantee boundary
  private val run = "alpha beta gamma delta epsilon zeta"

  private def pairs(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    import spark.implicits._
    Dedup.winnowing(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = K, window = W, maxDf = 20, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def fps(docs: Seq[(Long, String)]): Map[Long, Set[Long]] = {
    import spark.implicits._
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", K, W)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
  }

  test("a shared window+k-1 token run guarantees a shared fingerprint") {
    // the run is embedded at DIFFERENT positions in otherwise-disjoint docs
    val docs = Seq(
      1L -> s"$run one two three four five six seven eight nine ten",
      2L -> s"red green blue cyan magenta yellow black white $run")
    val f = fps(docs)
    assert((f(1L) intersect f(2L)).nonEmpty,
      "winnowing guarantee violated: shared 6-token run, no shared fingerprint")
    assert(pairs(docs) == Set((1L, 2L)))
  }

  test("an insertion before the shared run does not break detection") {
    // same doc with one token inserted up front: every gram position
    // shifts by one — a 'every j-th gram' sampler would miss, winnowing
    // must not
    val base = s"one two three four five $run six seven eight nine"
    val docs = Seq(10L -> base, 11L -> s"INSERTED $base")
    assert(pairs(docs).contains((10L, 11L)))
  }

  test("fingerprint density is well below the gram count") {
    // winnowing selects ~2/(w+1) of gram positions; a 40-token doc has 38
    // grams — the distinct fingerprint set must be a strict sample of it
    val text = (1 to 40).map(i => s"tok${i * 7 % 13}x$i").mkString(" ")
    val f = fps(Seq(1L -> text))(1L)
    assert(f.size < 38 / 2, s"expected a sparse sample, got ${f.size} of 38 grams")
    assert(f.nonEmpty)
  }

  test("disjoint documents share nothing; df-capped boilerplate makes no pairs") {
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    // 25 docs all containing ONLY the boilerplate text: every fingerprint
    // has df=25 > maxDf=20 → zero candidate pairs from boilerplate alone
    val docs = (1L to 25L).map(i => i -> boiler)
    assert(pairs(docs).isEmpty)
    // and two genuinely disjoint docs never pair
    assert(pairs(Seq(
      1L -> "aa bb cc dd ee ff gg hh ii jj",
      2L -> "kk ll mm nn oo pp qq rr ss tt")).isEmpty)
  }

  test("short docs fall back to the global-min fingerprint") {
    // 5 tokens → 3 grams < window → exactly one fingerprint, the min
    val f = fps(Seq(1L -> "alpha beta gamma delta epsilon"))(1L)
    assert(f.size == 1)
  }
}
