package graft

import org.apache.spark.sql.functions._

import graft.search.{Ann, SearchEngine}

/** ANN quality gates on the driver fixture (500 × 64-dim vectors,
  * deterministic): recall@10 of each approximate family against the
  * exact brute-force top-10, plus the cost side — how much of the corpus
  * each query actually scores.
  */
class AnnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")
  private lazy val queries = embs.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private lazy val exact: Map[Long, Set[Long]] =
    SearchEngine.topKJoin(embs.filter(col("vec_id") < 10), embs, 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(result: Map[Long, Set[Long]]): Double =
    exact.map { case (q, truth) =>
      result.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }.sum / exact.size

  test("IVF: recall@10 with nprobe=5 of 20 cells, scoring a fraction of the corpus") {
    val centroids = Ann.sampleCentroids(embs, 25) // 20 centroids
    val assigned = Ann.ivfAssign(embs, centroids)
    val got = Ann.ivfSearch(assigned, centroids, queries, k = 10, nprobe = 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = recallOf(got)
    info(s"measured recall@10 = $recall")
    // deterministic fixture: measured 0.59; gate with slack
    assert(recall >= 0.55, s"IVF recall@10 degraded: $recall")

    // cost: probing 5/20 cells touches ~25% of the corpus per query
    val cellSizes = assigned.groupBy("centroid_id").count()
      .agg(avg("count")).collect()(0).getDouble(0)
    assert(cellSizes * 5 < embs.count() * 0.5)
  }

  test("IVF assignment is shuffle-free: no exchange between corpus scan and argmin") {
    // round-4 rewrite: packed broadcast centroid array + per-row argmin
    // fold — the corpus side must carry NO Exchange (the round-3 form
    // pushed E×C rows through a per-vec_id window shuffle)
    val assigned = Ann.ivfAssign(embs, Ann.sampleCentroids(embs, 25))
    assigned.collect() // finalize AQE
    val plan = assigned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in ivfAssign plan:\n$plan")
    assert(!plan.contains("Window"), s"window survived the rewrite:\n$plan")
  }

  test("k-means refinement: Lloyd objective non-increasing, recall not degraded") {
    val c0 = Ann.sampleCentroids(embs, 25)
    val cost0 = Ann.assignmentCost(Ann.ivfAssign(embs, c0), c0)
    val c2 = Ann.kmeansRefine(embs, c0, iters = 2)
    val cost2 = Ann.assignmentCost(Ann.ivfAssign(embs, c2), c2)
    info(s"lloyd cost: sampled=$cost0 refined=$cost2")
    assert(cost2 <= cost0 * 1.0001, s"refinement increased the objective: $cost0 -> $cost2")

    val got = Ann.ivfSearch(Ann.ivfAssign(embs, c2), c2, queries, k = 10, nprobe = 5)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = recallOf(got)
    info(s"refined-centroid recall@10 = $recall")
    assert(recall >= 0.5, s"refined recall collapsed: $recall")
  }

  test("multi-probe sign-LSH: Hamming-1 probing lifts recall over single-bucket") {
    def recallAt(probe: Boolean): Double = recallOf(
      Ann.lshSearch(embs, queries, signBits = 4, k = 10, probeHamming1 = probe)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })
    val single = recallAt(false)
    val multi = recallAt(true)
    info(s"recall@10 single=$single multi=$multi")
    assert(multi > single, s"multi-probe ($multi) should beat single ($single)")
    assert(multi >= 0.5, s"multi-probe recall collapsed: $multi")
  }

  test("two-stage compressed scan + exact re-rank: recall@10 >= 0.9 at a <= 35% pool") {
    // VERDICT r8 #5: bucket gating alone cannot reach retrieval-grade
    // recall on this near-uniform fixture (multi-probe ceiling ~0.6 at
    // ~31% probed) — the production answer is a compressed-tier full scan
    // feeding an exact fp32 re-rank of a small pool. Gate: recall@10 >=
    // 0.9 while the re-rank touches <= 35% of the fp32 corpus per query.
    val n = embs.count()
    val pool = (n * 0.30).toInt // 30% of corpus at full precision
    val quantized = Ann.quantizeInt8(embs)
    val got = Ann.compressedSearch(quantized, embs, queries, k = 10, pool = pool)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = recallOf(got)
    info(s"two-stage recall@10 = $recall at pool = $pool/$n")
    assert(recall >= 0.9, s"two-stage recall@10 below gate: $recall")
  }

  test("int8 tier alone: compressed-recall datapoint and memory ratio") {
    // the PLANS.md vector-memory datapoint: how much recall the 4x-smaller
    // tier gives WITHOUT any fp32 re-rank (top-10 straight from the
    // quantized scan), plus the exact storage ratio per vector.
    val quantized = Ann.quantizeInt8(embs)
    val got = Ann.compressedSearch(quantized, embs, queries, k = 10, pool = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // pool == k: the "re-rank" re-orders but cannot add candidates, so
    // this measures the quantized ranking itself
    val recall = recallOf(got)
    info(s"int8-only recall@10 = $recall")
    assert(recall >= 0.8, s"int8 ranking fidelity collapsed: $recall")

    // round-trip fidelity: dequantized values within one quantization
    // step (scale/127) of the original
    val maxErr = embs.limit(50)
      .join(quantized.withColumnRenamed("vec_id", "vid"), col("vec_id") === col("vid"))
      .select(aggregate(
        zip_with(col("embedding"), Ann.dequantizeInt8(col("qscale"), col("qvec")),
          (a, b) => abs(a - b) / greatest(col("qscale"), lit(1e-9f))),
        lit(0.0), (m, e) => greatest(m, e.cast("double"))).as("relerr"))
      .agg(max("relerr")).collect()(0).getDouble(0)
    info(s"max per-dim error = $maxErr quantization steps (x scale)")
    assert(maxErr <= (1.0 / 127.0) * 1.01, s"int8 round-trip error too large: $maxErr")
  }

  test("sign-LSH: recall@10 within the query's own bucket") {
    val got = Ann.lshSearch(embs, queries, signBits = 4, k = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recall = recallOf(got)
    info(s"measured recall@10 = $recall")
    // single-probe LSH trades recall for a stateless O(corpus/2^bits)
    // probe; measured 0.22 on the near-uniform synthetic vectors (weak
    // cluster structure is the hard case for ANN) — gate pins collapse
    assert(recall >= 0.18, s"LSH recall@10 degraded: $recall")
  }
}
