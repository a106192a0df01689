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
