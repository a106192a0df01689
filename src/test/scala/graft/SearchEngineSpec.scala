package graft

import org.apache.spark.sql.functions._
import graft.core.StubEmbedder
import graft.search.SearchEngine

/** Golden end-to-end test: the distributed search pipeline must produce the
  * same ranking and scores as a single-threaded straight-line re-derivation
  * of the reference semantics (`Searchdomain.cs:183-258`).
  */
class SearchEngineSpec extends SparkSpec {
  import spark.implicits._

  val models = Seq("stub:alpha", "stub:beta")
  val dim = 16
  val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", "en", "s0"),
    (1L, "query engines score documents with vector similarity and rank them", "en", "s1"),
    (2L, "unrelated text about cooking pasta with tomato sauce tonight", "en", "s2"),
    (3L, "vector similarity search over document embeddings at scale", "en", "s3"),
    (4L, "the rank of a document depends on similarity to the query text", "en", "s4"))
    .toDF("doc_id", "text", "lang", "source")

  // ---- straight-line oracle ----
  private val embedder = new StubEmbedder(dim)
  private def dot(a: Array[Float], b: Array[Float]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i).toDouble * b(i).toDouble)
  private def cos01(a: Array[Float], b: Array[Float]): Double =
    (dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) + 1.0) / 2.0
  private def euclid01(a: Array[Float], b: Array[Float]): Double = {
    val s = a.indices.foldLeft(0.0) { (acc, i) =>
      val d = a(i).toDouble - b(i).toDouble; acc + d * d
    }
    1.0 / (1.0 + math.sqrt(s))
  }
  private def manhattan01(a: Array[Float], b: Array[Float]): Double =
    1.0 / (1.0 + a.indices.foldLeft(0.0)((acc, i) => acc + math.abs(a(i).toDouble - b(i).toDouble)))
  private def simFor(datapointId: Long): (Array[Float], Array[Float]) => Double =
    Seq(cos01 _, euclid01 _, manhattan01 _, cos01 _)((datapointId % 4).toInt)

  private def oracleSearch(query: String, topN: Int): Seq[(String, Double)] = {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val qv = models.map(m => m -> embedder.embed(m, query)).toMap
    rows.map { case (id, text) =>
      val toks = text.split("\\s+").filter(_.nonEmpty)
      val dps = Seq(toks.take(8).mkString(" "), text) // title, body
      val dpScores = dps.zipWithIndex.map { case (dpText, dpIdx) =>
        val sim = simFor(id * 2 + dpIdx) // per-DATAPOINT method dispatch
        val perModel = models.map(m => sim(embedder.embed(m, dpText), qv(m)))
        perModel.sum / perModel.size // datapoint probmethod = Mean
      }
      (s"doc_$id", dpScores.sum / dpScores.size) // entity probmethod = Mean
    }.sortBy { case (n, s) => (-s, n) }.take(topN).toSeq
  }

  test("distributed search == single-threaded oracle (scores and ranking)") {
    val domain = SearchEngine.buildDomain(spark, docs, models, dim)
    val q = "vector similarity ranking"
    val got = SearchEngine.search(domain,
      SearchEngine.queryEmbeddings(spark, domain, q, dim), 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = oracleSearch(q, 3)
    assert(got.map(_._1).toSeq == want.map(_._1), s"ranking: got=${got.toSeq} want=$want")
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(approx(g, w, 1e-9)) }
  }

  test("domain build: 2 datapoints per doc, embeddings = datapoints x models") {
    val domain = SearchEngine.buildDomain(spark, docs, models, dim)
    assert(domain.entities.count() == 5)
    assert(domain.datapoints.count() == 10)
    assert(domain.embeddings.count() == 20)
    // distinct-text dedup before embed must not lose any (dp, model) pair
    assert(domain.embeddings.select("datapoint_id", "model").distinct().count() == 20)
  }

  test("topKJoin matches brute-force per-query ranking") {
    val e = (0L to 19L).map { i =>
      (i, (0 until 8).map(j => math.sin(i * 31 + j * 7).toFloat))
    }.toDF("vec_id", "embedding")
    val got = SearchEngine.topKJoin(e.filter(col("vec_id") < 3), e, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val vecs = (0L to 19L).map { i =>
      i -> (0 until 8).map(j => math.sin(i * 31 + j * 7).toFloat).toArray
    }.toMap
    val want = (0L until 3L).flatMap { qid =>
      vecs.toSeq.map { case (vid, v) =>
        val s = BigDecimal(cos01(v, vecs(qid))).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (vid, s)
      }.sortBy { case (vid, s) => (-s, vid) }.take(4).zipWithIndex
        .map { case ((vid, _), rank) => (qid, vid, rank + 1L) }
    }.toSet
    assert(got == want)
  }

  test("mmrSelect: mu=0 reduces to pure top-k; heavy mu excludes the exact clone") {
    // pool: vec 2 is an exact-direction clone of vec 1 (cosine 1, so
    // cos01 redundancy 1.0 once vec 1 is selected); vecs 3/4 are
    // orthogonal axes (cos01 0.5 to everything else — the cos01 floor).
    val base = Array(1f, 0f, 0f, 0f)
    val dup = Array(0.5f, 0f, 0f, 0f) // same direction, cos01(base,dup)=1
    val ortho = Array(0f, 1f, 0f, 0f)
    val far = Array(0f, 0f, 1f, 0f)
    val q = Array(1f, 0.2f, 0.3f, 0f)
    def sim6(v: Array[Float]) =
      BigDecimal(cos01(v, q)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pool = Seq(
      (1L, sim6(base), base.toSeq),
      (2L, sim6(dup), dup.toSeq),
      (3L, sim6(ortho), ortho.toSeq),
      (4L, sim6(far), far.toSeq)).toDF("vec_id", "sim", "embedding")
    // mu=0: ignores redundancy entirely — selection IS the relevance
    // ranking (base/dup tie at the top, vec_id breaks it; far beats ortho)
    val pure = SearchEngine.mmrSelect(pool, k = 3, lam = 0.7, mu = 0.0)
      .orderBy("rnk").collect().map(_.getLong(1)).toSeq
    assert(pure == Seq(1L, 2L, 4L), s"mu=0 must equal pure top-k: $pure")
    // heavy mu: the exact clone's redundancy 1.0 overwhelms its relevance
    // — selection picks the two orthogonal axes instead
    val div = SearchEngine.mmrSelect(pool, k = 3, lam = 0.5, mu = 2.0)
      .orderBy("rnk").collect()
    val divIds = div.map(_.getLong(1)).toSeq
    assert(divIds == Seq(1L, 4L, 3L), s"heavy-mu selection wrong: $divIds")
    assert(div(0).getDouble(3) == 0.0, "first pick must carry redundancy 0")
    assert(div.drop(1).forall(_.getDouble(3) == 0.5),
      "orthogonal picks must carry the cos01 floor 0.5 redundancy")
  }
}
