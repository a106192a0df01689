// Planted-defect + positive-control fixture for tools/hint_lint.py
// --selftest (VERDICT r13 #1: the gate had never been observed to fail,
// so OTHER = 0 could rot into a vacuous truth).
//
// NOT compiled (lives outside src/) and NOT part of the census (the
// census walks src/main/scala only). Every broadcast / un-broadcast
// crossJoin site line carries an `// expect: <BUCKET>` marker; the
// selftest classifies this file exactly as it would main source and
// asserts EVERY marker — including the planted OTHERs — matches, and
// that no unmarked site exists.
package graft.fixtures

import org.apache.spark.sql.functions._

object SelftestHints {
  def t(s: SparkSession, d: String, n: String): DataFrame =
    s.read.parquet(s"$d/$n.parquet")

  // bcast-ok-param: queries — caller probe batch (API contract), request-sized
  // bcast-sqrt-param: centroids — √n-grained coarse quantizer (sqrtCentroids sizing, sub-linear)
  def probe(corpus: DataFrame, queries: DataFrame, centroids: DataFrame): DataFrame =
    corpus.join(broadcast(queries), "query_id") // expect: ANNOTATED
      .join(broadcast(centroids), "centroid_id") // expect: SQRT_BOUNDED

  def controls(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val big = spark.read.parquet(s"$dir/lineitem.parquet")
    val small = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")

    // ---- positive controls: each MUST land in its structural bucket ----
    val tot = docs.agg(sum(col("v")).as("t"))
    val p01 = docs.crossJoin(broadcast(tot)) // expect: ONE_ROW_AGG
    val p02 = docs.join(broadcast(tot.select(col("t"))), "t") // expect: ONE_ROW_AGG
    val twoStage = docs.groupBy("token").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("tc"))
    val p03 = docs.crossJoin(broadcast(twoStage)) // expect: ONE_ROW_AGG
    val p04 = docs.join(broadcast(docs.orderBy(desc("v")).limit(10)), "k") // expect: LIMIT_K
    val p05 = docs.join(broadcast(big.join(docs, "k").limit(3)), "k") // expect: LIMIT_K
    val nat = t(spark, dir, "nation")
    val reg = t(spark, dir, "region")
    val p06 = docs.join(broadcast(nat), "n_nationkey") // expect: FIXED_CATALOG
    val lut = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val p07 = docs.join(broadcast(lut), "k") // expect: FIXED_CATALOG
    val p08 = docs.join(broadcast(spark.range(16).select(col("id"))), "id") // expect: FIXED_CATALOG
    val byLang = docs.groupBy("lang").agg(count(lit(1)).as("c"))
    val p09 = docs.join(broadcast(byLang), "lang") // expect: GROUPED_KEY
    val p10 = docs.join(broadcast(docs.select(col("source")).distinct()), "source") // expect: GROUPED_KEY
    val p11 = docs.join(broadcast(docs.filter(col("doc_id") === 7)), "doc_id") // expect: LITERAL_KEY
    val prod = nat.join(reg, "r_regionkey")
    val p12 = docs.join(broadcast(prod), "n_nationkey") // expect: PRODUCT
    def ring(): DataFrame = {
      val rows = for (i <- 0 until 8; v <- 0 until 16)
        yield (i.toLong, v.toLong)
      rows.toDF("node", "v")
    }
    val p13 = docs.join(broadcast(ring()), "node") // expect: FIXED_CATALOG
    // bcast-sqrt: √n-grained quantizer (sqrtCentroids contract, sub-linear)
    val p14 = docs.join(broadcast(centsUnresolvable), "centroid_id") // expect: SQRT_BOUNDED

    // annotation binding: the comment certifies the NEXT site only — the
    // adjacent second site must NOT inherit it (ADVICE r13 poaching fix)
    // bcast-ok: fixture control — a stated reason for exactly one site
    val p15 = docs.join(broadcast(unboundedA), "k") // expect: ANNOTATED
    val p16 = docs.join(broadcast(unboundedB), "k") // expect: OTHER

    val p17 = docs.join(broadcast(nat.unionByName(reg)), "n_nationkey") // expect: PRODUCT
    val byPmod = docs.groupBy(pmod(col("doc_id"), lit(16)).as("hb"))
      .agg(count(lit(1)).as("c"))
    val p18 = docs.join(broadcast(byPmod), "hb") // expect: GROUPED_KEY
    val p19 = docs.join(broadcast(docs.filter(col("doc_id").isin(1, 2, 3))), "doc_id") // expect: LITERAL_KEY
    val p20 = docs.crossJoin(broadcast(docs.join(big, "k").agg(sum(col("v")).as("t")))) // expect: ONE_ROW_AGG
    // bcast-sqrt: √n quantizer (sqrtCentroids contract) — sub-linear
    val cents2 = unresolvableQuantizer(docs)
    val p21 = docs.join(broadcast(cents2), "centroid_id") // expect: SQRT_BOUNDED

    // ---- planted defects: each MUST bucket OTHER (gate must bite) ----
    // a stale annotation separated from its def by a code line must NOT
    // certify (definition binding uses the same contiguous-block rule)
    // bcast-ok: stale comment that no longer sits on its definition
    val filler = docs.count()
    val orphan = bigUnresolvable
    val d06 = docs.join(broadcast(orphan), "k") // expect: OTHER
    val lateGrow = docs.orderBy(desc("v")).limit(10).join(big, "k")
    val d07 = docs.join(broadcast(lateGrow), "k") // expect: OTHER
    val d01 = docs.join(broadcast(customer), "c_custkey") // expect: OTHER
    val tokenRollup = docs.groupBy("token").agg(count(lit(1)).as("c"))
    val d02 = docs.join(broadcast(tokenRollup), "token") // expect: OTHER
    val d03 = docs.join(broadcast(big.join(small.limit(5))), "k") // expect: OTHER
    val vj = big.join(small.limit(5))
    val d04 = docs.join(broadcast(vj), "k") // expect: OTHER
    val lateUnbounded = docs.groupBy("lang").agg(count(lit(1)).as("c"))
      .groupBy("token").agg(sum("c").as("s"))
    val d05 = docs.join(broadcast(lateUnbounded), "token") // expect: OTHER
    // a generator AFTER the bounding op re-grows the frame: a bounded-key
    // rollup packing corpus text into arrays then exploding them back out
    val d08 = docs.crossJoin(broadcast(docs.groupBy("lang") // expect: OTHER
      .agg(collect_list(col("text")).as("ts"))
      .select(explode(col("ts")).as("t"))))
    val packed = docs.groupBy("lang").agg(collect_list(col("text")).as("ts"))
    val d09 = docs.crossJoin(broadcast(packed.select(explode(col("ts")).as("t")))) // expect: OTHER
    // a comprehension whose bound is an identifier may be corpus-derived —
    // only LITERAL-range comprehensions certify as local collections
    val nBig = 123456789
    def corpusRing(): DataFrame = {
      val rows = for (i <- 0 until nBig) yield i.toLong
      rows.toDF("i")
    }
    val d10 = docs.join(broadcast(corpusRing()), "i") // expect: OTHER
    // a corpus-derived .limit argument is data-sized — LIMIT_K certifies
    // only INTEGER-CONSTANT limits (literal, literal arithmetic, or an
    // in-file val tracing to one); anything else needs an annotation
    // (ADVICE r14 — .limit(df.count().toInt/2) used to bucket LIMIT_K)
    val half = docs.count().toInt / 2
    val d11 = docs.join(broadcast(docs.orderBy(desc("v")).limit(half)), "k") // expect: OTHER
    val d12 = docs.join(broadcast(big.limit(small.count().toInt)), "k") // expect: OTHER

    // lint-exempt: fixture control — the deliberate-defect marker buckets
    // EXEMPT (visible, reasoned) instead of OTHER
    val p22 = docs.join(broadcast(bigUnresolvable2), "k") // expect: EXEMPT
    // generators BEFORE the bounding op are fine (the agg re-bounds)...
    val p23 = docs.crossJoin(broadcast(docs.select(explode(col("toks")).as("t")) // expect: ONE_ROW_AGG
      .agg(count(lit(1)).as("n"))))
    // ...and exploding a LITERAL sequence keeps a literal arity
    val p24 = docs.join(broadcast(docs // expect: FIXED_CATALOG
      .select(explode(sequence(lit(0L), lit(12L))).as("by")).distinct()), "by")
    // constant-limit positive controls: literal arithmetic through the
    // whitelisted numeric wrappers, and a val tracing to an int constant
    val p25 = docs.join(broadcast(docs.limit(math.max(4 * 8, 16))), "k") // expect: LIMIT_K
    val fixedK = 50
    val p26 = docs.join(broadcast(docs.orderBy(desc("v")).limit(fixedK)), "k") // expect: LIMIT_K

    // ---- un-broadcast crossJoin build sides (the nested-loop census) ----
    val c01 = docs.crossJoin(tot) // expect: ONE_ROW_AGG
    val c02 = tot.crossJoin(big) // expect: ONE_ROW_AGG
    val c03 = docs.crossJoin(big) // expect: OTHER
    docs
  }
}
