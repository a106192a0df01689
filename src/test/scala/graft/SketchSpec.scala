package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** The approximate-distinct scale path next to q72's exact vocabulary
  * count: HyperLogLog++ (`approx_count_distinct`) replaces the full
  * (lang, token) distinct-set exchange with fixed-size sketch merges —
  * at 100 TB the shuffle volume becomes O(groups × sketch) instead of
  * O(distinct tokens). The sketch is engine-specific, so it cannot be
  * DuckDB-oracled; this spec gates its error against the exact count.
  */
class SketchSpec extends SparkSpec {

  test("HLL vocab estimate within the configured error of the exact count") {
    val toks = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
    val rows = toks.groupBy("lang")
      .agg(
        countDistinct(col("tok")).as("exact"),
        approx_count_distinct(col("tok"), rsd = 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      // rsd 0.02 is one standard deviation; 5% is a ~2.5-sigma gate
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"lang ${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("sketch aggregation plan carries partial HLL merge (no distinct-set shuffle)") {
    val toks = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
    val approx = toks.groupBy("lang")
      .agg(approx_count_distinct(col("tok")).as("approx"))
    approx.collect()
    val plan = approx.queryExecution.executedPlan.toString
    // partial_approx_count_distinct before the exchange = map-side sketch
    // merge; the exact form would instead shuffle (lang, tok) pairs
    assert(plan.contains("partial_approx_count_distinct"), plan)
  }
}
