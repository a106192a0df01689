package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture planning for training-data assembly: turning per-source
  * availability and target weights into concrete token allocations.
  */
object Mixture {

  /** Water-filling budget allocation: spend `budget` tokens across
    * sources proportionally to `weight`, but never more than a source's
    * `avail` — the surplus of capped (small) sources flows to the
    * uncapped ones at a common fill rate r*:
    * alloc_s = min(avail_s, r* · weight_s), with r* chosen so the allocs
    * sum to the budget (or everything saturates when the budget exceeds
    * total availability). This is how a temperature-weighted data recipe
    * (weights e.g. avail^alpha, q126) is reconciled with finite sources
    * without oversampling the small ones.
    *
    * CLOSED FORM, no iteration: sources sorted by avail/weight (the fill
    * rate at which each saturates); for a candidate cut "first k
    * saturated", r_k = (budget − Σ_{i≤k} avail_i) / (Σ_{i>k} weight_i);
    * the unique valid segment is the one where r_k lands between the
    * k-th and (k+1)-th saturation rates. One sort + one cumulative
    * window + one filter over the per-SOURCE rollup (cardinality =
    * sources, the q88 histogram size class — the corpus itself never
    * enters this operator).
    *
    * Cross-engine determinism: totals are taken as the LAST cumulative
    * window value (max of an ordered running sum — sequential, so
    * bit-identical in any engine), never a parallel aggregate whose
    * summation order is partition-dependent. `budget` is a Column and
    * may reference `tot_avail`/`tot_w` (e.g. `col("tot_avail") * 0.5`).
    *
    * Input: (source, avail: double, weight: double), weight > 0 —
    * ENFORCED: a null or non-positive weight raises at evaluation time
    * (with ANSI off it would otherwise null the ratio and silently
    * corrupt the window ordering and r* computation).
    * Output: (source, avail, weight, alloc).
    */
  def waterFill(perSource: DataFrame, budget: Column): DataFrame = {
    val checked = perSource.withColumn("weight",
      when(col("weight") > 0, col("weight")).otherwise(raise_error(concat(
        lit("waterFill: weight must be > 0 (source="),
        col("source").cast("string"), lit(")")))))
    val w = Window.orderBy(col("ratio"), col("source"))
    val st = checked
      .withColumn("ratio", col("avail") / col("weight"))
      .withColumn("cum_avail", sum(col("avail")).over(w))
      .withColumn("cum_w", sum(col("weight")).over(w))
      .withColumn("next_ratio", lead(col("ratio"), 1).over(w))
    val tot = st.agg(
      max(col("cum_avail")).as("tot_avail"),
      max(col("cum_w")).as("tot_w"),
      min(col("ratio")).as("min_ratio"))
    val stT = st.crossJoin(broadcast(tot)).withColumn("b", budget)
    val candK = stT
      .withColumn("r", (col("b") - col("cum_avail")) / (col("tot_w") - col("cum_w")))
      .filter(col("cum_w") < col("tot_w") &&
        col("r") >= col("ratio") &&
        (col("next_ratio").isNull || col("r") <= col("next_ratio")))
      .select(col("r"))
    val cand0 = tot.withColumn("b", budget)
      .select((col("b") / col("tot_w")).as("r"), col("min_ratio"))
      .filter(col("r") <= col("min_ratio"))
      .select(col("r"))
    val rstar = candK.unionByName(cand0).agg(min(col("r")).as("rstar"))
    checked.crossJoin(broadcast(rstar))
      .withColumn("alloc",
        least(col("avail"),
          coalesce(col("rstar"), lit(Double.MaxValue)) * col("weight")))
      .select(col("source"), col("avail"), col("weight"), col("alloc"))
  }

  def waterFill(perSource: DataFrame, budget: Double): DataFrame =
    waterFill(perSource, lit(budget))
}
