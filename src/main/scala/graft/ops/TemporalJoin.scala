package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins over event streams — the two shapes a naive SQL join
  * gets catastrophically wrong at scale.
  *
  * [[asOf]] — most-recent-match join. The naive form equi-joins on the
  * key, filters rightTime <= leftTime, and argmaxes: that materializes
  * every (left row × earlier right row) pair before discarding all but
  * one — quadratic per key in the time span. This form instead UNIONS the
  * two sides and takes a running last-non-null over one (key, time) sort:
  * ONE shuffle, each row touched exactly once, and the carried state is a
  * single value per frame — the merge-sort plan a purpose-built temporal
  * engine runs.
  *
  * [[rangeJoin]] — bounded-window join. A pure time-range predicate gives
  * Spark no equi-key, so the planner falls back to
  * BroadcastNestedLoopJoin (all pairs). Bucketing both sides into
  * window-width time bins restores an equi-join key (key, bin): each left
  * row probes exactly two bins, so candidate volume is O(true matches
  * within ±window), not O(|L|·|R|). Bins are computed with integer `div`
  * on the epoch-ns longs — a double division would lose the low ~8 bits
  * of a 2^61-scale epoch and misplace boundary rows by up to 256 ns.
  */
object TemporalJoin {

  /** For each left row: all of `left`'s columns plus `right`'s `payload`
    * columns taken from the single most recent right row with equal `key`
    * and right `time` <= left `time` (nulls when no such row). An
    * equal-time right row DOES match (right sorts before left at the same
    * instant). Contract: right must be unique per (key, time) — aggregate
    * ties away first, or the carried payload is pick-any among them.
    *
    * The payload travels as ONE non-null struct per right row through a
    * single `last(ignoreNulls)` and is unpacked after the window (ADVICE
    * r7: carrying each column independently skipped right rows whose
    * payload value is legitimately NULL, and with several payload columns
    * could stitch fields from DIFFERENT right rows into one that never
    * existed). The struct is never null for a right row — even one whose
    * fields are all null — so the carried state is always the most recent
    * right ROW as a unit; field access on the null no-match struct yields
    * the contracted nulls.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, time: String,
           payload: Seq[String]): DataFrame = {
    val lExtra = left.columns.toSeq.filterNot(c => c == key || c == time)
    val payStruct = struct(payload.map(col): _*)
    val lSide = left.select(
      Seq(col(key), col(time), lit(1).as("__side")) ++
        lExtra.map(col) :+
        lit(null).cast(right.select(payStruct).schema.head.dataType).as("__pay"): _*)
    val rSide = right.select(
      Seq(col(key), col(time), lit(0).as("__side")) ++
        lExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payStruct.as("__pay"): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .select(Seq(col(key), col(time), col("__side")) ++ lExtra.map(col) :+
        last(col("__pay"), ignoreNulls = true).over(w).as("__pay"): _*)
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        payload.map(c => col("__pay").getField(c).as(c)): _*)
  }

  /** Matched (left, right) pairs where right `time` lies in
    * [left time − window, left time). Output: all left columns plus the
    * right time and `payload` columns prefixed `r_`. Inner semantics —
    * a left row with no match emits nothing (re-attach unmatched rows
    * after aggregating, as q87 does); a binned LEFT join would emit one
    * null row per probed bin. Times must be non-negative integers (epoch
    * ns); `window` > 0 in the same unit.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String, time: String,
                window: Long, payload: Seq[String]): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val lb = left.withColumn("__bin", explode(array_distinct(array(
      expr(s"(`$time` - ${window}L) div ${window}L"),
      expr(s"`$time` div ${window}L")))))
    val rb = right.select(
      Seq(col(key).as(s"__r_$key"), col(time).as(s"r_$time")) ++
        payload.map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__rbin", expr(s"`r_$time` div ${window}L"))
    lb.join(rb,
        lb(key) === rb(s"__r_$key") && lb("__bin") === rb("__rbin") &&
          rb(s"r_$time") >= lb(time) - window && rb(s"r_$time") < lb(time))
      .drop("__bin", "__rbin", s"__r_$key")
  }
}
