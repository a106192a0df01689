package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact rolling active-entity counts without a day×entity explode or an
  * approx-distinct sketch (the q228 operator, factored out so
  * PropertySpec can pin it against the brute-force definition).
  *
  * Definition: rolling_W(d) = |{u : some activity day d' of u satisfies
  * d − W < d' ≤ d}|. Dataflow: distinct (user, day) rows merge into
  * per-user COVERAGE intervals (a user-day covers days d..d+W−1; gaps
  * > W−1 start a new interval — the Sessions gap chain), each merged
  * interval contributes a +1/−1 diff marker, and one prefix sum over
  * the |days|-sized marker frame reads the count at every requested
  * day. Per-user windows are bounded by that user's activity; the only
  * unpartitioned window is over the day histogram.
  */
object Rolling {

  /** `ud` must carry distinct (user_id, day) rows. Returns (day, alias)
    * at every day present in `ud` (the zero-seeded markers make the
    * prefix sum defined exactly there).
    */
  def activeCounts(ud: DataFrame, w: Int, alias: String): DataFrame = {
    require(w >= 1, s"window must be >= 1 day (got $w)")
    val lw = Window.partitionBy("user_id").orderBy("day")
    val iv = ud
      .withColumn("prev", lag(col("day"), 1).over(lw))
      .withColumn("newiv",
        when(col("prev").isNull || col("day") - col("prev") > w - 1, 1L)
          .otherwise(0L))
      .withColumn("ivid", sum(col("newiv")).over(
        lw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "ivid").agg(
        min(col("day")).as("s"),
        (max(col("day")) + (w - 1)).as("e"))
    val diffs = iv.select(col("s").as("day"), lit(1L).as("df"))
      .unionByName(iv.select((col("e") + 1).as("day"), lit(-1L).as("df")))
      .unionByName(ud.select(col("day")).distinct().withColumn("df", lit(0L)))
      .groupBy("day").agg(sum(col("df")).as("df"))
    diffs.withColumn(alias, sum(col("df")).over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("day"), col(alias))
      .join(ud.select("day").distinct(), Seq("day"), "left_semi")
  }
}
