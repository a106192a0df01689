package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical check of the ScaleAudit broadcast triage: run a registered
  * query with AQE ON (the production shape — ScaleAudit disables it only
  * to read static-plan metrics) against an arbitrary data dir and print
  * the join strategies of the FINAL adaptive plan. Used to confirm that
  * the un-hinted joins the static planner broadcasts at test SFs really
  * do flip to shuffle joins once the measured build side outgrows the
  * broadcast budget.
  *
  *   sbt 'runMain graft.tools.AqeProbe q339_prefix_filter_join target/scale10'
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q339_prefix_filter_join")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // optional third arg: autoBroadcastJoinThreshold (e.g. "1m") — a
    // fleet deployment sizes this to its executor memory budget; probing
    // with a tightened value simulates the estimate/threshold crossover
    // a larger corpus produces
    val threshold = if (args.length > 2) args(2) else "10m"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", threshold)
      .config("spark.ui.enabled", "false")
      // AQE stays ON (Spark 4 default) — that is the point of the probe
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.Queries.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan
    plan.execute().count()
    val lines = plan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("isFinalPlan"))
      .map(_.trim.take(120))
    println(s"===== $name @ $dir (AQE final plan, join lines)")
    lines.foreach(l => println(s"[aqe] $l"))
    graft.ops.Caches.release()
    spark.stop()
  }
}
