package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling entry: run one registered query N times in one JVM
  * to separate planning/codegen overhead from steady-state execution.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q74_repetition")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.Queries.queries.get(name)
      .orElse(graft.Queries.benchOnly.toMap.get(name))
      .getOrElse(sys.error(s"unknown query $name"))
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.catalog.clearCache()
      graft.ops.Caches.release()
    }
    spark.stop()
  }
}
