package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ProbMethods => PM}

/** One-off experiment backing the forMethodCol design note: data-driven
  * dispatch as ONE pass computing all eight aggregate shapes vs THREE
  * passes (filter per method + its single aggregate + union).
  * Run: SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.BenchDispatch'
  */
object BenchDispatch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("method",
        when(col("l_returnflag") === "A", "Mean")
          .when(col("l_returnflag") === "N", "HarmonicMean")
          .otherwise("QuadraticMean"))

    def onePass(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag", "l_linestatus", "method")
        .agg(PM.forMethodCol(col("method"), col("l_discount")).as("score"))
        .drop("method")

    def threePass(df: DataFrame): DataFrame = {
      def leg(m: String, agg: org.apache.spark.sql.Column) =
        df.filter(col("method") === m)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(agg.as("score"))
      leg("Mean", PM.mean(col("l_discount")))
        .unionByName(leg("HarmonicMean", PM.harmonicMean(col("l_discount"))))
        .unionByName(leg("QuadraticMean", PM.quadraticMean(col("l_discount"))))
    }

    def time(name: String, df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("one-pass-all-shapes", onePass(li))
    time("three-pass-union   ", threePass(li))
    spark.stop()
  }
}
