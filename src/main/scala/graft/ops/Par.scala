package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism guard for compute-heavy narrow stages (per-row md5/shingle
  * work). A small parquet file arrives as ONE input split, so without this
  * the whole tokenize+hash stage runs on a single core while 31 idle. At
  * real scale the source already has thousands of splits and this is a
  * no-op — unconditionally repartitioning would shuffle the full corpus
  * for nothing.
  */
object Par {
  def ensure(df: DataFrame, key: String): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, col(key))
  }
}
