package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic output sharding for a prepared training corpus — the
  * write-side step after curation/packing: every doc maps to a shard by
  * content-independent id hash, so the layout is reproducible across
  * runs and engines, stable under corpus append (existing docs never
  * move), and requires NO global sort or range repartition — assignment
  * is a narrow projection, and the write is one shuffle-free
  * partitionBy. Hash-uniformity gives balanced shards w.h.p.; the
  * [[shardStats]] rollup is the audit that proves it for a given corpus
  * (the same evidence-over-assumption contract as q89's source health).
  */
object Shards {

  /** Add a `shard` column: hash32("s|" ++ id) mod n. md5-based hash32 so
    * an external system (or the SQL oracle) reproduces the exact layout.
    */
  def assign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive (got $nShards)")
    df.withColumn("shard",
      pmod(TextFunctions.hash32(concat(lit("s|"), col(idCol).cast("string"))),
        lit(nShards.toLong)))
  }

  /** Per-shard audit rollup: doc count, token mass, distinct sources. */
  def shardStats(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, nShards: Int): DataFrame =
    assign(df, idCol, nShards)
      .withColumn("n_tok", size(TextFunctions.tokens(col(textCol))).cast("long"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        countDistinct(col(srcCol)).as("n_sources"))

  /** Materialize the sharded layout: one parquet directory per shard
    * (`shard=K/`), the unit a downstream trainer's data loader consumes.
    */
  def writeShards(df: DataFrame, idCol: String, path: String,
      nShards: Int): Unit =
    assign(df, idCol, nShards)
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Read one shard back (partition pruning: only that directory scans). */
  def readShard(spark: SparkSession, path: String, shard: Long): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard)
}
