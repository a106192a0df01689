package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Two-level deterministic epoch shuffle — the training-order shuffle
    * block-streaming data loaders use: ids land in fixed blocks of
    * `blockSize` (stable under append, like [[assign]]); each epoch
    * seeds a hash that orders the BLOCKS and a hash that orders ids
    * WITHIN their block; the global position is closed-form — the
    * within-block rank plus the cumulative size of hash-earlier blocks —
    * so NO global sort runs. Exactly one position per (epoch, id) and
    * positions form [0, n) for every epoch (a bijection; ShardsSpec
    * property-pins it). Scale shape: the per-(epoch, block) rank window
    * is bounded by blockSize; the block table (n/blockSize rows) is the
    * only globally-ordered frame and is broadcast. md5-based hash32 so
    * any engine reproduces the identical order.
    * Input: any frame with a numeric/string id column.
    * Output: (idCol, epoch, block, pos).
    */
  def epochShuffle(df: DataFrame, idCol: String, blockSize: Long,
      epochs: Seq[Long]): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive (got $blockSize)")
    require(epochs.nonEmpty, "epochs must be non-empty")
    val ed = df.select(col(idCol))
      .withColumn("epoch", explode(array(epochs.map(lit(_)): _*)))
      .withColumn("block", expr(s"$idCol div ${blockSize}L"))
      .withColumn("dkey", pmod(TextFunctions.hash32(concat(lit("doc|"),
        col("epoch").cast("string"), lit("|"), col(idCol).cast("string"))),
        lit(1048576L)))
    val wIn = Window.partitionBy("epoch", "block").orderBy("dkey", idCol)
    val ranked = ed.withColumn("rnk", row_number().over(wIn).cast("long"))
    val wBlk = Window.partitionBy("epoch").orderBy("bkey", "block")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ed.groupBy("epoch", "block").agg(count(lit(1)).as("bsz"))
      .withColumn("bkey", pmod(TextFunctions.hash32(concat(lit("blk|"),
        col("epoch").cast("string"), lit("|"), col("block").cast("string"))),
        lit(1048576L)))
      .withColumn("off", coalesce(sum(col("bsz")).over(wBlk), lit(0L)))
      .select("epoch", "block", "off")
    // offs is (epoch × block)-grained and blocks grow linearly with the
    // corpus — no forced hint; the size-estimate threshold governs
    ranked.join(offs, Seq("epoch", "block"))
      .withColumn("pos", col("off") + col("rnk") - 1)
      .select(col(idCol), col("epoch"), col("block"), col("pos"))
  }
}
