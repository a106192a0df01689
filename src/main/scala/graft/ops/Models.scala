package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence for the engine's trained artifacts — classifier
  * coefficients ([[Classifier.train]]), BPE merge tables
  * ([[Bpe.learnMerges]]/[[Bpe.learnMergesBatched]]), and PQ codebooks
  * ([[graft.search.Ann.pqTrain]]). Training is periodic; serving reads
  * the artifacts every run — so each is stored as a small parquet table
  * (partition-count 1: every artifact is driver-tiny by construction —
  * a coefficient vector, ≤ some-thousand merges, m × ksub codewords)
  * that broadcasts on load exactly like its in-memory form. Round-trip
  * equality is ModelsSpec-pinned for all three.
  */
object Models {

  /** Classifier coefficients → parquet (f, w). Dense: every index of the
    * vector is written, so load reconstructs the exact array. */
  def saveWeights(spark: SparkSession, w: Array[Double], path: String): Unit = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("f", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession, path: String): Array[Double] = {
    val rows = spark.read.parquet(path).orderBy("f")
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    require(rows.nonEmpty && rows.map(_._1).toSeq == (0 until rows.length),
      s"weights at $path are not a dense 0..n-1 vector")
    rows.map(_._2)
  }

  /** BPE merge table → parquet (rank, pa, pb, n), rank-ordered — the
    * exact shape [[Bpe.encodePartitions]] broadcasts. */
  def saveMerges(spark: SparkSession, merges: Seq[(Int, String, String, Long)],
      path: String): Unit = {
    import spark.implicits._
    merges.toDF("rank", "pa", "pb", "n")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: SparkSession, path: String): Seq[(Int, String, String, Long)] =
    spark.read.parquet(path).orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  /** PQ codebook (sub, code, cvec) → parquet. Already a DataFrame; the
    * writer just pins layout + overwrite semantics. */
  def saveCodebook(codebook: DataFrame, path: String): Unit =
    codebook.select(col("sub").cast("int"), col("code").cast("int"), col("cvec"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  def loadCodebook(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup cluster assignment (doc_id, cluster, is_keeper) — the
    * materialize-once output of ONE LSH+CC dedup pass
    * ([[Graph.connectedComponents]] over the minhash pair graph). Unlike
    * the other artifacts this one is CORPUS-sized, so it is written
    * partitioned (no coalesce) and consumed as a table: at 100 TB the
    * dedup chain runs once and every downstream consumer (best-member
    * re-rank, audit rollups, effective source sizing, curation stage 1)
    * reads the persisted frame instead of recomputing the chain.
    * Reference analogue: the persisted-store pattern of
    * `CacheHelper.cs:44-137` (compute once, sync to a store, reload).
    * Round-trip equality is ModelsSpec-pinned (long columns only — the
    * parquet round trip is exact).
    */
  def saveClusters(clusters: DataFrame, path: String): Unit =
    clusters.select(col("doc_id").cast("long"), col("cluster").cast("long"),
      col("is_keeper").cast("long")).write.mode("overwrite").parquet(path)

  def loadClusters(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("doc_id", "cluster", "is_keeper")

  /** Positional postings index (term, doc_id, pos) — the materialize-once
    * text-serving asset (the cluster artifact's counterpart for term and
    * phrase search): built from one tokenize pass, consumed by every
    * lookup after. Corpus-sized, written PARTITIONED BY a 64-way
    * term-hash `bucket` directory column, so a lookup that filters on
    * its terms' buckets (`bucket IN (...)` before the term join) prunes
    * to those directories; a consumer that joins on term without the
    * bucket filter still reads a correct (full-scan) index.
    */
  def savePostings(postings: DataFrame, path: String): Unit =
    postings.select(col("term").cast("string"), col("doc_id").cast("long"),
      col("pos").cast("long"))
      .withColumn("bucket", pmod(hash(col("term")), lit(64)).cast("int"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  def loadPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("term", "doc_id", "pos")
}
