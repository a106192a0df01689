package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** In-Spark TRAINING for the hashed-linear quality classifier — q84
  * scores documents with a fixed model; this is its training counterpart
  * (the same completion BPE got in round 8: `learnMerges` next to
  * `encode`). Model: logistic regression over length-normalized hashed
  * bag-of-words — the fastText-style linear quality filter LLM curation
  * pipelines train on (reference-quality vs corpus-random samples).
  *
  * Layout at 100 TB: the FEATURES stay distributed — exploded
  * (doc_id, f, x) rows, co-partitioned by doc_id — while the COEFFICIENT
  * vector lives on the driver and is broadcast each step (the
  * parameter-server layout every distributed full-batch GD uses;
  * nFeatures + 1 doubles — 2 MB even at 2^18 hashed features, broadcastable
  * at any corpus size). Each step is exactly two bounded shuffles: the
  * per-document margin (keyed by doc_id, co-located with the feature
  * partitioning) and the per-feature gradient (at most nFeatures + 1
  * groups, map-side partial aggregation). Nothing corpus-sized ever
  * reaches the driver — only the nFeatures-row gradient.
  *
  * Gradients and weights are rounded to `roundAt` decimals every step
  * (Spark `round` / driver HALF_UP — the same rule DuckDB's `round`
  * applies), so the trained weights are bit-reproducible across engines
  * and the q107 oracle can replay training unrolled in SQL.
  */
object Classifier {

  /** Hashed bag-of-words features, exploded: (doc_id, f int, x double)
    * with x = count(tok hashing to f) / len(toks), plus one intercept row
    * per document (f = nFeatures, x = 1.0). Hashing matches q84:
    * hash32("w|" + tok) mod nFeatures.
    */
  def featurize(docs: DataFrame, nFeatures: Int): DataFrame = {
    val toksed = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        greatest(size(col("toks")), lit(1)).cast("double").as("n"))
    val tf = toksed
      .select(col("doc_id"), col("n"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), col("n"),
        pmod(TF.hash32(concat(lit("w|"), col("tok"))), lit(nFeatures.toLong))
          .cast("int").as("f"))
      .groupBy("doc_id", "n", "f")
      .agg(count(lit(1)).cast("double").as("cnt"))
      .select(col("doc_id"), col("f"), (col("cnt") / col("n")).as("x"))
    tf.unionByName(
      toksed.select(col("doc_id"), lit(nFeatures).as("f"), lit(1.0).as("x")))
  }

  // bcast-ok: nFeatures+1 coefficient rows — model-sized, corpus-independent
  private def weightsDf(spark: org.apache.spark.sql.SparkSession,
      w: Array[Double]): DataFrame = {
    import spark.implicits._
    w.toSeq.zipWithIndex.map { case (v, i) => (i, v) }.toDF("f", "w")
  }

  /** Full-batch gradient descent, `iters` steps from w = 0. `labels` is
    * (doc_id, y double in {0, 1}); `scale` is the logit gain (q84 uses 8).
    * Returns the dense coefficient vector, intercept at index nFeatures.
    * Persist `feats` before calling — every step reads it twice.
    */
  def train(feats: DataFrame, labels: DataFrame, nFeatures: Int, iters: Int,
      lr: Double, l2: Double = 0.0, scale: Double = 1.0,
      roundAt: Int = 9): Array[Double] = {
    require(iters >= 0 && lr > 0, s"bad iters=$iters lr=$lr")
    val spark = feats.sparkSession
    var w = Array.fill(nFeatures + 1)(0.0)
    (1 to iters).foreach { _ =>
      // All-zero weights (every first step) fold closed: z = Σ 0·x = 0.0
      // exactly, so σ(−scale·0) = 1/(1+exp(0)) = 0.5 exactly and the
      // whole margin pass (feature⋈weights join + doc rollup) drops from
      // the step's plan (guide §1.2) — the identical fold the unrolled
      // SQL oracles apply to their it=1 CTE.
      val resid =
        if (w.forall(_ == 0.0))
          labels.select(col("doc_id"), (lit(0.5) - col("y")).as("r"))
        else feats
          .join(broadcast(weightsDf(spark, w)), "f")
          .groupBy("doc_id").agg(sum(col("w") * col("x")).as("z"))
          .join(labels, "doc_id")
          .select(col("doc_id"),
            (lit(1.0) / (lit(1.0) + exp(lit(-scale) * col("z"))) - col("y")).as("r"))
      val grads = feats.join(resid, "doc_id")
        .groupBy("f").agg(round(sum(col("r") * col("x")), roundAt).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      w = w.zipWithIndex.map { case (wi, i) =>
        val g = grads.getOrElse(i, 0.0) + l2 * wi
        BigDecimal(wi - lr * g)
          .setScale(roundAt, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    w
  }

  /** Per-document score under a coefficient vector: (doc_id, score). */
  def predict(feats: DataFrame, w: Array[Double],
      scale: Double = 1.0): DataFrame =
    feats.join(broadcast(weightsDf(feats.sparkSession, w)), "f")
      .groupBy("doc_id").agg(sum(col("w") * col("x")).as("z"))
      .select(col("doc_id"),
        (lit(1.0) / (lit(1.0) + exp(lit(-scale) * col("z")))).as("score"))

  /** Mean log-loss of a coefficient vector (clamped at eps) — the training
    * objective, used by ClassifierSpec to pin that GD actually descends. */
  def logLoss(feats: DataFrame, labels: DataFrame, w: Array[Double],
      scale: Double = 1.0): Double = {
    val eps = 1e-12
    val p = greatest(least(col("score"), lit(1.0 - eps)), lit(eps))
    predict(feats, w, scale).join(labels, "doc_id")
      .agg(avg(-(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))))
      .collect()(0).getDouble(0)
  }
}
