package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** In-Spark logistic-regression training (q84's training counterpart):
  * gradient correctness against a hand-computed step, descent +
  * separation on a separable corpus, determinism, and the scale shape
  * (broadcast weights join, bounded-key gradient aggregation).
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def separable = {
    val pos = (0 until 30).map(i => (i.toLong, "alpha beta alpha", 1.0))
    val neg = (0 until 30).map(i => (100L + i, "omega delta omega", 0.0))
    val df = (pos ++ neg).toDF("doc_id", "text", "y")
    (df.select("doc_id", "text"), df.select("doc_id", "y"))
  }

  test("one GD step matches the hand-computed full-batch gradient") {
    val docs = Seq((0L, "aa aa"), (1L, "bb")).toDF("doc_id", "text")
    val feats = Classifier.featurize(docs, 32)
    val byDoc = feats.collect().groupBy(_.getLong(0))
    // token features of the two docs (intercept is f = 32)
    val fa = byDoc(0L).map(_.getInt(1)).filter(_ != 32).head
    val fb = byDoc(1L).map(_.getInt(1)).filter(_ != 32).head
    assert(fa != fb, "fixture tokens collided mod 32 — pick different tokens")
    // x is length-normalized: doc0 "aa aa" -> x(fa) = 2/2 = 1.0
    assert(byDoc(0L).find(_.getInt(1) == fa).get.getDouble(2) == 1.0)

    // w0 = 0 -> sigmoid(0) = 0.5 -> r = 0.5 - y: doc0 -0.5, doc1 +0.5.
    // grad(fa) = -0.5 * 1.0, grad(fb) = +0.5 * 1.0, grad(intercept) = 0.
    // w1 = -lr * grad with lr = 1.
    val labels = Seq((0L, 1.0), (1L, 0.0)).toDF("doc_id", "y")
    val w = Classifier.train(feats, labels, nFeatures = 32, iters = 1, lr = 1.0)
    assert(w(fa) == 0.5, s"w($fa) = ${w(fa)}")
    assert(w(fb) == -0.5, s"w($fb) = ${w(fb)}")
    assert(w(32) == 0.0, s"intercept = ${w(32)}")
    assert(w.zipWithIndex.filter { case (_, i) => i != fa && i != fb }
      .forall(_._1 == 0.0), "untouched features must stay 0")
  }

  test("training descends the log-loss and separates a separable corpus") {
    val (docs, labels) = separable
    val feats = Classifier.featurize(docs, 64).persist()
    val w0 = Array.fill(65)(0.0)
    val w = Classifier.train(feats, labels, nFeatures = 64, iters = 10, lr = 2.0)
    val l0 = Classifier.logLoss(feats, labels, w0)
    val l10 = Classifier.logLoss(feats, labels, w)
    info(s"log-loss: init=$l0 trained=$l10")
    assert(l10 < l0, s"GD did not descend: $l0 -> $l10")

    val acc = Classifier.predict(feats, w).join(labels, "doc_id")
      .select(when((col("score") >= 0.5) === (col("y") === 1.0), 1.0)
        .otherwise(0.0).as("ok"))
      .agg(avg("ok")).collect()(0).getDouble(0)
    info(s"training accuracy = $acc")
    assert(acc == 1.0, s"separable corpus not separated: acc=$acc")
    feats.unpersist()
  }

  test("training is deterministic: same data, same weights, bit for bit") {
    val (docs, labels) = separable
    val feats = Classifier.featurize(docs, 64).persist()
    val w1 = Classifier.train(feats, labels, nFeatures = 64, iters = 3, lr = 0.5)
    val w2 = Classifier.train(feats, labels, nFeatures = 64, iters = 3, lr = 0.5)
    assert(w1.sameElements(w2))
    feats.unpersist()
  }

  test("scale shape: weights join broadcasts; margin agg is partial") {
    val (docs, _) = separable
    val feats = Classifier.featurize(docs, 64)
    val scored = Classifier.predict(feats, Array.fill(65)(0.1))
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("BroadcastHashJoin"),
      s"weights must broadcast, not shuffle the features:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-side shuffle join expected:\n$plan")
  }
}
