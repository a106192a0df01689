package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * per Agarwal et al. 2012, "Mergeable Summaries") — the approximate
  * scale path next to q73's exact token-frequency table, completing the
  * sketch family (HLL for distinct counts, KLL-style approx_percentile
  * for quantiles — both spec-gated in SketchSpec).
  *
  * At 100 TB the exact top-k needs a full (group, token)-keyed exchange
  * of the distinct vocabulary; this summary is a FIXED-SIZE state
  * (<= k counters) per partition, merged pairwise — shuffle volume
  * O(groups × k) regardless of vocabulary size.
  *
  * Guarantees (capacity k, stream length n): every token with true
  * frequency > n/(k+1) is present in the summary, and each reported
  * count understates the true count by at most n/(k+1). Merge sums the
  * counter maps and, when over capacity, subtracts the (k+1)-th largest
  * count from every entry and drops the non-positive ones — the
  * mergeable-summaries rule that preserves the error bound.
  *
  * Use via `udaf(new MisraGries(k), Encoders.STRING)` as a grouped
  * aggregate over a token column.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1L)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        // decrement-all: each decrement is "paid for" by an earlier
        // increment, so total work stays O(1) amortized per element
        buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val threshold = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.collect { case (t, c) if c > threshold => t -> (c - threshold) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
}
