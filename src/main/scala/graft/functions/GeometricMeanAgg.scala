package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bit-faithful GeometricMean: running float32 product then pow(p, 1/n),
  * matching the reference exactly including underflow-to-zero behavior
  * (LD-Reborn/embeddingsearch `src/Server/Probmethods.cs:105-114` — a running
  * `float` product, NOT exp(mean(log)) which diverges for 0/negatives and
  * underflow).
  *
  * Commutative-but-not-order-preserving merge: float multiplication is
  * commutative and the reference iterates insertion order; products of the
  * same multiset differ only by rounding order. Exactness tests pin inputs
  * per-partition; distributed use accepts float-product reassociation.
  */
object GeometricMeanAgg extends Aggregator[Float, (Float, Long), Float] {
  def zero: (Float, Long) = (1.0f, 0L)
  def reduce(b: (Float, Long), a: Float): (Float, Long) = (b._1 * a, b._2 + 1)
  def merge(b1: (Float, Long), b2: (Float, Long)): (Float, Long) =
    (b1._1 * b2._1, b1._2 + b2._2)
  def finish(r: (Float, Long)): Float =
    if (r._2 == 0) 0.0f
    else math.pow(r._1.toDouble, (1.0f / r._2).toDouble).toFloat
  def bufferEncoder: Encoder[(Float, Long)] = Encoders.tuple(Encoders.scalaFloat, Encoders.scalaLong)
  def outputEncoder: Encoder[Float] = Encoders.scalaFloat
}
