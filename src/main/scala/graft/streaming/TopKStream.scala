package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.MisraGries

/** Continuous heavy-hitters: the Misra–Gries summary maintained as
  * streaming state — the live counterpart of the batch `MisraGries`
  * aggregator (SketchSpec-gated). State per group is the SAME bounded
  * ≤ k counter map the batch sketch carries, updated with the identical
  * `reduce` step, so the stream inherits the batch guarantees verbatim:
  * every token with true frequency > n/(k+1) is present, and counts
  * understate by at most n/(k+1).
  *
  * MG is order-sensitive (any processing order yields a VALID summary,
  * but different orders yield different valid summaries), and Spark does
  * not order rows within a micro-batch group. Each input row therefore
  * carries a `seq` number and the update folds the batch in `seq` order —
  * making the stream deterministic and exactly equal to a sequential
  * fold over the concatenated batches (StreamingSpec pins this).
  *
  * Scale shape: state is O(groups × k) regardless of vocabulary size or
  * stream length — the whole point of the sketch; the per-batch shuffle
  * is keyed by group only. Emits the full current summary per group per
  * batch (update mode).
  */
object TopKStream {

  case class Tok(group: String, seq: Long, token: String)
  case class Hit(group: String, token: String, count: Long)

  private[graft] def update(k: Int)(
      group: String, rows: Iterator[Tok],
      state: GroupState[Map[String, Long]]): Iterator[Hit] = {
    val mg = new MisraGries(k)
    var buf = state.getOption.getOrElse(Map.empty)
    rows.toSeq.sortBy(_.seq).foreach { t => buf = mg.reduce(buf, t.token) }
    state.update(buf)
    buf.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => Hit(group, t, c) }.iterator
  }

  def topK(spark: SparkSession, toks: Dataset[Tok], k: Int): Dataset[Hit] = {
    import spark.implicits._
    toks.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update(k))
  }
}
