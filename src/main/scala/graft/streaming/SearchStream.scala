package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.VectorFunctions

/** Streaming query serving — the continuous form of the engine's core
  * search (`SearchEngine.topKJoin`, the reference's `POST
  * /Searchdomain/Query` loop): a STREAM of query vectors is scored
  * against the STATIC corpus and each query's top-k answer is appended
  * as soon as its micro-batch completes. This is the stream-static join
  * shape Structured Streaming optimizes for — the corpus side is a
  * plain batch DataFrame (at scale: the partitioned/bucketed embeddings
  * layout), never state; only the in-flight micro-batch's queries are
  * ever materialized against it.
  *
  * The per-query top-k runs as flatMapGroupsWithState in append mode
  * with NO retained state (NoTimeout, state never set): a query's
  * candidate rows all live inside its own micro-batch, the group fold
  * keeps a bounded k-row buffer (O(k) memory per in-flight query, never
  * the candidate list), and emits exactly k ranked hits. Scores are the
  * same 6-dp-rounded cosine01 kernel as the batch operator, so
  * StreamingSpec pins stream answers == `topKJoin` bit-for-bit. A
  * query_id that arrives twice is answered twice (idempotent dedup
  * belongs upstream); what append-mode cannot do is retro-rank a query
  * against corpus rows added AFTER its batch — re-submit the query.
  */
object SearchStream {

  /** Query-stream row: id + embedded query vector. */
  case class QueryVec(query_id: Long, qe: Array[Float])

  /** One ranked hit; rnk in [1, k]. */
  case class Hit(query_id: Long, rnk: Long, vec_id: Long, sim: Double)

  /** Internal scored-candidate row (non-private: the row encoder's
    * generated code needs bytecode-public access to the constructor).
    */
  case class Scored(query_id: Long, vec_id: Long, sim: Double)

  private[graft] def emitTopK(k: Int)(
      key: Long,
      rows: Iterator[Scored],
      state: GroupState[Long]): Iterator[Hit] = {
    // bounded buffer: keep the k best (sim desc, vec_id asc) seen so far
    val ord = Ordering.by[Scored, (Double, Long)](s => (-s.sim, s.vec_id))
    var best = Vector.empty[Scored] // sorted ascending by ord, size <= k
    rows.foreach { s =>
      if (best.size < k || ord.lt(s, best.last)) {
        val (lo, hi) = best.span(b => ord.lteq(b, s))
        best = (lo :+ s) ++ hi
        if (best.size > k) best = best.take(k)
      }
    }
    best.iterator.zipWithIndex.map { case (s, i) =>
      Hit(key, i + 1L, s.vec_id, s.sim)
    }
  }

  /** Score a query-vector stream against the static corpus; append each
    * query's top-k. `queries` is a streaming frame with (query_id, qe);
    * `corpus` is a static frame with (vec_id, embedding).
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int): Dataset[Hit] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    queries.join(corpus.select(col("vec_id"), col("embedding")))
      .withColumn("sim",
        round(VectorFunctions.cosine01(col("embedding"), col("qe")), 6))
      .select(col("query_id"), col("vec_id"), col("sim"))
      .as[Scored]
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        emitTopK(k))
  }
}
