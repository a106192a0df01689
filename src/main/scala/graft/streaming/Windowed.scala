package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions

/** Event-time windowed aggregation and streaming dedup — capabilities the
  * reference lacks entirely (its "streaming" is trigger-driven re-indexing,
  * SURVEY.md §2.10) but a continuously-ingesting training-data pipeline
  * needs: per-window corpus statistics and arrival-time dedup BEFORE the
  * expensive embed stage.
  *
  * Both operators are bounded-state by construction: the watermark lets
  * Spark drop window/dedup state older than the lateness bound, so state
  * size is O(active windows + docs inside the horizon), not O(stream).
  */
object Windowed {

  /** Tumbling event-time window aggregation with a lateness watermark.
    * `tsCol` must be a TIMESTAMP column; emits one row per
    * (window, groupCol) with count and value sum.
    */
  def windowedStats(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      valueCol: String,
      windowDur: String,
      lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowDur), col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(
        col("window.start").as("window_start"),
        col(groupCol), col("n"), col("total"))

  /** Streaming exact dedup on content hash within the watermark horizon:
    * duplicates arriving inside `lateness` of each other collapse to the
    * first arrival (state = one 44-char hash per doc in the horizon).
    * The P7/U2 dedup-before-embed predicate, made incremental.
    *
    * `dropDuplicatesWithinWatermark` (NOT plain `dropDuplicates`): with a
    * key that excludes the event-time column, plain dropDuplicates never
    * evicts its state — the store grows one entry per distinct document
    * forever. The WithinWatermark variant expires each key once the
    * watermark passes its last-seen time, making state O(docs inside the
    * horizon) as documented.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String, lateness: String): DataFrame =
    docs
      .withColumn("content_hash", TextFunctions.contentHash(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Continuous ingest drift monitor — the streaming form of the q160
    * shard-drift report: a RUNNING per-source 10-bin token-length
    * histogram over everything ingested so far (streaming aggregation in
    * update mode; state is |sources| × 10 counters, never the stream),
    * compared each trigger against a broadcast REFERENCE histogram
    * (ppm_ref per (source, bucket) of the standing corpus). Emits
    * (source, bucket, n, ppm_ref) running rows; the sink computes the
    * per-source shares and L1 deviation from the latest counters —
    * StreamingSpec pins that the drained stream's L1 equals q160's
    * l1_ppm on the same shard. An operator alerts when the deviation
    * climbs — BEFORE q155 folds the shard in.
    */
  // bcast-ok-param: reference — (source × 10 length-buckets) reference
  // histogram: catalog-sized, arity fixed by the bucketing expression
  def driftMonitor(docs: DataFrame, reference: DataFrame): DataFrame = {
    val hist = docs
      .withColumn("n_tok",
        size(TextFunctions.tokens(col("text"))).cast("long"))
      .withColumn("bucket", least(expr("n_tok div 8"), lit(9L)))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n"))
    hist
      .join(broadcast(reference.select(col("source"), col("bucket"),
        col("ppm").as("ppm_ref"))), Seq("source", "bucket"), "left")
      .withColumn("ppm_ref", coalesce(col("ppm_ref"), lit(0L)))
      .select(col("source"), col("bucket"), col("n"), col("ppm_ref"))
  }

  /** One update of the trending-token state: (window epoch-sec, token
    * estimate, docs-processed watermark for the window). */
  case class TrendRow(window: Long, tok: String, est: Long, processed: Long)
  // state class is public: Catalyst's encoder codegen needs constructor
  // access (a `private` here fails at generated-code compile time)
  case class MgState(counters: Map[String, Long], processed: Long)

  /** Streaming trending tokens — Misra–Gries heavy hitters per tumbling
    * event-time window, the continuous form of the q73 top-k report:
    * state per window is a BOUNDED k-counter summary (the same
    * [[graft.functions.MisraGries]] reduce the batch sketch twin uses —
    * one definition of the decrement rule), so a window's state never
    * grows with the stream. Each trigger re-emits the window's current
    * counters (update semantics). MG guarantees carried over: every
    * token with true frequency > N/(k+1) is present, and estimates are
    * within N/(k+1) below truth — StreamingSpec pins both, plus exact
    * equality with batch counts when k exceeds the distinct-token count.
    * No watermark by design here (state is per-window and tiny); a
    * production deployment adds withWatermark upstream + an
    * EventTimeTimeout eviction for closed windows.
    */
  def trendingTokens(docs: DataFrame, tsCol: String, textCol: String,
      windowDur: String, k: Int): Dataset[TrendRow] = {
    import docs.sparkSession.implicits._
    val mg = new graft.functions.MisraGries(k)
    val toks = docs
      .select(window(col(tsCol), windowDur).getField("start").as("w"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("w").cast("long").as("window"), col("tok"))
      .as[(Long, String)]
    toks.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(
        (window: Long, rows: Iterator[(Long, String)], state: GroupState[MgState]) => {
          val st = state.getOption.getOrElse(MgState(Map.empty, 0L))
          var counters = st.counters
          var n = st.processed
          rows.foreach { case (_, tok) =>
            counters = mg.reduce(counters, tok)
            n += 1
          }
          state.update(MgState(counters, n))
          counters.iterator.map { case (tok, est) =>
            TrendRow(window, tok, est, n)
          }
        })
  }

  /** Reference histogram for [[driftMonitor]]: per-source bucket shares
    * of the standing corpus in exact integer ppm (the q160 rule). */
  def referenceHistogram(docs: DataFrame): DataFrame =
    referenceHistogramFromLengths(docs.withColumn("n_tok",
      size(TextFunctions.tokens(col("text"))).cast("long")))

  /** [[referenceHistogram]] over a pre-computed (source, n_tok) frame —
    * the ONE definition of the 10-bin ppm histogram, shared by the batch
    * q160 drift report (whose shard side perturbs n_tok before
    * bucketing) and the streaming monitor's reference side, so the
    * bucketing rule cannot desynchronize between them.
    */
  def referenceHistogramFromLengths(lengths: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
    lengths
      .withColumn("bucket", least(expr("n_tok div 8"), lit(9L)))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c"))
      .withColumn("tot", sum(col("c")).over(w))
      .withColumn("ppm", expr("CAST((c * 1000000) div tot AS BIGINT)"))
      .select("source", "bucket", "ppm")
  }
}
