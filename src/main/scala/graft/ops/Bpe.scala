package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the tokenizer-
  * training step a corpus pipeline runs after vocabulary counting
  * (q72/q73 build exactly the weighted word-frequency table this trains
  * from).
  *
  * Scale shape: BPE training never touches the corpus again after the
  * one corpus-sized token count — every iteration is over the DISTINCT
  * vocabulary (words × their symbol arrays), which is millions of rows
  * where the corpus is billions. Each round is one narrow pair-extraction
  * map + one pair-keyed aggregate with map-side combine + a driver read
  * of the single argmax row (the merge table IS driver state — it is the
  * tokenizer being built, a few thousand rows). The symbol-array rewrite
  * is a per-row codegen'd HOF fold — no shuffle. This is the same
  * dataflow industrial distributed BPE trainers use; the corpus never
  * re-enters the loop.
  */
object Bpe {

  /** Split a token into single-character symbols. (`split` with an empty
    * pattern keeps a trailing empty match; filter it out.)
    */
  def symbolize(tok: Column): Column =
    filter(split(tok, ""), x => length(x) > 0)

  /** Adjacent symbol pairs of one row's symbol array as
    * `array<struct<pa,pb>>` — empty for single-symbol rows (a bare
    * `sequence(1, size-1)` would DESCEND for size < 2 and fabricate
    * pairs).
    */
  def adjacentPairs(syms: Column): Column =
    when(size(syms) < 2, array().cast("array<struct<pa:string,pb:string>>"))
      .otherwise(transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("pa"), element_at(syms, i + 1).as("pb"))))

  /** Corpus-weighted adjacent-pair counts over a vocabulary of
    * (`syms` array<string>, `n` bigint): one narrow explode + one
    * pair-keyed aggregate (map-side combined). Returns (pa, pb, n).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(explode(adjacentPairs(col("syms"))).as("p"), col("n"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(sum(col("n")).as("n"))

  /** Greedy left-to-right merge of every adjacent (a, b) occurrence into
    * the fused symbol — a single HOF fold per row, non-overlapping the
    * way reference BPE is ("aaa" + (a,a) → ["aa","a"]: after a merge the
    * new tail is the FUSED symbol, which cannot equal `a` again unless
    * `b` were empty).
    */
  def mergeAdjacent(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (out, x) =>
        when(size(out) > 0 && element_at(out, -1) === a && x === b,
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
          .otherwise(concat(out, array(x))))

  /** Apply a learned merge table to a token column — reference BPE
    * ENCODING: merges applied in rank order, each greedily left-to-right
    * over the whole symbol sequence (the exact segmentation the trainer's
    * final state implies, including for words never seen in training —
    * the subword generalization BPE exists for). A chain of per-row HOF
    * folds, one per merge: narrow, no shuffle, rides the scan. For
    * production-sized merge tables (10k+) the chain exceeds what one
    * projection should hold — there the merge table broadcasts to a
    * mapPartitions encoder with the identical rank-order contract; this
    * Column form is exact for the moderate tables the specs and
    * registry exercise.
    */
  def encode(tok: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolize(tok)) {
      case (syms, (a, b)) => mergeAdjacent(syms, a, b)
    }

  /** Learn `k` merges from a word-frequency table (`tok`, `n`). Each
    * round reads ONE row on the driver (the argmax pair — it becomes the
    * merge rule, i.e. the model itself); the vocabulary stays
    * distributed, localCheckpoint'ed per round to truncate the nested-HOF
    * lineage, previous round's blocks freed once consumed (the Graph
    * pattern — blocks identified from the returned plan's LogicalRDD,
    * never by diffing global registry state). Ties break on
    * (count desc, pa, pb) so the learned tokenizer is deterministic.
    * Returns the merge table (rank, pa, pb, n).
    */
  def learnMerges(vocab: DataFrame, k: Int): Seq[(Int, String, String, Long)] = {
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val out = df.localCheckpoint()
      val ids = out.queryExecution.analyzed.collect {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      }.toSet
      (out, ids)
    }
    val sc = vocab.sparkSession.sparkContext
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

    var (cur, curBlocks) = checkpointTracked(
      vocab.select(symbolize(col("tok")).as("syms"), col("n").cast("long").as("n")))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    try {
      var rank = 1
      var exhausted = false
      while (rank <= k && !exhausted) {
        val top = pairCounts(cur)
          .orderBy(desc("n"), asc("pa"), asc("pb"))
          .limit(1).collect()
        if (top.isEmpty) exhausted = true
        else {
          val (pa, pb, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((rank, pa, pb, n))
          val (next, nextBlocks) = checkpointTracked(
            cur.select(mergeAdjacent(col("syms"), pa, pb).as("syms"), col("n")))
          free(curBlocks) // consumed by the eager checkpoint above
          cur = next
          curBlocks = nextBlocks
          rank += 1
        }
      }
      merges.toSeq
    } finally free(curBlocks)
  }
}
