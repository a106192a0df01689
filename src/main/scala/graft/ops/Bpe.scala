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
    * projection should hold — use [[encodePartitions]], the broadcast
    * mapPartitions form with the identical rank-order contract (BpeSpec
    * pins the equality); this Column form is exact for the moderate
    * tables the specs and registry exercise.
    */
  def encode(tok: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolize(tok)) {
      case (syms, (a, b)) => mergeAdjacent(syms, a, b)
    }

  /** One word through the rank-ordered greedy merge contract — the plain
    * JVM twin of `merges.foldLeft(symbolize)(mergeAdjacent)`. The
    * symbol-membership set makes rank m cost O(1) unless both of its
    * symbols have ever appeared in this word (a conservative superset —
    * symbols are added when a merge fires, never removed; a stale member
    * costs one wasted scan, never a wrong merge): a 10k-rank table is
    * ~20k set probes per word, not 10k full scans.
    */
  private[ops] def encodeWord(tok: String,
      merges: Array[(String, String)]): Array[String] = {
    var syms: Array[String] = tok.split("").filter(_.nonEmpty)
    if (syms.length < 2) return syms
    val present = new java.util.HashSet[String](syms.length * 2)
    syms.foreach(present.add)
    var m = 0
    while (m < merges.length && syms.length > 1) {
      val (a, b) = merges(m)
      if (present.contains(a) && present.contains(b)) {
        // greedy left-to-right, non-overlapping — after a merge the new
        // tail is the FUSED symbol, which cannot re-match `a` (BpeSpec's
        // reference form; equivalent to mergeAdjacent's fold)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        var fired = false
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); fired = true; i += 2
          } else {
            out += syms(i); i += 1
          }
        }
        if (fired) {
          syms = out.toArray
          present.add(a + b)
        }
      }
      m += 1
    }
    syms
  }

  /** Production encoder (VERDICT r7 #3): the merge table BROADCAST once
    * and applied per partition in plain JVM code — [[encode]]'s HOF chain
    * is exact but builds a merge-table-sized expression tree, which at
    * production vocab sizes (10k+ merges) exceeds what one projection
    * (and its codegen) should hold. Contract is IDENTICAL to [[encode]]
    * (rank order, greedy left-to-right; BpeSpec pins equality on seen and
    * unseen words at a 1k+ table). Per-partition memo on the token
    * string: a corpus partition repeats words (Zipf), and identical input
    * produces identical output, so each distinct word is segmented once
    * per partition (capped — a pathological all-distinct partition stops
    * memoizing rather than growing without bound).
    *
    * Adds `outCol` (array<string>; null for a null token) to `df`; all
    * other columns pass through untouched. Narrow — no shuffle, rides
    * the scan exactly like the Column form.
    */
  def encodePartitions(df: DataFrame, tokCol: String, outCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    val bc = df.sparkSession.sparkContext.broadcast(merges.toArray)
    val tokIdx = df.schema.fieldIndex(tokCol)
    val schema = df.schema.add(outCol, ArrayType(StringType, containsNull = false))
    val memoCap = 1 << 20
    df.mapPartitions { it =>
      val table = bc.value
      val memo = new java.util.HashMap[String, Array[String]]()
      it.map { row =>
        val tok = row.getAs[String](tokIdx)
        val enc =
          if (tok == null) null
          else {
            var hit = memo.get(tok)
            if (hit == null) {
              hit = encodeWord(tok, table)
              if (memo.size < memoCap) memo.put(tok, hit)
            }
            hit
          }
        Row.fromSeq(row.toSeq :+ enc)
      }
    }(Encoders.row(schema))
  }

  /** Deterministic synthetic merge table for specs and bench twins,
    * grown the way a learned table grows: each rule pairs two symbols
    * already in the pool, and the fused result joins the pool so later
    * rules can reference it. NOT a trained tokenizer — it exists so the
    * encoder's 1k+-rank contract can be exercised without 1k+ Spark
    * training rounds (BpeSpec's 1.2k equality case, the b94 twin).
    */
  def syntheticMerges(seed: Long, alphabet: Seq[String],
                      n: Int): Seq[(String, String)] = {
    val rng = new scala.util.Random(seed)
    val pool = scala.collection.mutable.ArrayBuffer(alphabet: _*)
    val seen = scala.collection.mutable.Set[(String, String)]()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (merges.size < n) {
      val p = (pool(rng.nextInt(pool.size)), pool(rng.nextInt(pool.size)))
      if (!seen(p) && (p._1 + p._2).length <= 24) {
        seen += p
        merges += p
        pool += (p._1 + p._2)
      }
    }
    merges.toSeq
  }

  /** Batched merge learning (VERDICT r8 #4): [[learnMerges]] does one
    * Spark round (pair count + argmax + rewrite + checkpoint) PER MERGE —
    * a production 30k-merge tokenizer means 30k sequential job barriers.
    * This form learns up to `maxBatch` NON-INTERACTING merges per round:
    * from one round's pair counts, take candidates in (count desc, pa, pb)
    * order and greedily accept each whose symbols AND fused string are
    * disjoint from every previously accepted candidate's {pa, pb, fused}.
    * Disjointness makes the batch exact w.r.t. the round's state: merging
    * (a,b) cannot create, destroy, or re-count occurrences of a disjoint
    * (x,y) (the fused symbol sits between x and y exactly where a b did),
    * so all accepted merges see the counts they were ranked by, and the
    * single fold-application per round is order-independent.
    *
    * Divergence from the strictly sequential trainer is possible only
    * when a merge CREATES a new pair whose count exceeds a later batch
    * member's — the same approximation production batched BPE trainers
    * accept. BpeSpec pins (a) maxBatch=1 == sequential exactly, (b)
    * batched == sequential on corpora whose top pairs are independent,
    * and (c) round count sublinear in k. Rank order within a batch is
    * the candidate order, so the learned table is deterministic.
    *
    * Returns (merge table, rounds executed).
    */
  def learnMergesBatched(
      vocab: DataFrame,
      k: Int,
      maxBatch: Int = 16): (Seq[(Int, String, String, Long)], Int) = {
    require(k >= 0 && maxBatch >= 1, s"bad k=$k maxBatch=$maxBatch")
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
    var rounds = 0
    try {
      var exhausted = false
      while (merges.size < k && !exhausted) {
        // candidate pool: enough rows that symbol conflicts can't starve
        // the batch, still a driver-tiny collect (4x is generous — each
        // accepted candidate blocks at most its own 3 strings)
        val pool = pairCounts(cur)
          .orderBy(desc("n"), asc("pa"), asc("pb"))
          .limit(math.max(maxBatch * 4, 8)).collect()
        if (pool.isEmpty) exhausted = true
        else {
          val want = math.min(maxBatch, k - merges.size)
          val blockedSyms = scala.collection.mutable.Set.empty[String]
          val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          var i = 0
          while (i < pool.length && batch.size < want) {
            val (pa, pb, n) =
              (pool(i).getString(0), pool(i).getString(1), pool(i).getLong(2))
            if (!blockedSyms(pa) && !blockedSyms(pb) && !blockedSyms(pa + pb)) {
              batch += ((pa, pb, n))
              blockedSyms ++= Seq(pa, pb, pa + pb)
            }
            i += 1
          }
          batch.foreach { case (pa, pb, n) =>
            merges += ((merges.size + 1, pa, pb, n))
          }
          // one rewrite pass for the whole batch — disjointness makes the
          // fold order-independent; one checkpoint per ROUND, not per merge
          val (next, nextBlocks) = checkpointTracked(
            batch.foldLeft(cur) { case (df, (pa, pb, _)) =>
              df.select(mergeAdjacent(col("syms"), pa, pb).as("syms"), col("n"))
            })
          free(curBlocks)
          cur = next
          curBlocks = nextBlocks
          rounds += 1
        }
      }
      (merges.toSeq, rounds)
    } finally free(curBlocks)
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
