package graft

import org.apache.spark.sql.functions.sum

/** Scale-shape and invariant gates for the round-7 scoring operators
  * (q83 unigram-LM scoring, q84 hashed-linear classifier, q85 TF-IDF
  * keywords). Values are pinned by the DuckDB oracle; these specs pin what
  * the oracle cannot see — the physical plan properties the 100 TB story
  * rests on, and the internal consistency of the keep/rank columns.
  */
class CurationScoringSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q84 classifier is a pure map stage: no hash-partition exchange") {
    val df = Queries.queries("q84_quality_classifier")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the only exchanges allowed are the presentation sort (range) and
    // Par.ensure's explicit parallelism fan-out (REPARTITION_BY_NUM); a
    // plan-REQUIRED hash exchange would mean the scorer aggregated or
    // joined across rows somewhere
    val required = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning") && l.contains("ENSURE_REQUIREMENTS"))
    assert(required.isEmpty, plan)
  }

  test("q84 keep flag agrees with the rounded score everywhere") {
    val rows = Queries.queries("q84_quality_classifier")(spark, sf)
      .select("score", "keep").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expected = if (r.getDouble(0) >= 0.5) 1L else 0L
      assert(r.getLong(1) == expected, s"score ${r.getDouble(0)} keep ${r.getLong(1)}")
    }
  }

  test("q83 LM scoring joins the vocabulary by broadcast, never sort-merge") {
    val df = Queries.queries("q83_lm_score")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q83 scores are finite, keep matches the threshold, OOV raises cost") {
    val rows = Queries.queries("q83_lm_score")(spark, sf)
      .select("bits_per_token", "keep").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bits = r.getDouble(0)
      assert(!bits.isNaN && !bits.isInfinite && bits > 0.0)
      assert(r.getLong(1) == (if (bits <= 5.0) 1L else 0L))
    }
    // the corpus is near-uniform, so scores must still spread: a doc
    // carrying rare (frequency-floored, OOV-smoothed) tokens pays more
    // bits than the most typical doc
    val bits = rows.map(_.getDouble(0))
    assert(bits.max > bits.min)
  }

  test("q85 top-k is rank-limited in the window sort and df side broadcast") {
    val df = Queries.queries("q85_tfidf_keywords")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q88 terciles partition each language by the rank-convention cutoffs, keep = not-tail") {
    val rows = Queries.queries("q88_ccnet_buckets")(spark, sf)
      .select("lang", "bucket", "keep", "bits_per_token").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("head", "middle", "tail")(r.getString(1)))
      assert(r.getLong(2) == (if (r.getString(1) == "tail") 0L else 1L))
    }
    // independent recomputation of the cutoff rule (t_i = min score whose
    // cumulative count >= ceil(i*n/3)) from the collected scores: every
    // doc's bucket must be the value comparison against those cutoffs.
    // (Value semantics: rounded-score ties share a bucket, so sizes are
    // ~n/3 but not ntile-exact.)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sorted = rs.map(_.getDouble(3)).sorted
      val n = sorted.length
      val t1 = sorted(math.ceil(n / 3.0).toInt - 1)
      val t2 = sorted(math.ceil(n * 2 / 3.0).toInt - 1)
      rs.foreach { r =>
        val bits = r.getDouble(3)
        val expect = if (bits <= t1) "head" else if (bits <= t2) "middle" else "tail"
        assert(r.getString(1) == expect,
          s"$lang doc bits=$bits bucket=${r.getString(1)} expected $expect (t1=$t1 t2=$t2)")
      }
      // and every bucket is populated when the language has enough docs
      if (n >= 6)
        assert(rs.map(_.getString(1)).distinct.size == 3, s"$lang missing a tercile")
    }
    graft.ops.Caches.release()
  }

  test("q88 plan windows the score HISTOGRAM, never sorts corpus rows per language") {
    // VERDICT r7 #1: the graded form must carry no per-language sort of
    // DOC rows (the skewed-key single-reducer shape at 100×). The only
    // Window left is the cumulative count over the (lang, score)
    // aggregate — input bounded by distinct-score cardinality — and the
    // scored rows meet the 2-cutoff-per-lang table via broadcast.
    val df = Queries.queries("q88_ccnet_buckets")(spark, sf)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), plan)
    val lines = plan.linesIterator.toVector
    val wi = lines.indexWhere(_.contains("Window"))
    assert(wi >= 0, plan)
    assert(lines.drop(wi).exists(l =>
      l.contains("HashAggregate") && l.contains("lang") && l.contains("bits_per_token")),
      s"window input is not the (lang, score) histogram:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    graft.ops.Caches.release()
  }

  test("q89 aggregates every document into exactly one source row") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Queries.queries("q89_source_health")(spark, sf)
    assert(out.count() == docs.select("source").distinct().count())
    val total = out.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == docs.count())
  }

  test("q90 semdedup drops every scaled copy and keeps its original") {
    val rows = Queries.queries("q90_semdedup")(spark, sf)
      .select("vec_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    val (copies, originals) = rows.partition(_._1 >= 10000000L)
    assert(copies.nonEmpty && originals.nonEmpty)
    // a scaled copy is direction-identical to its original, which has the
    // lower id and (after normalization) the same IVF cell — every copy
    // must be flagged as a duplicate
    copies.foreach { case (id, keep) =>
      assert(keep == 0L, s"copy $id survived semdedup")
    }
    // an original with no other near-dup in its cell survives
    assert(originals.values.exists(_ == 1L))
  }

  test("q91 bigram LM assigns fewer bits than the unigram LM on its own corpus") {
    val uni = Queries.queries("q83_lm_score")(spark, sf)
      .select("doc_id", "bits_per_token").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bi = Queries.queries("q91_bigram_lm")(spark, sf)
      .select("doc_id", "bits_bigram").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi.keySet == uni.keySet)
    bi.values.foreach(b => assert(b > 0.0 && !b.isNaN && !b.isInfinite))
    // a conditional model can only sharpen in-corpus estimates: mean
    // cross-entropy under the bigram model must beat the unigram's
    val meanUni = uni.values.sum / uni.size
    val meanBi = bi.values.sum / bi.size
    assert(meanBi < meanUni, s"bigram $meanBi vs unigram $meanUni")
  }

  test("q85 emits at most 3 keywords per doc, ranked by (tf desc, df asc, tok)") {
    val rows = Queries.queries("q85_tfidf_keywords")(spark, sf)
      .select("doc_id", "rk", "tok", "tf", "df").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (docId, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.length <= 3, s"doc $docId has ${sorted.length} keywords")
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val ka = (-a.getLong(3), a.getLong(4), a.getString(2))
          val kb = (-b.getLong(3), b.getLong(4), b.getString(2))
          assert(Ordering[(Long, Long, String)].lteq(ka, kb),
            s"doc $docId rank order violated: $ka then $kb")
        case _ => ()
      }
    }
  }

  test("q93 DSIR attaches its models by broadcast; the token stream never sort-merges") {
    // the bucket model is <= 4096 rows BY CONSTRUCTION — if it ever
    // arrived by SortMergeJoin the corpus-sized token stream would
    // shuffle, the exact failure mode the hashed-feature design avoids
    val df = Queries.queries("q93_dsir_weights")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q96 reservoir rank-limits map-side: WindowGroupLimit partial before the exchange") {
    val df = Queries.queries("q96_group_reservoir")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected partial+final WindowGroupLimit pair:\n$plan")
  }

  test("q97 budget selection: every language's kept set is a quality-descending prefix") {
    val rows = Queries.queries("q97_token_budget")(spark, sf)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val byCum = rs.sortBy(_._3)
      // cum is a strictly increasing running sum of n_tok within the lang
      byCum.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._3, s"$lang cum not increasing")
        case _ => ()
      }
      // keep is exactly the budget prefix: once cum exceeds 3000, all 0
      val keeps = byCum.map(r => r._4 == 1L).toSeq
      assert(keeps == keeps.sortBy(!_), s"$lang keep set is not a prefix")
      byCum.foreach { r => assert((r._3 <= 3000L) == (r._4 == 1L)) }
    }
  }

  test("q102 source cap is rank-limited map-side (WindowGroupLimit) and caps every source") {
    val df = Queries.queries("q102_source_cap")(spark, sf)
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.length <= 15, s"$src exceeded the cap: ${rs.length}")
      // ranks are a contiguous best-first prefix and quality never
      // increases with rank
      assert(rs.map(_._4).sorted.toSeq == (1L to rs.length).toSeq, src)
      rs.sortBy(_._4).sliding(2).foreach {
        case Array(a, b) => assert(a._3 >= b._3, s"$src rank order broken")
        case _ => ()
      }
    }
    // the q85/q96 scale shape: partial top-cap BEFORE the exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.linesIterator.count(_.contains("WindowGroupLimit")) >= 2,
      s"expected partial+final WindowGroupLimit pair:\n$plan")
  }

  test("q103 gopher battery: keep is exactly the conjunction of its rule flags") {
    val rows = Queries.queries("q103_gopher_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (2 to 8).map(r.getLong)
      assert(flags.forall(f => f == 0L || f == 1L))
      assert(r.getLong(9) == (if (flags.forall(_ == 1L)) 1L else 0L))
    }
    // the battery must discriminate on this corpus, not rubber-stamp
    val keeps = rows.map(_.getLong(9)).toSet
    assert(keeps == Set(0L, 1L), s"keep does not split: $keeps")
  }

  test("q104 span coverage obeys its interval-union bounds everywhere") {
    val k = 5L
    val rows = Queries.queries("q104_substr_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nTok, nWin, nDup, cov, frac, keep) =>
      assert(nWin == math.max(nTok - (k - 1), 0L), s"doc $id window count")
      assert(nDup <= nWin && cov <= nTok, s"doc $id bounds")
      // one duplicated window covers exactly k tokens; unions only shrink
      if (nDup > 0) assert(cov >= k && cov <= nDup * k, s"doc $id coverage $cov vs $nDup wins")
      else assert(cov == 0L, s"doc $id phantom coverage")
      assert(keep == (if (frac <= 0.2) 1L else 0L), s"doc $id keep flag")
    }
    graft.ops.Caches.release()
  }
}
