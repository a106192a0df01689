package graft

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoin

/** Semantics and plan gates for the temporal join operators. Values on the
  * events table are pinned by the DuckDB oracles (q86 against DuckDB's
  * native ASOF JOIN, q87 against a direct inequality join); these specs
  * pin the semantics the oracle formulation doesn't isolate — boundary
  * inclusion/exclusion, null handling, tie ordering — against a naive
  * reference on synthetic data, plus the plan shapes the scale story
  * rests on.
  */
class TemporalJoinSpec extends SparkSpec {

  import spark.implicits._

  private def left() = Seq(
    (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 50L),
    (4L, "b", 100L), (5L, "c", 100L)
  ).toDF("id", "k", "t")

  private def right() = Seq(
    ("a", 100L, 1.0), ("a", 150L, 2.0), ("a", 40L, 3.0),
    ("b", 101L, 4.0)
  ).toDF("k", "t", "v")

  test("asOf matches naive argmax semantics, including equal-time and no-match") {
    val got = TemporalJoin.asOf(left(), right(), "k", "t", Seq("v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getDouble(3)))
    // id 1: right at t=100 matches at equal time (not the t=150 future row,
    //       not only the t=40 past row); id 3: only t=40 qualifies;
    //       id 4: right t=101 > 100 -> no match; id 5: no rows for key c
    assert(got.toSeq == Seq(
      (1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, null), (5L, null)))
  }

  test("asOf keeps every left row and all left columns") {
    val out = TemporalJoin.asOf(left(), right(), "k", "t", Seq("v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "v"))
    assert(out.count() == 5)
  }

  test("asOf plan is one key-shuffle + window sort, no join operator") {
    val plan = TemporalJoin.asOf(left(), right(), "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    // the whole operator is union + running window — any Join node would
    // mean the quadratic naive shape snuck back in
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("asOf carries the most recent right ROW as a unit, even with null payload fields") {
    // ADVICE r7: per-column last(ignoreNulls) carry skipped a newer right
    // row whose payload value is legitimately NULL, and with multiple
    // payload columns could stitch fields from DIFFERENT right rows into
    // one that never existed. The struct carry must return exactly the
    // most recent row's fields.
    val l = Seq((1L, "a", 300L)).toDF("id", "k", "t")
    val r = Seq(
      ("a", 100L, Some(7.0), Option.empty[String]), // older: (7.0, null)
      ("a", 200L, Option.empty[Double], Some("x"))  // newest: (null, "x")
    ).toDF("k", "t", "v", "s")
    val got = TemporalJoin.asOf(l, r, "k", "t", Seq("v", "s")).collect()(0)
    // newest row wins wholesale: v = null (NOT the stale 7.0), s = "x"
    assert(got.isNullAt(3), got.toString)
    assert(got.getString(4) == "x", got.toString)
  }

  test("rangeJoin window boundaries: [t-W, t) — lower inclusive, upper exclusive") {
    val l = Seq((1L, "a", 1000L)).toDF("id", "k", "t")
    val r = Seq(
      ("a", 900L, 1.0),   // == t-W: included
      ("a", 999L, 2.0),   // inside
      ("a", 1000L, 3.0),  // == t: excluded
      ("a", 899L, 4.0),   // below t-W: excluded
      ("b", 950L, 5.0)    // wrong key
    ).toDF("k", "t", "v")
    val got = TemporalJoin.rangeJoin(l, r, "k", "t", 100L, Seq("v"))
      .select("r_v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(1.0, 2.0))
  }

  test("rangeJoin finds matches across a bin boundary") {
    // W=100 bins: left t=105 (bin 1) must still see right t=10 (bin 0)
    val l = Seq((1L, "a", 105L)).toDF("id", "k", "t")
    val r = Seq(("a", 10L, 1.0), ("a", 104L, 2.0)).toDF("k", "t", "v")
    val got = TemporalJoin.rangeJoin(l, r, "k", "t", 100L, Seq("v"))
      .select("r_v").collect().map(_.getDouble(0)).sorted.toSeq
    assert(got == Seq(1.0, 2.0))
  }

  test("rangeJoin emits each match exactly once despite the two probed bins") {
    // a right row whose bin equals BOTH left candidate bins is impossible
    // (bins are distinct); a left row at an exact bin edge probes
    // array_distinct'ed bins, so duplicates cannot arise there either
    val l = Seq((1L, "a", 200L)).toDF("id", "k", "t") // exact bin edge
    val r = Seq(("a", 150L, 1.0)).toDF("k", "t", "v")
    val got = TemporalJoin.rangeJoin(l, r, "k", "t", 100L, Seq("v")).collect()
    assert(got.length == 1)
  }

  test("rangeJoin plans an equi-join, not a nested-loop over all pairs") {
    val plan = TemporalJoin.rangeJoin(left(), right(), "k", "t", 100L, Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
