package graft

import org.apache.spark.sql.functions._

import graft.ops.Mixture

/** Water-filling allocation pinned against hand-computed cases and its
  * defining invariants.
  */
class MixtureSpec extends SparkSpec {

  private def frame = {
    import spark.implicits._
    // saturation rates: a=10, b=100, c=500
    Seq(("a", 10.0, 1.0), ("b", 100.0, 1.0), ("c", 1000.0, 2.0))
      .toDF("source", "avail", "weight")
  }

  private def allocs(budget: Double): Map[String, Double] =
    Mixture.waterFill(frame, budget).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("mid budget: small source saturates, surplus flows at a common rate") {
    // r* = (200 - 10) / 3 = 63.33…: a capped at 10, b gets r*, c gets 2r*
    val a = allocs(200.0)
    assert(approx(a("a"), 10.0))
    assert(approx(a("b"), 190.0 / 3.0))
    assert(approx(a("c"), 2.0 * 190.0 / 3.0))
    assert(approx(a.values.sum, 200.0))
  }

  test("tiny budget: nobody saturates, allocation is purely weight-proportional") {
    val a = allocs(4.0)
    assert(approx(a("a"), 1.0) && approx(a("b"), 1.0) && approx(a("c"), 2.0))
  }

  test("budget above total availability: everything saturates") {
    val a = allocs(5000.0)
    assert(approx(a("a"), 10.0) && approx(a("b"), 100.0) && approx(a("c"), 1000.0))
  }

  test("boundary budget exactly at a saturation knee") {
    // r = 10 is the knee where a saturates: budget = 10 + 10 + 20 = 40
    val a = allocs(40.0)
    assert(approx(a("a"), 10.0) && approx(a("b"), 10.0) && approx(a("c"), 20.0))
    assert(approx(a.values.sum, 40.0))
  }

  test("invariants on a larger random-ish frame: caps respected, budget spent") {
    import spark.implicits._
    val rows = (1 to 40).map { i =>
      val avail = (i * 37 % 97 + 3) * 10.0
      (s"s$i", avail, math.sqrt(avail))
    }
    val df = rows.toDF("source", "avail", "weight")
    val total = rows.map(_._2).sum
    Seq(total * 0.1, total * 0.5, total * 0.9).foreach { b =>
      val out = Mixture.waterFill(df, b).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(3)))
      out.foreach { case (s, avail, alloc) =>
        assert(alloc >= -1e-9 && alloc <= avail + 1e-9, s"$s alloc $alloc out of [0, $avail]")
      }
      assert(approx(out.map(_._3).sum, b, 1e-9), s"budget $b not spent")
    }
  }

  /** Independent reference solver: bisection on the monotone spend
    * function f(r) = Σ min(avail, r·w). Shares no algorithm with the
    * closed-form sorted-threshold implementation.
    */
  private def waterFillRef(rows: Seq[(String, Double, Double)],
      budget: Double): Map[String, Double] = {
    if (budget >= rows.map(_._2).sum) return rows.map(r => r._1 -> r._2).toMap
    var lo = 0.0
    var hi = rows.map(r => r._2 / r._3).max + 1.0
    (0 until 200).foreach { _ =>
      val mid = (lo + hi) / 2
      if (rows.map(r => math.min(r._2, mid * r._3)).sum < budget) lo = mid
      else hi = mid
    }
    val r = (lo + hi) / 2
    rows.map(x => x._1 -> math.min(x._2, r * x._3)).toMap
  }

  test("closed form equals an independent bisection solver on random frames") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    (1 to 5).foreach { trial =>
      val rows = (1 to (5 + rng.nextInt(30))).map { i =>
        val avail = 1.0 + rng.nextInt(5000)
        (s"s$i", avail, math.pow(avail, 0.3 + 0.4 * rng.nextDouble()))
      }
      val budget = rows.map(_._2).sum * (0.05 + 0.9 * rng.nextDouble())
      val got = Mixture.waterFill(rows.toDF("source", "avail", "weight"), budget)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      val want = waterFillRef(rows, budget)
      rows.foreach { case (s, _, _) =>
        assert(math.abs(got(s) - want(s)) < 1e-5,
          s"trial $trial source $s: closed ${got(s)} vs bisection ${want(s)}")
      }
    }
  }

  test("budget as a Column may reference the ordered-cumsum totals") {
    val out = Mixture.waterFill(frame, col("tot_avail") * lit(0.5)).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    // total avail 1110, budget 555: a and b saturate;
    // r1 = (555-10)/3 = 181.67 > 100 -> invalid; r2 = (555-110)/2 = 222.5 in [100, 500] ✓
    assert(approx(out("a"), 10.0))
    assert(approx(out("b"), 100.0))
    assert(approx(out("c"), 445.0))
  }
}
