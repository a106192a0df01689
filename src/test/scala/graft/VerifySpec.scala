package graft

import org.scalatest.funsuite.AnyFunSuite

/** The window-census gate's parse + drift logic (ADVICE r16: the r16
  * per-run dump wrote `name count` lines while the gate compared whole
  * lines of the names-only stamp, so a verbatim copy re-stamp failed
  * permanently with every query both gained and lost). The contract now:
  * first-token parse on the stamped side + names-only per-run dump, so
  * `cp outDir/window_census.txt tools/window_census.txt` round-trips. */
class VerifySpec extends AnyFunSuite {

  test("censusNames parses names-only stamped lines") {
    assert(Verify.censusNames(Seq("q07_a", "q13_b", "", "  q54_c  ")) ==
      Set("q07_a", "q13_b", "q54_c"))
  }

  test("censusNames parses legacy 'name count' lines to the same set") {
    // the r16 dump format — a verbatim copy re-stamp must still parse
    assert(Verify.censusNames(Seq("q07_a 3", "q13_b 12", "q54_c 1")) ==
      Set("q07_a", "q13_b", "q54_c"))
  }

  test("re-stamp round trip: dump parses equal to the set it came from") {
    val got = Set("q07_a", "q13_b", "q54_c")
    // what Verify writes to outDir/window_census.txt (names-only)
    val dumped = got.toSeq.sorted.mkString("", "\n", "\n")
    assert(Verify.censusNames(dumped.split("\n").toSeq) == got)
    assert(Verify.censusDrift(got, Verify.censusNames(dumped.split("\n").toSeq)).isEmpty)
  }

  test("censusDrift reports gained and lost names, sorted") {
    val d = Verify.censusDrift(Set("qa", "qc"), Set("qa", "qb"))
    assert(d.contains("gained qc lost qb"))
    assert(Verify.censusDrift(Set("qa"), Set("qa")).isEmpty)
  }

  test("censusDrift catches a same-count swap") {
    // one query loses its bounded window while another gains a
    // data-grained one — the event the name-set half exists for
    val d = Verify.censusDrift(Set("q_new_datagrained", "q_kept"),
      Set("q_old_bounded", "q_kept"))
    assert(d.contains("gained q_new_datagrained lost q_old_bounded"))
  }
}
